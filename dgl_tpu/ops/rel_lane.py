"""Lane-kernel path for relation-weighted aggregation (RGCN on proteins).

``gspmm_rel`` (ops/spmm.py) already collapses the reference's 8 per-relation
gather+scatter passes (``main_dgl_proteins_rgcn_for.py:44-60``) into one
edge-chunked pass — but that pass is still XLA row-gather-bound
(~9.3 s/epoch measured at ogbn-proteins scale). The proteins graph is DENSE
(average in-degree ~300), which is exactly where the Pallas lane plan tiles
near expansion 1: this module runs the same math as R weighted lane-SpMM
passes per direction (u_mul_e — the kernel's ``w`` operand), plus the usual
tier-2 / XLA tail for sparse tiles.

Edge weights are **dataset constants** here (the proteins edge feature
columns, never trained — reference ``:159-161`` feeds them straight from
``data.edge_feat``). The custom VJP therefore returns a zero cotangent for
them; ``RelLaneWeights`` is the explicit opt-in that documents this
contract. Features/projections get exact gradients via the reverse plans.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..graph.graph import Graph
from .segment import segment_sum

__all__ = ["RelLaneWeights", "rel_lane_agg"]


def _plan_chain(att):
    """(tier-1 plan, optional tier-2 plan) of a LaneAttachment."""
    return [p for p in (att.plan, att.plan2) if p is not None]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class RelLaneWeights:
    """Per-relation edge weights pre-permuted into every plan layout.

    ``fwd[t][r]`` / ``rev[t][r]``: (chunks, R, 128) plan-layout weights for
    tier ``t`` (tier-1, then tier-2 when attached) and relation ``r``.
    ``rem_w``: (E_rem_pad, R) canonical-tail weights for the XLA remainder
    of the forward graph (the reverse remainder reuses them via rem_eid).
    Built once per (graph, edge-weight) pair — weights are constants.
    """

    fwd: List[List[jnp.ndarray]]
    rev: List[List[jnp.ndarray]]
    rem_w: Optional[jnp.ndarray]
    rev_rem_w: Optional[jnp.ndarray]

    def tree_flatten(self):
        return (self.fwd, self.rev, self.rem_w, self.rev_rem_w), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)

    @staticmethod
    def build(g: Graph, edge_weights: np.ndarray,
              dtype=jnp.bfloat16) -> "RelLaneWeights":
        """``edge_weights``: (E_pad, R) canonical order (as fed to gspmm)."""
        from ..kernels.lane_spmm import plan_layout_edata

        if g.lane is None or g.reverse is None or g.reverse.lane is None:
            raise ValueError("attach_lane_plans first (forward + reverse)")
        w = np.asarray(edge_weights)
        r_dim = w.shape[1]

        def tiers(att):
            out = []
            for plan in _plan_chain(att):
                out.append([
                    jnp.asarray(plan_layout_edata(plan, w[:, r]).astype(
                        np.dtype(jnp.dtype(dtype).name)))
                    for r in range(r_dim)
                ])
            return out

        def rem_weights(att):
            rem = att.remainder
            if rem is None:
                return None
            eid = np.asarray(att.rem_eid)
            ok = eid < len(w)
            out = np.zeros((len(eid), r_dim), w.dtype)
            out[ok] = w[eid[ok]]
            return jnp.asarray(out)

        return RelLaneWeights(
            fwd=tiers(g.lane), rev=tiers(g.reverse.lane),
            rem_w=rem_weights(g.lane), rev_rem_w=rem_weights(g.reverse.lane),
        )


def _lane_passes(plans, tier_ws, y2, n_out, dd, interpret, compute_dtype):
    """Σ_r Σ_tier lane_spmm(plan_t, y_r, w_t_r), sliced to n_out rows."""
    from ..kernels.lane_spmm import lane_spmm

    acc = jnp.zeros((n_out, dd), jnp.float32)
    for plan, per_rel in zip(plans, tier_ws):
        for r, w_plan in enumerate(per_rel):
            out = lane_spmm(plan, y2[:, r * dd:(r + 1) * dd], w=w_plan,
                            interpret=interpret, compute_dtype=compute_dtype)
            acc = acc + out[:n_out]
    return acc


def _rem_term(rem: Graph, rem_w, y2, n_out, dd, n_rel):
    """XLA tail: Σ_r u_mul_e over the final remainder graph."""
    src = jnp.minimum(rem.src, rem.num_src_nodes - 1)
    dst = rem.dst  # sentinel == num_dst drops in segment_sum
    ye = jnp.take(y2, src, axis=0)
    msg = sum(
        ye[:, r * dd:(r + 1) * dd] * rem_w[:, r][:, None].astype(ye.dtype)
        for r in range(n_rel)
    )
    return segment_sum(msg, dst, rem.num_dst_nodes, sorted=False)[:n_out]


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def rel_lane_agg(reduce: str, n_rel: int, interpret: bool, g: Graph,
                 y, weights: RelLaneWeights):
    """Relation-contracted SpMM via weighted lane passes.

    Same math as ``gspmm_rel``: out[v] = reduce_e Σ_r w[e,r]·y[u,r,:], with
    mean dividing by the shared in-degree. ``weights`` must be built from
    the SAME canonical edge weights the XLA path would take — and they are
    treated as CONSTANTS: their cotangent is zero (see module docstring).
    """
    out, _ = _rel_lane_fwd(reduce, n_rel, interpret, g, y, weights)
    return out


def _rel_lane_fwd(reduce, n_rel, interpret, g, y, weights):
    from .spmm import _inv_deg

    dd = y.shape[-1]
    y2 = y.reshape(y.shape[0], n_rel * dd)
    cd = g.lane.compute_dtype if g.lane.compute_dtype is not None else jnp.bfloat16
    out = _lane_passes(_plan_chain(g.lane), weights.fwd, y2,
                       g.num_dst_nodes, dd, interpret, cd)
    if g.lane.remainder is not None:
        out = out + _rem_term(g.lane.remainder, weights.rem_w, y2,
                              g.num_dst_nodes, dd, n_rel)
    if reduce == "mean":
        out = out * _inv_deg(g, out.dtype)[:, None]
    return out, (g, y, weights)


def _rel_lane_bwd(reduce, n_rel, interpret, res, g_out):
    from .spmm import _inv_deg

    g, y, weights = res
    dd = y.shape[-1]
    if reduce == "mean":
        g_out = g_out * _inv_deg(g, g_out.dtype)[:, None]
    rev = g.reverse
    # grad_y_r = transpose aggregation of g_out weighted by w_r — the same
    # weighted lane passes over the reverse plans (their eids are
    # forward-canonical, so the weight permutation matches)
    cd = rev.lane.compute_dtype if rev.lane.compute_dtype is not None else jnp.bfloat16
    gy_cols = []
    rev_plans = _plan_chain(rev.lane)
    for r in range(n_rel):
        col = _lane_passes(rev_plans, [[tier[r]] for tier in weights.rev],
                           g_out, rev.num_dst_nodes, dd, interpret, cd)
        gy_cols.append(col)
    gy = jnp.concatenate(gy_cols, axis=1)  # (N_src, R·D)
    if rev.lane.remainder is not None:
        rem = rev.lane.remainder
        src = jnp.minimum(rem.src, rem.num_src_nodes - 1)
        ge = jnp.take(g_out, src, axis=0)
        cols = [
            segment_sum(ge * weights.rev_rem_w[:, r][:, None].astype(ge.dtype),
                        rem.dst, rem.num_dst_nodes, sorted=False)[: rev.num_dst_nodes]
            for r in range(n_rel)
        ]
        gy = gy + jnp.concatenate(cols, axis=1)
    grad_y = gy.reshape(y.shape).astype(y.dtype)
    zero = lambda leaf: np.zeros(np.shape(leaf), jax.dtypes.float0) \
        if not jnp.issubdtype(jnp.result_type(leaf), jnp.floating) \
        else jnp.zeros(jnp.shape(leaf), jnp.result_type(leaf))
    grad_g = jax.tree_util.tree_map(
        lambda leaf: np.zeros(np.shape(leaf), jax.dtypes.float0), g)
    grad_w = jax.tree_util.tree_map(zero, weights)
    return grad_g, grad_y, grad_w


rel_lane_agg.defvjp(_rel_lane_fwd, _rel_lane_bwd)
