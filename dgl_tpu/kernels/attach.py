"""Attach lane-SpMM execution plans to a Graph.

``attach_lane_plans(g)`` precomputes the Pallas lane plan for the forward
graph and (for backward) its transpose, stores them on the Graph (pytree
field ``lane``), and returns the augmented Graph. ``gspmm`` then dispatches
``copy_u × sum/mean`` to the fused kernel automatically when the plan's
padding expansion is acceptable and the shape qualifies.

Tip: relabel nodes by a locality partition first (``partition_assignment``
+ contiguous renumbering) — the plan's expansion factor, printed by this
function, is the thing to optimize.
"""

from __future__ import annotations

import dataclasses
import os
import sys
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..graph.graph import Graph, from_edges
from .lane_spmm import JG, RUNS_PER_CHUNK, SB, LanePlan, build_plan

__all__ = ["LaneAttachment", "attach_lane_plans", "choose_plan_config"]

# bump when the LanePlan layout or build_plan semantics change — stale cache
# files are then simply never matched (keyed into the filename)
_PLAN_CACHE_VERSION = 3

# -- (window, dense_threshold) auto-tuner -------------------------------------
# Per-pass cost model, v5e constants (see docs/KERNEL_SWEEP.md; re-calibrate
# with tools/calibrate_lane.py when hardware numbers move):
#   lane slot:      _SLOT_NS · (1 + _SUBGATHER_FRAC·(window/128 − 1))
#   remainder edge: _REM_NS   (XLA row-gather wall ~87M rows/s, ≥1 gather +
#                              segment reduce per pass; attention pays ~2×)
# NOTE: changing these constants changes the tuner's choice — bump
# _PLAN_CACHE_VERSION on recalibration so 'auto'-keyed cache files refresh.
_SLOT_NS = 2.7
_SUBGATHER_FRAC = 0.18
_REM_NS = 10.0
_WINDOWS = (128, 256, 512, 1024)
_THRESHOLDS = (8, 16, 24, 32, 48, 96)


def choose_plan_config(
    src: np.ndarray, dst: np.ndarray, *,
    windows=None, thresholds=None, rem_ns=None, subgather_frac=None,
) -> tuple:
    """Pick (window, dense_threshold) minimizing modeled per-pass cost.

    Counting only — no plan is built. Pair counts are computed once at the
    finest window (128) and aggregated upward (windows nest), so the scan
    over the config grid is O(#pairs), not O(E).

    ``rem_ns``/``subgather_frac`` override the model constants: the tier-2
    tuner prices residual edges at the measured row cost (edges it leaves
    behind REALLY go to the XLA row path) and sub-gathers at the narrow-dk
    rate (tier-2 exists for dk≈16 attention/SAGE shapes, where the per-slot
    cost is base-dominated, not gather-dominated)."""
    windows = _WINDOWS if windows is None else tuple(windows)
    thresholds = _THRESHOLDS if thresholds is None else tuple(thresholds)
    rem_ns = _REM_NS if rem_ns is None else float(rem_ns)
    sg = _SUBGATHER_FRAC if subgather_frac is None else float(subgather_frac)
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    e = len(src)
    if e == 0:
        return windows[0], thresholds[0], {"cost_ns": 0.0}
    base_key = (dst // JG) * (1 << 40) + src // SB  # (jg, sb128) packed
    keys, cnt = np.unique(base_key, return_counts=True)
    best = None
    for w in windows:
        k_sub = w // SB
        if k_sub > 1:
            pk = (keys >> 40) * (1 << 40) + (keys & ((1 << 40) - 1)) // k_sub
            _, inv = np.unique(pk, return_inverse=True)
            cw = np.bincount(inv, weights=cnt).astype(np.int64)
        else:
            cw = cnt
        slot_ns = _SLOT_NS * (1.0 + sg * (k_sub - 1))
        for thr in thresholds:
            dense = cw >= thr
            slots = int((-(-cw[dense] // SB) * SB).sum())
            rem = e - int(cw[dense].sum())
            cost = slots * slot_ns + rem * rem_ns
            if best is None or cost < best[2]["cost_ns"]:
                best = (w, thr, {
                    "cost_ns": cost, "slots": slots, "rem_edges": rem,
                    "rem_frac": rem / e,
                    "expansion": slots / max(e - rem, 1),
                })
    return best


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class LaneAttachment:
    plan: LanePlan
    remainder: Optional[Graph]  # final sparse-tile edges for the XLA path
    # VMEM-resident feature dtype for the kernel (None → bf16 default;
    # pass jnp.float32 to keep full precision at 2x the VMEM footprint)
    compute_dtype: Optional[object] = None
    # canonical (forward-order) edge id per remainder-graph edge slot —
    # the attention hybrid keys its dropout mask on these
    rem_eid: Optional[jnp.ndarray] = None
    # tier-2 wide-window plan over tier-1's sparse-tile remainder (its own
    # remainder is what ``remainder`` serves); None when tier-1's remainder
    # is small or tiles badly even at wide windows
    plan2: Optional[LanePlan] = None

    def tree_flatten(self):
        return (self.plan, self.remainder, self.rem_eid, self.plan2), (
            self.compute_dtype,)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(leaves[0], leaves[1], aux[0], leaves[2], leaves[3])


# tier-2 decision model: keep the wide-window plan only when its modeled
# cost beats serving tier-1's remainder through the XLA row path. The row
# path costs ≥1 row gather (~19 ns, measured floor — DESIGN_NOTES 5b) plus
# a segment reduce per pass; attention passes pay ~2 gathers. 25 ns/edge is
# the conservative single-gather figure.
_TIER2_MIN_EDGES = 50_000
_TIER2_WINDOWS = (2048, 4096, 8192)
_TIER2_THRESHOLDS = (8, 16, 32)
_TIER2_REM_NS = 25.0
# tier-2 serves the dk≈16 attention/SAGE shapes where a run's cost is
# base-dominated, not gather-dominated: the K-way sub-gather slope is far
# below tier-1's wide-feature 0.18 (w=8192 → ~4.4 ns/slot, the measured
# wide-window rate; recalibrate with tools/calibrate_lane.py)
_TIER2_SUBGATHER_FRAC = 0.01


def _build_tier2(plan: LanePlan, num_src: int, num_dst: int) -> Optional[LanePlan]:
    if len(plan.rem_src) < _TIER2_MIN_EDGES:
        return None
    w, thr, stats = choose_plan_config(
        plan.rem_src, plan.rem_dst,
        windows=_TIER2_WINDOWS, thresholds=_TIER2_THRESHOLDS,
        rem_ns=_TIER2_REM_NS, subgather_frac=_TIER2_SUBGATHER_FRAC,
    )
    # stats["cost_ns"] prices tier-2 slots at the (sub-gather-scaled) lane
    # rate and residual edges at the measured row cost; keep the plan only
    # when that beats sending ALL of tier-1's remainder to the row path
    if stats["cost_ns"] >= _TIER2_REM_NS * len(plan.rem_src):
        return None
    return build_plan(plan.rem_src, plan.rem_dst, num_src, num_dst,
                      dense_threshold=thr, eid=plan.rem_eid, window=w)


def _finish_attachment(plan: LanePlan, g: Graph, max_expansion: float,
                       compute_dtype=None,
                       plan2: Optional[LanePlan] = None,
                       ) -> Optional[LaneAttachment]:
    rem_frac = len(plan.rem_src) / max(g.num_edges, 1)
    tail = plan2 if plan2 is not None else plan
    final_rem_frac = len(tail.rem_src) / max(g.num_edges, 1)
    print(
        f"[dgl_tpu.kernels] lane plan: window={plan.window} "
        f"expansion={plan.expansion:.2f} "
        f"remainder={rem_frac:.1%} chunks={plan.num_chunks}"
        + (f" | tier2: window={plan2.window} expansion={plan2.expansion:.2f} "
           f"final_remainder={final_rem_frac:.2%} chunks={plan2.num_chunks}"
           if plan2 is not None else ""),
        file=sys.stderr,
    )
    if plan.expansion > max_expansion:
        return None
    rem = None
    rem_eid = None
    if len(tail.rem_src):
        rem = from_edges(
            tail.rem_src, tail.rem_dst, g.num_src_nodes, g.num_dst_nodes,
            build_reverse=False,
        )
        # canonical eids permuted into the remainder graph's dst-sorted
        # edge order (rem.eid maps its slots back to rem input order)
        pos = np.asarray(rem.eid)
        arr = np.full(len(pos), 2**31 - 1, np.int32)
        ok = pos < len(tail.rem_eid)
        arr[ok] = tail.rem_eid[pos[ok]].astype(np.int32)
        rem_eid = jnp.asarray(arr)
    return LaneAttachment(plan=plan, remainder=rem,
                          compute_dtype=compute_dtype, rem_eid=rem_eid,
                          plan2=plan2)


def _tuned_build(src, dst, num_src, num_dst, dense_threshold, window,
                 eid=None) -> LanePlan:
    """build_plan with (window, dense_threshold) auto-tuned when either is
    None (forced values constrain the tuner's grid to that axis)."""
    w, thr, _ = choose_plan_config(
        src, dst,
        windows=None if window is None else (window,),
        thresholds=None if dense_threshold is None else (dense_threshold,),
    )
    return build_plan(src, dst, num_src, num_dst, dense_threshold=thr,
                      eid=eid, window=w)


def _attach_one(g: Graph, dense_threshold, max_expansion: float,
                compute_dtype=None, eid: Optional[np.ndarray] = None,
                window=None) -> Optional[LaneAttachment]:
    src, dst = g.edges_numpy()
    plan = _tuned_build(src, dst, g.num_src_nodes, g.num_dst_nodes,
                        dense_threshold, window, eid=eid)
    plan2 = (_build_tier2(plan, g.num_src_nodes, g.num_dst_nodes)
             if plan.expansion <= max_expansion else None)
    return _finish_attachment(plan, g, max_expansion, compute_dtype,
                              plan2=plan2)


# -- plan cache -------------------------------------------------------------
# Plan building is pure host preprocessing but costs minutes at products
# scale (124M edges) — and it is rerun per *process* (harness subprocesses,
# retries). Persist both directions' plans to one .npz keyed like the
# partition cache (seed-free: plans are deterministic given the edge list).

_PLAN_SCALARS = ("num_chunks", "num_groups", "n_src_pad", "n_dst_pad",
                 "num_edges", "num_edges_total", "window")


def _plan_cache_path(cache_dir: str, cache_key: str, src: np.ndarray,
                     dst: np.ndarray, dense_threshold, window) -> str:
    h = 0
    if len(src):
        step = max(len(src) // 4096, 1)
        h = int(
            (np.asarray(src[::step], np.int64) * 31
             + np.asarray(dst[::step], np.int64)).sum()
        ) & 0xFFFFFFFF
    name = (
        f"{cache_key}_laneplan_v{_PLAN_CACHE_VERSION}_{SB}x{JG}x{RUNS_PER_CHUNK}"
        f"_w{window or 'a'}_t{dense_threshold or 'a'}_e{len(src)}_h{h:08x}.npz"
    )
    return os.path.join(cache_dir, name)


def _plan_to_payload(prefix: str, plan: LanePlan) -> dict:
    out = {
        f"{prefix}_meta": np.asarray(plan.meta),
        f"{prefix}_bucket": np.asarray(plan.bucket),
        f"{prefix}_group": np.asarray(plan.group),
        f"{prefix}_first": np.asarray(plan.first),
        f"{prefix}_eid": np.asarray(plan.eid),
        f"{prefix}_scalars": np.asarray(
            [getattr(plan, k) for k in _PLAN_SCALARS], np.int64
        ),
        f"{prefix}_expansion": np.float64(plan.expansion),
        f"{prefix}_rem_src": np.asarray(plan.rem_src, np.int64),
        f"{prefix}_rem_dst": np.asarray(plan.rem_dst, np.int64),
        f"{prefix}_rem_eid": np.asarray(plan.rem_eid, np.int64),
    }
    return out


def _plan_from_payload(prefix: str, z) -> LanePlan:
    scalars = {k: int(v) for k, v in zip(_PLAN_SCALARS, z[f"{prefix}_scalars"])}
    return LanePlan(
        meta=jnp.asarray(z[f"{prefix}_meta"]),
        bucket=jnp.asarray(z[f"{prefix}_bucket"]),
        group=jnp.asarray(z[f"{prefix}_group"]),
        first=jnp.asarray(z[f"{prefix}_first"]),
        eid=jnp.asarray(z[f"{prefix}_eid"]),
        expansion=float(z[f"{prefix}_expansion"]),
        rem_src=z[f"{prefix}_rem_src"],
        rem_dst=z[f"{prefix}_rem_dst"],
        rem_eid=z[f"{prefix}_rem_eid"],
        **scalars,
    )


def attach_lane_plans(
    g: Graph, *, dense_threshold: Optional[int] = None,
    window: Optional[int] = None, max_expansion: float = 2.5,
    compute_dtype=None, cache_dir: Optional[str] = None,
    cache_key: Optional[str] = None,
) -> Graph:
    """Returns ``g`` with lane plans attached to it and its reverse (when
    profitable); returns ``g`` unchanged if the graph tiles too sparsely.

    ``window``/``dense_threshold`` default to auto-tuned per direction by
    :func:`choose_plan_config` (counting cost model); pass explicit values
    to force either axis.

    ``compute_dtype`` sets the kernel's VMEM feature dtype (None → bf16,
    ~1e-2 relative error; ``jnp.float32`` keeps full precision at double
    the VMEM footprint — only viable for small D x N).

    ``cache_dir``/``cache_key`` persist the built plans (both directions)
    to an ``.npz`` content-hashed on the edge list — plan building costs
    minutes per process at products scale, the reload costs seconds. The
    ``max_expansion`` gate is applied at load time, so a cached
    too-sparse plan is still (cheaply) rejected.
    """
    src_np, dst_np = g.edges_numpy()
    # absolute-cost profitability gate (auto-tuned mode only): max_expansion
    # alone admits low-locality graphs where the lane path merely isn't
    # catastrophic but still LOSES to the XLA row path (measured: arxiv GAT
    # 1.84 s/epoch with lane vs sub-second XLA). Skip attachment when the
    # best modeled lane cost isn't at least 2x cheaper than all-rows — the
    # factor credits the fused attention path, which replaces ~2-3 row
    # passes per lane pass. Counting-only (O(#pairs)); runs before the
    # cache so a stale profitable-looking cache can't resurrect a loser.
    # DGL_TPU_LANE_FORCE_ATTACH bypasses the 2x gate: the gate prices the
    # row path at ONE row op per edge, but a full copy_u SpMM pass pays
    # gather + scatter (~2 row ops) — for SAGE-shaped workloads on huge
    # dense graphs (products: modeled lane 596 ms vs single-op row 921 ms)
    # the lane path wins the real comparison while failing the gate. The
    # per-op runtime profitability check (lane_profitable) still applies.
    force = bool(os.environ.get("DGL_TPU_LANE_FORCE_ATTACH"))
    if dense_threshold is None and window is None and not force:
        _, _, stats = choose_plan_config(src_np, dst_np)
        all_row_ns = max(len(src_np), 1) * _REM_NS
        if stats["cost_ns"] > all_row_ns / 2.0:
            print(
                f"[dgl_tpu.kernels] lane plan skipped: modeled "
                f"{stats['cost_ns'] / 1e6:.1f}ms vs all-row "
                f"{all_row_ns / 1e6:.1f}ms (need 2x win)",
                file=sys.stderr,
            )
            return g
    path = None
    if cache_dir and cache_key:
        path = _plan_cache_path(cache_dir, cache_key, src_np, dst_np,
                                dense_threshold, window)
        if os.path.exists(path):
            with np.load(path) as z:
                fwd_plan = _plan_from_payload("f", z)
                rev_plan = _plan_from_payload("r", z) if "r_scalars" in z else None
                fwd2 = _plan_from_payload("f2", z) if "f2_scalars" in z else None
                rev2 = _plan_from_payload("r2", z) if "r2_scalars" in z else None
            fwd = _finish_attachment(fwd_plan, g, max_expansion, compute_dtype,
                                     plan2=fwd2)
            if fwd is None:
                return g
            rev = g.reverse
            if rev is not None and rev_plan is not None:
                rev_att = _finish_attachment(rev_plan, rev, max_expansion,
                                             compute_dtype, plan2=rev2)
                rev = dataclasses.replace(rev, lane=rev_att)
            return dataclasses.replace(g, lane=fwd, reverse=rev)

    fwd_plan = _tuned_build(src_np, dst_np, g.num_src_nodes, g.num_dst_nodes,
                            dense_threshold, window)
    if path is None and fwd_plan.expansion > max_expansion:
        # uncached + unprofitable: skip the (equally expensive) reverse build
        _finish_attachment(fwd_plan, g, max_expansion, compute_dtype)
        return g
    fwd_plan2 = (_build_tier2(fwd_plan, g.num_src_nodes, g.num_dst_nodes)
                 if fwd_plan.expansion <= max_expansion else None)
    rev = g.reverse
    rev_plan = rev_plan2 = None
    if rev is not None:
        # the reverse plan's eid slots carry FORWARD-canonical edge ids
        # (rev.eid maps reverse-canonical → forward-canonical) so that
        # plan-layout edge data — attention dropout masks, u_mul_e weights —
        # refers to the same edge in both layouts
        rev_eid = np.asarray(rev.eid)[: rev.num_edges]
        rsrc, rdst = rev.edges_numpy()
        rev_plan = _tuned_build(rsrc, rdst, rev.num_src_nodes,
                                rev.num_dst_nodes, dense_threshold, window,
                                eid=rev_eid)
        if rev_plan.expansion <= max_expansion:
            rev_plan2 = _build_tier2(rev_plan, rev.num_src_nodes,
                                     rev.num_dst_nodes)
    if path is not None:
        os.makedirs(cache_dir, exist_ok=True)
        payload = _plan_to_payload("f", fwd_plan)
        if fwd_plan2 is not None:
            payload.update(_plan_to_payload("f2", fwd_plan2))
        if rev_plan is not None:
            payload.update(_plan_to_payload("r", rev_plan))
        if rev_plan2 is not None:
            payload.update(_plan_to_payload("r2", rev_plan2))
        tmp = path + ".tmp.npz"
        np.savez(tmp, **payload)
        os.replace(tmp, path)

    fwd = _finish_attachment(fwd_plan, g, max_expansion, compute_dtype,
                             plan2=fwd_plan2)
    if fwd is None:
        return g
    if rev is not None and rev_plan is not None:
        rev_att = _finish_attachment(rev_plan, rev, max_expansion,
                                     compute_dtype, plan2=rev_plan2)
        rev = dataclasses.replace(rev, lane=rev_att)
    return dataclasses.replace(g, lane=fwd, reverse=rev)
