"""Edge-partitioned full-graph SpMM with explicit collectives (shard_map).

This is the north-star capability from SURVEY §5/§7: the reference can only
full-graph-train what fits one GPU (OOM rows in README.md:43,46); here the
graph AND the activations are sharded over the ``graph`` mesh axis so memory
scales with devices:

* nodes are owned in contiguous ranges of ``N/k`` per device (relabel by a
  locality partition first for smaller halos);
* each device stores the in-edges of its own dst range (src ids global);
* forward: ``all_gather`` the sharded source features over ICI (the halo
  exchange — v1 gathers the full feature matrix; boundary-only exchange is
  the planned refinement), then a *local* fused gather+segment-reduce
  produces the device's own dst rows;
* backward: JAX transposes ``all_gather`` into ``psum_scatter``, so the
  gradient flows back as a reduce-scatter — exactly the hand-written
  distributed SpMM-transpose, derived automatically.

Compare ``spmd.py``: that path keeps activations replicated and lets GSPMD
insert collectives (simple, memory-bound by one device); this path is the
explicitly-sharded scalable one.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..graph.graph import Graph, pad_length

__all__ = [
    "ShardedGraph",
    "shard_fullgraph",
    "halo_spmm",
    "BoundarySharded",
    "shard_fullgraph_boundary",
    "halo_spmm_boundary",
    "halo_gat_boundary",
]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class ShardedGraph:
    """Stacked per-shard edge structure (leading dim = shard).

    src:    (k, E_sh) int32 — GLOBAL source ids (sentinel num_nodes pads)
    indptr: (k, nodes_per_shard + 1) int32 — local in-edge offsets for the
            shard's own dst range; dst-sorted within the shard.
    num_nodes / nodes_per_shard / num_shards: static.
    """

    src: jnp.ndarray
    indptr: jnp.ndarray
    num_nodes: int
    nodes_per_shard: int
    num_shards: int

    def tree_flatten(self):
        return (self.src, self.indptr), (self.num_nodes, self.nodes_per_shard, self.num_shards)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, *aux)


def shard_fullgraph(
    src: np.ndarray, dst: np.ndarray, num_nodes: int, num_shards: int
) -> Tuple[ShardedGraph, int]:
    """Partition edges by contiguous dst ranges (host-side).

    Returns (sharded_graph, n_pad) where node arrays must be padded to
    ``n_pad = nodes_per_shard * num_shards`` rows.
    """
    nps = pad_length(-(-num_nodes // num_shards), 8)
    n_pad = nps * num_shards
    shard_of = dst // nps
    e_pad = pad_length(int(np.bincount(shard_of, minlength=num_shards).max()))

    from ..csrc import native

    src_s = np.full((num_shards, e_pad), n_pad, dtype=np.int32)
    indptr_s = np.zeros((num_shards, nps + 1), dtype=np.int32)
    for s in range(num_shards):
        m = shard_of == s
        d_local = dst[m] - s * nps
        indptr, src_sorted, _ = native.build_csr(
            np.asarray(d_local, np.int64), np.asarray(src[m], np.int64), nps
        )
        src_s[s, : m.sum()] = src_sorted
        indptr_s[s] = indptr
    return (
        ShardedGraph(
            src=jnp.asarray(src_s),
            indptr=jnp.asarray(indptr_s),
            num_nodes=num_nodes,
            nodes_per_shard=nps,
            num_shards=num_shards,
        ),
        n_pad,
    )


def place(sg: ShardedGraph, mesh: Mesh, axis: str = "graph") -> ShardedGraph:
    """Put the stacked shard arrays so each device holds its own shard."""
    sh = NamedSharding(mesh, P(axis))
    return jax.device_put(sg, ShardedGraph(sh, sh, sg.num_nodes, sg.nodes_per_shard, sg.num_shards))


def halo_spmm(
    sg: ShardedGraph,
    x: jnp.ndarray,  # (n_pad, D) sharded P(axis) on rows
    mesh: Mesh,
    axis: str = "graph",
    reduce: str = "mean",
) -> jnp.ndarray:
    """copy_u SpMM over the sharded graph; returns (n_pad, D) row-sharded."""

    def local(src_s, indptr_s, x_s):
        # src_s (1, E_sh), indptr_s (1, nps+1), x_s (nps, D)
        src_l = src_s[0]
        indptr_l = indptr_s[0]
        x_full = jax.lax.all_gather(x_s, axis, tiled=True)  # halo exchange
        msg = jnp.take(x_full, jnp.minimum(src_l, sg.num_nodes - 1), axis=0)
        from ..ops.segment import segment_sum_sorted_scan

        out = segment_sum_sorted_scan(msg, indptr_l)
        if reduce == "mean":
            deg = jnp.maximum(indptr_l[1:] - indptr_l[:-1], 1).astype(out.dtype)
            out = out / deg[:, None]
        return out

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_rep=False,
    )(sg.src, sg.indptr, x)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class BoundarySharded:
    """Boundary-exchange variant of :class:`ShardedGraph`.

    Instead of all-gathering the full feature matrix, each device requests
    exactly the source rows it needs: host-precomputed send tables drive an
    ``all_to_all`` of (k, H, D) row blocks (H = max rows any pair
    exchanges). Edges are split host-side into **local** (src owned by the
    same shard — their messages read the device's own feature slice and are
    completely independent of the collective, so XLA's async-collective
    scheduler overlaps them with the exchange) and **halo** (src remapped
    into the received table).

    local_src:   (k, E_loc) int32 — owner-local src rows of local edges,
                 dst-sorted per ``local_indptr``.
    local_indptr:(k, nps+1) int32 — per-dst offsets of local edges.
    halo_remap:  (k, E_halo) int32 — halo-edge sources as indices into the
                 received (k·H)-row table; dst-sorted per ``halo_indptr``.
    halo_indptr: (k, nps+1) int32 — per-dst offsets of halo edges.
    send_tab:    (k, k, H) int32 — send_tab[o, s] = owner-local row indices
                 o ships to s (padding 0 → harmless duplicate rows).
    """

    local_src: jnp.ndarray
    local_indptr: jnp.ndarray
    halo_remap: jnp.ndarray
    halo_indptr: jnp.ndarray
    send_tab: jnp.ndarray
    num_nodes: int
    nodes_per_shard: int
    num_shards: int
    rows_per_pair: int

    def tree_flatten(self):
        return (
            self.local_src, self.local_indptr, self.halo_remap,
            self.halo_indptr, self.send_tab,
        ), (self.num_nodes, self.nodes_per_shard, self.num_shards, self.rows_per_pair)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, *aux)


def shard_fullgraph_boundary(
    src: np.ndarray, dst: np.ndarray, num_nodes: int, num_shards: int,
    return_eids: bool = False,
):
    """Host-side build of the boundary-exchange plan. Returns
    (plan, n_pad); node arrays must be padded to n_pad rows.

    ``return_eids=True`` additionally returns ``(local_eids, halo_eids)`` —
    per-shard lists of ORIGINAL edge indices in the plan's dst-sorted
    local/halo order, for laying out per-edge data (e.g. RGCN relation
    weights) alongside ``local_src``/``halo_remap``.
    """
    from ..csrc import native

    k = num_shards
    nps = pad_length(-(-num_nodes // k), 8)
    n_pad = nps * k
    shard_of = dst // nps
    src_shard = src // nps

    per_local_src, per_local_indptr = [], []
    per_halo_src, per_halo_indptr = [], []
    local_eids, halo_eids = [], []
    needed = []  # list of (k,) lists of owner-local requested rows
    for s_i in range(k):
        m = shard_of == s_i
        loc = m & (src_shard == s_i)
        hal = m & (src_shard != s_i)
        lp, ls, lord = native.build_csr(
            np.asarray(dst[loc] - s_i * nps, np.int64),
            np.asarray(src[loc] - s_i * nps, np.int64), nps,
        )
        hp, hs, hord = native.build_csr(
            np.asarray(dst[hal] - s_i * nps, np.int64),
            np.asarray(src[hal], np.int64), nps,
        )
        per_local_src.append(ls)
        per_local_indptr.append(lp)
        per_halo_src.append(hs)
        per_halo_indptr.append(hp)
        if return_eids:
            local_eids.append(np.where(loc)[0][lord])
            halo_eids.append(np.where(hal)[0][hord])
        uniq = np.unique(hs) if len(hs) else np.zeros(0, np.int64)
        owners = uniq // nps
        needed.append([uniq[owners == o] - o * nps for o in range(k)])

    H = max((len(lst) for req in needed for lst in req), default=1)
    H = max(H, 1)
    e_loc = pad_length(max((len(s) for s in per_local_src), default=1))
    e_hal = pad_length(max((len(s) for s in per_halo_src), default=1))

    send_tab = np.zeros((k, k, H), dtype=np.int32)
    local_src = np.zeros((k, e_loc), dtype=np.int32)
    halo_remap = np.full((k, e_hal), k * H - 1, dtype=np.int32)
    local_indptr = np.zeros((k, nps + 1), dtype=np.int32)
    halo_indptr = np.zeros((k, nps + 1), dtype=np.int32)
    lookup = np.zeros(nps * k, dtype=np.int64)
    for s_i in range(k):
        for o in range(k):
            rows = needed[s_i][o]
            send_tab[o, s_i, : len(rows)] = rows
            lookup[o * nps + rows] = o * H + np.arange(len(rows))
        local_src[s_i, : len(per_local_src[s_i])] = per_local_src[s_i]
        local_indptr[s_i] = per_local_indptr[s_i]
        halo_remap[s_i, : len(per_halo_src[s_i])] = lookup[per_halo_src[s_i]]
        halo_indptr[s_i] = per_halo_indptr[s_i]
    bs = BoundarySharded(
        local_src=jnp.asarray(local_src),
        local_indptr=jnp.asarray(local_indptr),
        halo_remap=jnp.asarray(halo_remap),
        halo_indptr=jnp.asarray(halo_indptr),
        send_tab=jnp.asarray(send_tab),
        num_nodes=num_nodes,
        nodes_per_shard=nps,
        num_shards=k,
        rows_per_pair=H,
    )
    if return_eids:
        return bs, n_pad, local_eids, halo_eids
    return bs, n_pad


def plan_layout_edata_boundary(
    bs: "BoundarySharded", local_eids, halo_eids, edata: np.ndarray, fill=0.0
):
    """Per-edge data (input edge order) → the plan's (k, E_loc, ...) /
    (k, E_hal, ...) layouts (padding slots get ``fill``). Use with
    ``shard_fullgraph_boundary(..., return_eids=True)``."""
    edata = np.asarray(edata)
    k = bs.num_shards
    e_loc = bs.local_src.shape[1]
    e_hal = bs.halo_remap.shape[1]
    tail = edata.shape[1:]
    w_loc = np.full((k, e_loc) + tail, fill, edata.dtype)
    w_hal = np.full((k, e_hal) + tail, fill, edata.dtype)
    for s_i in range(k):
        w_loc[s_i, : len(local_eids[s_i])] = edata[local_eids[s_i]]
        w_hal[s_i, : len(halo_eids[s_i])] = edata[halo_eids[s_i]]
    return jnp.asarray(w_loc), jnp.asarray(w_hal)


def halo_rgcn_boundary(
    bs: "BoundarySharded",
    y: jnp.ndarray,        # (n_pad, R·D) per-relation projections, P(axis)
    w_local: jnp.ndarray,  # (k, E_loc, R) plan-layout relation weights
    w_halo: jnp.ndarray,   # (k, E_hal, R)
    n_rel: int,
    mesh: Mesh,
    axis: str = "graph",
    reduce: str = "mean",
) -> jnp.ndarray:
    """Relation-contracted SpMM across shard boundaries (sharded
    ``ops.spmm.gspmm_rel`` — RGCN layer semantics,
    ``main_dgl_proteins_rgcn_for.py:46-60``): per edge,
    ``Σ_r w[e,r] · y[src, r·D:(r+1)·D]``, mean-reduced by dst. The flat
    (R·D)-wide projection rides the SAME boundary all_to_all as copy_u —
    R× the exchange volume, still ∝ boundary size, not N."""
    H = bs.rows_per_pair
    dd = y.shape[1] // n_rel

    def contract(rows, w):
        # rows: (E, R·D) gathered projections; w: (E, R)
        return sum(
            rows[:, r * dd:(r + 1) * dd] * w[:, r][:, None].astype(rows.dtype)
            for r in range(n_rel)
        )

    def local(lsrc_s, lptr_s, hmap_s, hptr_s, send_s, wl_s, wh_s, y_s):
        send_l = send_s[0]
        payload = jnp.take(y_s, send_l.reshape(-1), axis=0).reshape(
            bs.num_shards, H, y_s.shape[1]
        )
        recv = jax.lax.all_to_all(payload, axis, split_axis=0, concat_axis=0,
                                  tiled=False)
        from ..ops.segment import segment_sum_sorted_scan

        # local edges overlap with the exchange (no data dependence)
        msg_l = contract(jnp.take(y_s, lsrc_s[0], axis=0), wl_s[0])
        out = segment_sum_sorted_scan(msg_l, lptr_s[0])
        halo_rows = jnp.take(
            recv.reshape(bs.num_shards * H, y_s.shape[1]), hmap_s[0], axis=0
        )
        out = out + segment_sum_sorted_scan(contract(halo_rows, wh_s[0]), hptr_s[0])
        if reduce == "mean":
            deg = (lptr_s[0][1:] - lptr_s[0][:-1]) + (hptr_s[0][1:] - hptr_s[0][:-1])
            out = out / jnp.maximum(deg, 1).astype(out.dtype)[:, None]
        return out

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis),) * 8,
        out_specs=P(axis),
        check_rep=False,
    )(bs.local_src, bs.local_indptr, bs.halo_remap, bs.halo_indptr,
      bs.send_tab, w_local, w_halo, y)


def halo_spmm_boundary(
    bs: "BoundarySharded",
    x: jnp.ndarray,  # (n_pad, D) row-sharded P(axis)
    mesh: Mesh,
    axis: str = "graph",
    reduce: str = "mean",
) -> jnp.ndarray:
    """copy_u SpMM exchanging ONLY the requested boundary rows (all_to_all);
    communication volume is k·H·D per device instead of the full matrix.
    Local-edge aggregation has no data dependence on the collective, so the
    exchange overlaps with it."""
    H = bs.rows_per_pair

    def local(lsrc_s, lptr_s, hmap_s, hptr_s, send_s, x_s):
        send_l = send_s[0]  # (k, H) rows this device ships per destination
        payload = jnp.take(x_s, send_l.reshape(-1), axis=0).reshape(
            bs.num_shards, H, x_s.shape[1]
        )
        recv = jax.lax.all_to_all(payload, axis, split_axis=0, concat_axis=0, tiled=False)
        from ..ops.segment import segment_sum_sorted_scan

        # local edges: reads only x_s → scheduled concurrently with the
        # all_to_all (async collective start/done)
        out = segment_sum_sorted_scan(jnp.take(x_s, lsrc_s[0], axis=0), lptr_s[0])
        halo_msg = jnp.take(
            recv.reshape(bs.num_shards * H, x_s.shape[1]), hmap_s[0], axis=0
        )
        out = out + segment_sum_sorted_scan(halo_msg, hptr_s[0])
        if reduce == "mean":
            deg = (lptr_s[0][1:] - lptr_s[0][:-1]) + (hptr_s[0][1:] - hptr_s[0][:-1])
            out = out / jnp.maximum(deg, 1).astype(out.dtype)[:, None]
        return out

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_rep=False,
    )(bs.local_src, bs.local_indptr, bs.halo_remap, bs.halo_indptr, bs.send_tab, x)


def _spread_by_indptr(v, indptr, e_len: int):
    """v[owner(e)] for dst-sorted edges, scan-formulated (the gather_dst
    trick on plain arrays): scatter first-differences at row starts, prefix
    sum over edges. Values beyond ``indptr[-1]`` are garbage — downstream
    reductions must be indptr-bounded (segment_sum_sorted_scan is)."""
    diffs = jnp.concatenate([v[:1], v[1:] - v[:-1]], axis=0)
    z = jnp.zeros((e_len,) + v.shape[1:], v.dtype)
    z = z.at[indptr[:-1]].add(diffs, indices_are_sorted=True, mode="drop")
    return jnp.cumsum(z, axis=0)


def halo_gat_boundary(
    bs: "BoundarySharded",
    z: jnp.ndarray,      # (n_pad, H, D) row-sharded P(axis): projected feats
    a_src: jnp.ndarray,  # (n_pad, H) row-sharded: per-node src attention dot
    a_dst: jnp.ndarray,  # (n_pad, H) row-sharded: per-node dst attention dot
    mesh: Mesh,
    axis: str = "graph",
    negative_slope: float = 0.2,
) -> jnp.ndarray:
    """Sharded multi-head GAT aggregation: softmax over ALL in-edges of each
    owned dst (local + halo) of ``leaky_relu(a_src[u] + a_dst[v])``, weighted
    sum of ``z[u]``. Extends :func:`halo_spmm_boundary` beyond copy_u — the
    boundary exchange ships ``[z | a_src]`` rows, and the edge-softmax shift
    is the per-dst upper bound ``leaky_relu(pmax(a_src) + a_dst)`` (softmax
    is shift-invariant; the pmax is one (H,)-scalar collective), so no
    cross-shard segment-max is ever needed. Numerator/denominator terms
    reduce locally per edge class and combine per dst; backward transposes
    through shard_map automatically (all_to_all ↔ all_to_all).

    Reference capability: full-graph GAT at reddit scale, which OOMs the
    single-GPU PyG baseline (``/root/reference/README.md:43``).
    """
    Hrows = bs.rows_per_pair
    k = bs.num_shards
    tiny = jnp.finfo(jnp.float32).tiny

    def local(lsrc_s, lptr_s, hmap_s, hptr_s, send_s, z_s, as_s, ad_s):
        lsrc, lptr = lsrc_s[0], lptr_s[0]
        hmap, hptr = hmap_s[0], hptr_s[0]
        send = send_s[0]
        nh, dh = z_s.shape[1], z_s.shape[2]
        zf = z_s.reshape(z_s.shape[0], nh * dh)
        pay = jnp.concatenate([zf, as_s], axis=1)
        payload = jnp.take(pay, send.reshape(-1), axis=0).reshape(
            k, Hrows, nh * dh + nh)
        recv = jax.lax.all_to_all(
            payload, axis, split_axis=0, concat_axis=0, tiled=False
        ).reshape(k * Hrows, nh * dh + nh)
        # per-dst softmax shift: valid upper bound on every edge logit.
        # stop_gradient BEFORE the pmax — softmax is shift-invariant so the
        # bound carries no gradient, and pmax has no differentiation rule
        gmax = jax.lax.pmax(
            jnp.max(jax.lax.stop_gradient(as_s), axis=0), axis)  # (H,)
        raw = jax.lax.stop_gradient(ad_s) + gmax[None, :]
        bound = jnp.where(raw > 0, raw, negative_slope * raw)  # (nps, H)

        from ..ops.segment import segment_sum_sorted_scan

        def edge_terms(ze, ae, ptr, e_len):
            logit = ae + _spread_by_indptr(ad_s, ptr, e_len)
            logit = jnp.where(logit > 0, logit, negative_slope * logit)
            # edges beyond indptr[-1] are padding whose spread values are
            # garbage; exp of garbage can be inf, and inf × a zero cotangent
            # is NaN in the backward — zero them out on both sides of exp
            valid = (
                jnp.arange(e_len, dtype=jnp.int32) < ptr[-1]
            )[:, None].astype(logit.dtype)
            shifted = (logit - _spread_by_indptr(bound, ptr, e_len)) * valid
            p = jnp.exp(shifted) * valid
            num = segment_sum_sorted_scan(p[:, :, None] * ze, ptr)
            den = segment_sum_sorted_scan(p, ptr)
            return num, den

        # local edges first: no data dependence on the collective, so the
        # async all_to_all overlaps with this aggregation
        ze_l = jnp.take(zf, lsrc, axis=0).reshape(-1, nh, dh)
        ae_l = jnp.take(as_s, lsrc, axis=0)
        num, den = edge_terms(ze_l, ae_l, lptr, lsrc.shape[0])
        ze_h = jnp.take(recv[:, : nh * dh], hmap, axis=0).reshape(-1, nh, dh)
        ae_h = jnp.take(recv[:, nh * dh:], hmap, axis=0)
        num_h, den_h = edge_terms(ze_h, ae_h, hptr, hmap.shape[0])
        # where-guarded division: zero-in-degree dsts (incl. padding rows)
        # have num = den = 0, and the grad of 0/max(0,tiny) is 0/tiny² → NaN
        # (tiny² underflows f32); divide by 1 there and zero the output
        den_t = den + den_h
        has = den_t > tiny
        safe = jnp.where(has, den_t, 1.0)[:, :, None]
        return jnp.where(has[:, :, None], (num + num_h) / safe, 0.0)

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis),) * 5 + (P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_rep=False,
    )(bs.local_src, bs.local_indptr, bs.halo_remap, bs.halo_indptr,
      bs.send_tab, z, a_src, a_dst)
