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
    exchanges), and edge sources are pre-remapped into the received table.

    src_remap: (k, E_sh) int32 — per-shard edge sources as indices into
               [own rows | received rows] (own-local id, or
               nps + owner·H + slot); sentinel = last slot on pads.
    indptr:    (k, nps+1) int32 — local dst offsets (as ShardedGraph).
    send_tab:  (k, k, H) int32 — send_tab[o, s] = owner-local row indices o
               ships to s (padding 0 → harmless duplicate rows).
    """

    src_remap: jnp.ndarray
    indptr: jnp.ndarray
    send_tab: jnp.ndarray
    num_nodes: int
    nodes_per_shard: int
    num_shards: int
    rows_per_pair: int

    def tree_flatten(self):
        return (self.src_remap, self.indptr, self.send_tab), (
            self.num_nodes, self.nodes_per_shard, self.num_shards, self.rows_per_pair
        )

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, *aux)


def shard_fullgraph_boundary(
    src: np.ndarray, dst: np.ndarray, num_nodes: int, num_shards: int
) -> Tuple["BoundarySharded", int]:
    """Host-side build of the boundary-exchange plan. Returns
    (plan, n_pad); node arrays must be padded to n_pad rows."""
    from ..csrc import native

    k = num_shards
    nps = pad_length(-(-num_nodes // k), 8)
    n_pad = nps * k
    shard_of = dst // nps

    per_src = []
    per_indptr = []
    needed = []  # list of (k,) lists of owner-local requested rows
    for s_i in range(k):
        m = shard_of == s_i
        d_local = dst[m] - s_i * nps
        indptr, src_sorted, _ = native.build_csr(
            np.asarray(d_local, np.int64), np.asarray(src[m], np.int64), nps
        )
        per_src.append(src_sorted)
        per_indptr.append(indptr)
        uniq = np.unique(src_sorted) if len(src_sorted) else np.zeros(0, np.int64)
        owners = uniq // nps
        # own-shard rows are read directly from the local slice (keeps them
        # out of the all_to_all AND makes the local-edge computation
        # independent of the collective, so XLA can overlap them)
        needed.append(
            [uniq[(owners == o) & (o != s_i)] - o * nps for o in range(k)]
        )

    H = max(
        (len(lst) for req in needed for lst in req), default=1
    )
    H = max(H, 1)
    e_pad = pad_length(max((len(s) for s in per_src), default=1))

    send_tab = np.zeros((k, k, H), dtype=np.int32)
    src_remap = np.full((k, e_pad), nps + k * H - 1, dtype=np.int32)
    indptr_s = np.zeros((k, nps + 1), dtype=np.int32)
    lookup = np.zeros(num_nodes + nps * k, dtype=np.int64)
    for s_i in range(k):
        # table layout: [own rows (nps) | recv (k*H)]
        own = np.arange(nps, dtype=np.int64)
        lookup[s_i * nps + own] = own
        for o in range(k):
            rows = needed[s_i][o]
            send_tab[o, s_i, : len(rows)] = rows
            lookup[o * nps + rows] = nps + o * H + np.arange(len(rows))
        sl = per_src[s_i]
        src_remap[s_i, : len(sl)] = lookup[sl]
        indptr_s[s_i] = per_indptr[s_i]
    return (
        BoundarySharded(
            src_remap=jnp.asarray(src_remap),
            indptr=jnp.asarray(indptr_s),
            send_tab=jnp.asarray(send_tab),
            num_nodes=num_nodes,
            nodes_per_shard=nps,
            num_shards=k,
            rows_per_pair=H,
        ),
        n_pad,
    )


def halo_spmm_boundary(
    bs: "BoundarySharded",
    x: jnp.ndarray,  # (n_pad, D) row-sharded P(axis)
    mesh: Mesh,
    axis: str = "graph",
    reduce: str = "mean",
) -> jnp.ndarray:
    """copy_u SpMM exchanging ONLY the requested boundary rows (all_to_all);
    communication volume is k·H·D per device instead of the full matrix."""
    H = bs.rows_per_pair

    def local(remap_s, indptr_s, send_s, x_s):
        remap_l = remap_s[0]
        indptr_l = indptr_s[0]
        send_l = send_s[0]  # (k, H) rows this device ships per destination
        payload = jnp.take(x_s, send_l.reshape(-1), axis=0).reshape(
            bs.num_shards, H, x_s.shape[1]
        )
        recv = jax.lax.all_to_all(payload, axis, split_axis=0, concat_axis=0, tiled=False)
        # own rows first, then received halo — local-edge messages depend
        # only on x_s, so XLA overlaps them with the collective
        table = jnp.concatenate(
            [x_s, recv.reshape(bs.num_shards * H, x_s.shape[1])], axis=0
        )
        msg = jnp.take(table, remap_l, axis=0)
        from ..ops.segment import segment_sum_sorted_scan

        out = segment_sum_sorted_scan(msg, indptr_l)
        if reduce == "mean":
            deg = jnp.maximum(indptr_l[1:] - indptr_l[:-1], 1).astype(out.dtype)
            out = out / deg[:, None]
        return out

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_rep=False,
    )(bs.src_remap, bs.indptr, bs.send_tab, x)
