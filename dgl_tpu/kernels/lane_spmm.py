"""Pallas fused SpMM: bucketed lane-gather + MXU one-hot scatter.

Motivation (measured on v5e, see tpu-gather-perf notes): XLA's row gather is
per-row bound at ~87M rows/s regardless of width — the whole cost of
full-graph message passing. This kernel replaces it with two vectorized
primitives the hardware actually has:

* **gather**: ``tpu.dynamic_gather`` (take_along_axis) along the 128-lane
  dim — features stored feature-major ``(D, N)`` fully VMEM-resident, and
  each 128-edge *run* reads from a single 128-node source bucket;
* **scatter**: a per-run one-hot matmul ``(D,128) @ (128,1024)`` on the MXU,
  accumulating into the destination group's output block in VMEM.

Host-side planning (``build_plan``): edges are regrouped by
``(dst_group of 1024, src_bucket of 128)`` and padded to 128-edge runs;
runs are packed into fixed-size chunks per dst group (one grid step each).
The plan's ``expansion`` factor (padded/real edges) is the cost of
sparsity — the caller falls back to the XLA path when it is too high
(hypersparse tiles, e.g. unclustered node orderings).

v1 scope: ``copy_u`` × ``sum``/``mean``, D ≤ 32, forward; the transpose
plan (built from the reverse edge list) serves the backward pass via
``lane_spmm_vjp``.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["LanePlan", "build_plan", "lane_spmm"]

SB = 128  # src bucket width (lane-gather window)
JG = 1024  # dst nodes per output group
RUNS_PER_CHUNK = 64  # runs (of 128 edges) per grid step


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class LanePlan:
    """Host-precomputed execution plan for one graph direction."""

    src_lo: jnp.ndarray  # (chunks, R, 128) int32 — src offset within bucket
    dst_lo: jnp.ndarray  # (chunks, R, 128) int32 — dst offset within group (JG pad)
    bucket: jnp.ndarray  # (chunks, 8, 128) int32 — src bucket id per run (row 0)
    group: jnp.ndarray  # (chunks,) int32 — dst group id per chunk
    first: jnp.ndarray  # (chunks,) int32 — 1 if first chunk of its group
    num_chunks: int
    num_groups: int
    n_src_pad: int  # multiple of SB
    n_dst_pad: int  # num_groups * JG
    num_edges: int  # edges covered by the plan (dense tiles)
    expansion: float
    # host-side remainder (sparse tiles) served by the XLA gather path
    rem_src: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(0, np.int64))
    rem_dst: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(0, np.int64))
    num_edges_total: int = 0

    def tree_flatten(self):
        leaves = (self.src_lo, self.dst_lo, self.bucket, self.group, self.first)
        aux = (self.num_chunks, self.num_groups, self.n_src_pad, self.n_dst_pad,
               self.num_edges, self.expansion, self.rem_src, self.rem_dst,
               self.num_edges_total)
        return leaves, aux

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, *aux)


def build_plan(
    src: np.ndarray,
    dst: np.ndarray,
    num_src: int,
    num_dst: int,
    dense_threshold: int = 48,
) -> LanePlan:
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    e = len(src)
    e_total = e
    n_src_pad = -(-num_src // SB) * SB
    num_groups = -(-num_dst // JG)
    n_dst_pad = num_groups * JG

    jg = dst // JG
    sb = src // SB
    order = np.lexsort((sb, jg))
    src_o, dst_o, jg_o, sb_o = src[order], dst[order], jg[order], sb[order]

    # hybrid split: (jg, sb) pairs with too few edges pad terribly (a
    # 3-edge tile still costs a 128-run); route them to the XLA row-gather
    # path instead and keep only dense pairs in the plan.
    pair_key = jg_o * (n_src_pad // SB + 1) + sb_o
    boundaries = np.concatenate([[0], np.where(np.diff(pair_key))[0] + 1, [e]])
    counts0 = np.diff(boundaries)
    dense_pair = counts0 >= dense_threshold
    edge_dense = np.repeat(dense_pair, counts0)
    rem_src = src_o[~edge_dense].copy()
    rem_dst = dst_o[~edge_dense].copy()
    src_o, dst_o, jg_o, sb_o = (
        src_o[edge_dense], dst_o[edge_dense], jg_o[edge_dense], sb_o[edge_dense]
    )
    e = len(src_o)
    boundaries = np.concatenate(
        [[0], np.where(np.diff(pair_key[edge_dense]))[0] + 1, [e]]
    ) if e else np.array([0, 0])
    counts = np.diff(boundaries)
    padded_counts = -(-counts // SB) * SB
    total_padded = int(padded_counts.sum())

    src_lo_flat = np.zeros(total_padded, np.int32)
    dst_lo_flat = np.full(total_padded, JG, np.int32)  # sentinel: never scatters
    run_bucket = np.empty(total_padded // SB, np.int32)
    run_group = np.empty(total_padded // SB, np.int32)
    pos = 0
    for i in range(len(counts)):
        b0, c, pc = boundaries[i], counts[i], padded_counts[i]
        src_lo_flat[pos : pos + c] = (src_o[b0 : b0 + c] % SB).astype(np.int32)
        dst_lo_flat[pos : pos + c] = (dst_o[b0 : b0 + c] % JG).astype(np.int32)
        r0 = pos // SB
        run_bucket[r0 : r0 + pc // SB] = sb_o[b0]
        run_group[r0 : r0 + pc // SB] = jg_o[b0]
        pos += pc

    # pack runs into chunks of RUNS_PER_CHUNK, never crossing a group
    chunks_src, chunks_dst, chunks_bucket, chunk_group, chunk_first = [], [], [], [], []
    r = 0
    n_runs = total_padded // SB
    while r < n_runs:
        g = run_group[r]
        r_end = r
        while r_end < n_runs and run_group[r_end] == g and r_end - r < RUNS_PER_CHUNK:
            r_end += 1
        k = r_end - r
        s = np.zeros((RUNS_PER_CHUNK, SB), np.int32)
        d = np.full((RUNS_PER_CHUNK, SB), JG, np.int32)
        b = np.zeros((8, 128), np.int32)  # (8,128) for SMEM block tiling rules
        s[:k] = src_lo_flat[r * SB : r_end * SB].reshape(k, SB)
        d[:k] = dst_lo_flat[r * SB : r_end * SB].reshape(k, SB)
        b[0, :k] = run_bucket[r:r_end]
        chunks_src.append(s)
        chunks_dst.append(d)
        chunks_bucket.append(b)
        chunk_first.append(1 if (not chunk_group or chunk_group[-1] != g) else 0)
        chunk_group.append(int(g))
        r = r_end

    # groups with zero edges still need a zeroing chunk
    seen = set(chunk_group)
    for g in range(num_groups):
        if g not in seen:
            chunks_src.append(np.zeros((RUNS_PER_CHUNK, SB), np.int32))
            chunks_dst.append(np.full((RUNS_PER_CHUNK, SB), JG, np.int32))
            chunks_bucket.append(np.zeros((8, 128), np.int32))
            chunk_first.append(1)
            chunk_group.append(g)

    return LanePlan(
        src_lo=jnp.asarray(np.stack(chunks_src)),
        dst_lo=jnp.asarray(np.stack(chunks_dst)),
        bucket=jnp.asarray(np.stack(chunks_bucket)),
        group=jnp.asarray(np.asarray(chunk_group, np.int32)),
        first=jnp.asarray(np.asarray(chunk_first, np.int32)),
        num_chunks=len(chunk_group),
        num_groups=num_groups,
        n_src_pad=n_src_pad,
        n_dst_pad=n_dst_pad,
        num_edges=e,
        expansion=total_padded / max(e, 1),
        rem_src=rem_src,
        rem_dst=rem_dst,
        num_edges_total=e_total,
    )


def _kernel(group_ref, first_ref, bucket_ref, srclo_ref, dstlo_ref, x_ref, o_ref):
    t = pl.program_id(0)

    @pl.when(first_ref[t] == 1)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    d_feat = x_ref.shape[0]

    def run_body(r, _):
        b = bucket_ref[0, 0, r]
        start = pl.multiple_of(b * SB, SB)
        xb = x_ref[:, pl.ds(start, SB)]  # (D, 128)
        slo = srclo_ref[0, r, :]  # (128,)
        if xb.dtype.itemsize == 2:
            # Mosaic's lane gather requires index bitwidth == data bitwidth
            # and take_along_axis always upcasts indices to i32 — so view
            # bf16 sublane PAIRS as f32, gather whole columns (a column is
            # one node's features, so intra-column bit packing is
            # invisible), and view back.
            xb32 = pltpu.bitcast(xb, jnp.float32)  # (D//2, 128)
            idx = jnp.broadcast_to(slo[None, :], (d_feat // 2, SB))
            g32 = jnp.take_along_axis(xb32, idx, axis=1)
            msg = pltpu.bitcast(g32, xb.dtype)  # (D, 128)
        else:
            idx = jnp.broadcast_to(slo[None, :], (d_feat, SB))
            msg = jnp.take_along_axis(xb, idx, axis=1)  # lane gather (D, 128)
        dlo = dstlo_ref[0, r, :]  # (128,) values in [0, JG]
        cols = jax.lax.broadcasted_iota(jnp.int32, (SB, JG), 1)
        oh = (dlo[:, None] == cols).astype(msg.dtype)  # (128, JG)
        o_ref[0] = o_ref[0] + jnp.dot(msg, oh, preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, RUNS_PER_CHUNK, run_body, 0)


def lane_spmm(
    plan: LanePlan,
    x: jnp.ndarray,  # (num_src, D) — feature-major transposition is internal
    *,
    in_degrees: Optional[jnp.ndarray] = None,  # for mean
    interpret: bool = False,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """copy_u SpMM via the lane plan; returns (n_dst_pad, D) f32 (sum
    reduce; pass in_degrees for mean).

    ``compute_dtype`` is the VMEM-resident feature dtype (bf16 default —
    f32 features at reddit scale alone exceed the 16MB VMEM; accumulation
    is always f32 on the MXU).
    """
    d = x.shape[1]
    if d > 32:
        raise ValueError(f"lane_spmm v1 supports D<=32, got {d}")
    d_k = d + (d % 2)  # even rows: bf16 gather views sublane pairs as f32
    xt = (
        jnp.zeros((d_k, plan.n_src_pad), compute_dtype)
        .at[:d, : x.shape[0]]
        .set(x.T.astype(compute_dtype))
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # group, first (small; SMEM-resident whole)
        grid=(plan.num_chunks,),
        in_specs=[
            # per-chunk run bucket ids stream through SMEM blocks (a fully
            # prefetched array would overflow the ~1MB SMEM budget)
            pl.BlockSpec((1, 8, 128), lambda t, g_, f_: (t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, RUNS_PER_CHUNK, SB), lambda t, g_, f_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RUNS_PER_CHUNK, SB), lambda t, g_, f_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x_t full
        ],
        out_specs=pl.BlockSpec(
            (1, d_k, JG), lambda t, g_, f_: (g_[t], 0, 0), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((plan.num_groups, d_k, JG), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(plan.group, plan.first, plan.bucket, plan.src_lo, plan.dst_lo, xt)
    out = out.transpose(0, 2, 1).reshape(plan.n_dst_pad, d_k)[:, :d]
    if in_degrees is not None:
        deg = jnp.maximum(in_degrees, 1).astype(out.dtype)
        out = out.at[: deg.shape[0]].set(out[: deg.shape[0]] / deg[:, None])
    return out
