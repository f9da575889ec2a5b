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
sparsity — the caller falls back to the XLA path when it is too high.
Locality-aware node orderings (hub extraction + multilevel partition
blocks, ``dgl_tpu.graph.reorder``) are what make tiles dense.

v2 capabilities:
* ``copy_u`` and ``u_mul_e`` (×sum/mean): optional per-edge weights given
  in plan layout (``plan_layout_edata`` permutes canonical edge data).
* arbitrary D via a feature-slab grid dimension (VMEM budget permitting);
  bf16 (default, lane-pair bitcast trick) or f32 compute.
* ``eid`` slot map: canonical edge id per plan slot, for permuting edge
  data and for the attention kernels built on this layout.
The transpose plan (built from the reverse edge list) serves backward.

v3: **multi-window runs.** Low-locality graphs (arxiv) put a third of
their edges in (group, 128-bucket) pairs of <8 edges — unservable at
128-slot run granularity. A plan built with ``window = K·128`` groups
edges by (dst group, K·128-node src window) instead: tile density rises
(measured arxiv: 57% sparse remainder at W=128 → 0% at W=1024, expansion
2.36), at the cost of K sub-bucket lane gathers + a K-way select per run
(the one-hot MXU scatter — the run's FLOP cost — does not grow).
``attach_lane_plans`` picks (window, dense_threshold) per graph with a
counting cost model.

v4: **wide windows + tier-2 plans.** ``window`` may now go up to 8192 (the
meta word's dst offset shifts above the src bits: ``src_lo | dst_lo <<
max(10, log2(window))`` — 24 bits worst case). Wide windows trade K =
window/128 sub-bucket gathers per run for near-1.0 expansion on edge sets
that tile hopelessly at 128 (measured reddit: the 19.7% tier-1 remainder is
100% served at window 8192 with expansion 1.16). ``attach_lane_plans``
builds a tier-2 wide-window plan over the tier-1 remainder, which deletes
the XLA row-gather remainder (~19 ns/row, 2 gathers/pass) that dominated
hybrid passes. Wide-window kernels roll the run loop (unrolled inner
blocks) — at K≥16 the run body is work-bound, not scalar-bound.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["LanePlan", "build_plan", "lane_spmm", "plan_layout_edata",
           "slot_ns", "lane_profitable"]

SB = 128  # src bucket width (lane-gather window)
JG = 1024  # dst nodes per output group
RUNS_PER_CHUNK = 256  # runs (of 128 edges) per grid step
# VMEM budget for the feature-major operand (per pipeline buffer ×2 when
# the slab grid is active); v5e has ~16MB more-or-less usable
_VMEM_X_BUDGET = 11 * (1 << 20)

# -- per-slot cost model ------------------------------------------------------
# slot cost = SLOT_NS_BASE (meta streaming + control) + SLOT_NS_PER8 per 8
# f32-equivalent feature rows (lane gather ∝ D on the VPU, one-hot scatter
# ∝ D·JG on the MXU — the MXU term dominates growth). Anchored at the
# round-1 v5e measurement of 2.7 ns/slot at D=16; re-fit with
# tools/calibrate_lane.py when hardware numbers move. REM_NS is the XLA
# hybrid path's per-edge cost (row-gather wall ~87M rows/s + segment
# reduce), near-independent of D up to 128 f32 (per-row latency bound).
SLOT_NS_BASE = 1.8
SLOT_NS_PER8 = 0.45
REM_NS = 10.0


def _meta_shift(window: int) -> int:
    """Bit position of the dst offset in the packed meta word (src bits
    below it). 10 for windows ≤ 1024 (the historical packing), log2(window)
    above."""
    return max(10, (window - 1).bit_length())


def _run_unroll(window: int) -> int:
    """Runs per unrolled block. Narrow windows fully unroll (the rolled
    loop is scalar-bound: ~233ns/iter vs ~170ns of work — measured v5e);
    wide windows are work-bound (K sub-gathers/run), so a rolled outer loop
    over unrolled blocks keeps code size bounded."""
    k_sub = window // SB
    if k_sub <= 8:
        return RUNS_PER_CHUNK
    return max(4, 64 // k_sub)


def slot_ns(d: int, window: int = SB) -> float:
    """Modeled lane-kernel nanoseconds per plan slot at feature width d."""
    sub = 1.0 + 0.18 * (window // SB - 1)  # K-way sub-gather overhead
    return SLOT_NS_BASE + SLOT_NS_PER8 * (-(-int(d) // 8)) * sub


def lane_profitable(plan: "LanePlan", d: int, itemsize: int = 2) -> bool:
    """True when running this plan's served edges through the lane kernel
    is modeled cheaper than the XLA row-gather path AND the feature-major
    operand fits the VMEM slab budget. Replaces the old hard D≤32 cap:
    break-even width scales with the plan's padding expansion (e.g.
    expansion 1.22 → profitable up to D≈112 f32-equivalent).

    ``DGL_TPU_REM_NS`` overrides the modeled row-path cost: the 10 ns
    default is the conservative single-gather figure, but a full copy_u
    SpMM pass pays gather + reduce (~2 row ops) — wide-feature break-evens
    (arxiv SAGE at D=256) flip on this constant. Calibrate on-chip
    (tools/r4_experiments.sh B) before changing the default."""
    if _choose_slab(int(d), plan.n_src_pad, itemsize) is None:
        return False
    rem = float(os.environ.get("DGL_TPU_REM_NS", REM_NS))
    return plan.expansion * slot_ns(d, plan.window) < rem


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class LanePlan:
    """Host-precomputed execution plan for one graph direction.

    ``meta`` packs both per-slot offsets into one word —
    ``src_lo | dst_lo << 10`` (src offset within the gather window: up to
    10 bits; dst offset within the JG group incl. the JG sentinel: 11
    bits). Kernel cost is dominated by streaming the per-slot metadata
    from HBM, so packing both offsets into 4 bytes/slot is a direct
    speedup over separate arrays.
    """

    meta: jnp.ndarray  # (chunks, R, 128) int32 — src_lo | dst_lo << 10
    bucket: jnp.ndarray  # (chunks, 8, 128) int32 — src window id per run (row-major)
    group: jnp.ndarray  # (chunks,) int32 — dst group id per chunk
    first: jnp.ndarray  # (chunks,) int32 — 1 if first chunk of its group
    eid: jnp.ndarray  # (chunks, R, 128) int32 — canonical edge id (-1 = pad)
    num_chunks: int
    num_groups: int
    n_src_pad: int  # multiple of SB
    n_dst_pad: int  # num_groups * JG
    num_edges: int  # edges covered by the plan (dense tiles)
    expansion: float
    # host-side remainder (sparse tiles) served by the XLA gather path
    rem_src: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(0, np.int64))
    rem_dst: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(0, np.int64))
    rem_eid: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(0, np.int64))
    num_edges_total: int = 0
    window: int = SB  # gather window width (K = window // 128 sub-buckets)

    def tree_flatten(self):
        leaves = (self.meta, self.bucket, self.group, self.first, self.eid)
        aux = (self.num_chunks, self.num_groups, self.n_src_pad, self.n_dst_pad,
               self.num_edges, self.expansion, self.rem_src, self.rem_dst,
               self.rem_eid, self.num_edges_total, self.window)
        return leaves, aux

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, *aux)


def build_plan(
    src: np.ndarray,
    dst: np.ndarray,
    num_src: int,
    num_dst: int,
    dense_threshold: int = 32,
    eid: Optional[np.ndarray] = None,
    window: int = SB,
) -> LanePlan:
    """Vectorized host-side planner; ``eid`` maps input edge order to the
    caller's canonical ids (default: positional). ``window`` is the gather
    window width (a power-of-two multiple of 128, ≤ 1024): wider windows
    merge sparse (group, bucket) pairs into servable runs at the cost of
    ``window/128`` sub-gathers per run in the kernel."""
    if window % SB or window > 8192 or window & (window - 1):
        raise ValueError(f"window must be a power-of-two multiple of {SB} "
                         f"≤ 8192, got {window}")
    shift = _meta_shift(window)
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    e_total = len(src)
    eid_in = np.arange(e_total, dtype=np.int64) if eid is None else np.asarray(eid, np.int64)
    n_src_pad = -(-num_src // window) * window
    num_groups = max(-(-num_dst // JG), 1)
    n_dst_pad = num_groups * JG

    jg = dst // JG
    sb = src // window
    # group-sort edges by (jg, sb): O(E) native counting sort over the pair
    # key (the key space is num_groups × num_buckets ≈ small)
    n_buckets = n_src_pad // window + 1
    pair_key_all = jg * n_buckets + sb
    from ..csrc.native import build_csr

    _, order, _ = build_csr(
        pair_key_all, np.arange(e_total, dtype=np.int64), int(num_groups * n_buckets)
    )
    src_o, dst_o, jg_o, sb_o = src[order], dst[order], jg[order], sb[order]
    eid_o = eid_in[order]

    # hybrid split: (jg, sb) pairs with too few edges pad terribly (a
    # 3-edge tile still costs a 128-run); route them to the XLA row-gather
    # path instead and keep only dense pairs in the plan.
    pair_key = jg_o * n_buckets + sb_o
    boundaries = np.concatenate([[0], np.where(np.diff(pair_key))[0] + 1, [e_total]])
    counts0 = np.diff(boundaries)
    dense_pair = counts0 >= dense_threshold
    edge_dense = np.repeat(dense_pair, counts0)
    rem_src = src_o[~edge_dense].copy()
    rem_dst = dst_o[~edge_dense].copy()
    rem_eid = eid_o[~edge_dense].copy()
    src_o, dst_o, jg_o, sb_o, eid_o = (
        src_o[edge_dense], dst_o[edge_dense], jg_o[edge_dense],
        sb_o[edge_dense], eid_o[edge_dense],
    )
    e = len(src_o)

    counts = counts0[dense_pair]
    n_pairs = len(counts)
    if n_pairs == 0:
        counts = np.zeros(0, np.int64)
    padded_counts = -(-counts // SB) * SB
    pair_runs = padded_counts // SB
    total_padded = int(padded_counts.sum())
    n_runs = total_padded // SB

    # flat padded slot arrays (vectorized scatter of real edges)
    src_lo_flat = np.zeros(total_padded, np.int32)
    dst_lo_flat = np.full(total_padded, JG, np.int32)  # sentinel: never scatters
    eid_flat = np.full(total_padded, -1, np.int64)
    if e:
        pad_starts = np.concatenate([[0], np.cumsum(padded_counts)])[:-1]
        starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
        within = np.arange(e) - np.repeat(starts, counts)
        pos = np.repeat(pad_starts, counts) + within
        src_lo_flat[pos] = (src_o % window).astype(np.int32)
        dst_lo_flat[pos] = (dst_o % JG).astype(np.int32)
        eid_flat[pos] = eid_o
        # per-run bucket / group (runs of a pair share its bucket and group)
        run_bucket = np.repeat(sb_o[np.concatenate([[0], np.cumsum(counts)])[:-1]],
                               pair_runs).astype(np.int32)
        run_group = np.repeat(jg_o[np.concatenate([[0], np.cumsum(counts)])[:-1]],
                              pair_runs).astype(np.int64)
    else:
        run_bucket = np.zeros(0, np.int32)
        run_group = np.zeros(0, np.int64)

    # pack runs into chunks of RUNS_PER_CHUNK, never crossing a group
    # (runs arrive group-sorted from the lexsort)
    R = RUNS_PER_CHUNK
    runs_per_group = np.bincount(run_group, minlength=num_groups) if n_runs else np.zeros(num_groups, np.int64)
    chunks_per_group = np.maximum(-(-runs_per_group // R), 1)  # empty groups: 1 zeroing chunk
    chunk_goffs = np.concatenate([[0], np.cumsum(chunks_per_group)])
    num_chunks = int(chunk_goffs[-1])

    chunk_group = np.repeat(np.arange(num_groups, dtype=np.int32), chunks_per_group)
    chunk_first = np.zeros(num_chunks, np.int32)
    chunk_first[chunk_goffs[:-1]] = 1

    m_arr = np.full((num_chunks, R, SB), JG << shift, np.int32)
    e_arr = np.full((num_chunks, R, SB), -1, np.int64)
    b_arr = np.zeros((num_chunks, 8, 128), np.int32)
    if n_runs:
        grp_run_start = np.concatenate([[0], np.cumsum(runs_per_group)])[:-1]
        within_grp = np.arange(n_runs) - np.repeat(grp_run_start, runs_per_group)
        run_chunk = np.repeat(chunk_goffs[:-1], runs_per_group) + within_grp // R
        run_slot = within_grp % R
        m_arr[run_chunk, run_slot] = (
            src_lo_flat | (dst_lo_flat.astype(np.int32) << shift)
        ).reshape(n_runs, SB)
        e_arr[run_chunk, run_slot] = eid_flat.reshape(n_runs, SB)
        b_arr[run_chunk, run_slot // 128, run_slot % 128] = run_bucket

    return LanePlan(
        meta=jnp.asarray(m_arr),
        bucket=jnp.asarray(b_arr),
        group=jnp.asarray(chunk_group),
        first=jnp.asarray(chunk_first),
        eid=jnp.asarray(np.where(e_arr < 0, np.int64(2**31 - 1), e_arr).astype(np.int32)),
        num_chunks=num_chunks,
        num_groups=num_groups,
        n_src_pad=n_src_pad,
        n_dst_pad=n_dst_pad,
        num_edges=e,
        expansion=total_padded / max(e, 1),
        rem_src=rem_src,
        rem_dst=rem_dst,
        rem_eid=rem_eid,
        num_edges_total=e_total,
        window=window,
    )


def plan_layout_edata(plan: LanePlan, edata: np.ndarray, fill=0.0) -> np.ndarray:
    """Permute canonical-order edge values into plan layout
    (chunks, R, 128); padded slots get ``fill``. Host-side (static edge
    data, e.g. RGCN relation weights); per-step tensors should be produced
    in plan layout directly (attention kernels) or permuted on device."""
    eid = np.asarray(plan.eid)
    ok = eid < len(edata)
    out = np.full(eid.shape + np.asarray(edata).shape[1:], fill,
                  dtype=np.asarray(edata).dtype)
    out[ok] = np.asarray(edata)[eid[ok]]
    return out


def _choose_slab(d_k: int, n_src_pad: int, itemsize: int) -> Optional[int]:
    """Feature rows per grid slab such that the x operand fits VMEM
    (×2 pipeline buffers when slabbed). None → does not fit at all."""
    if d_k * n_src_pad * itemsize <= _VMEM_X_BUDGET:
        return d_k  # single slab, unblocked operand (1 buffer)
    step = 16 if itemsize == 2 else 8
    slab = (_VMEM_X_BUDGET // (2 * n_src_pad * itemsize)) // step * step
    if slab < step:
        return None
    return min(slab, d_k)


def _window_gather(load, b, slo, d_feat, window: int, bf16_pack: bool):
    """Gather one run's 128 source columns from its ``window``-wide gather
    window: K = window/128 sub-bucket lane gathers + a K-way select (the
    one-hot MXU scatter that follows dominates run cost, so K>1 trades
    cheap VPU work for plan density). ``load(col_offset)`` returns the
    (d_feat, 128) block at that absolute column offset."""
    k_sub = window // SB
    lo = jnp.bitwise_and(slo, 127)
    start0 = pl.multiple_of(b * window, window)
    msg = None
    for k in range(k_sub):
        xb = load(start0 + k * SB)  # (slab, 128)
        if bf16_pack:
            # Mosaic's lane gather requires index bitwidth == data
            # bitwidth and take_along_axis upcasts indices to i32 — so
            # view bf16 sublane PAIRS as f32, gather whole columns (a
            # column is one node's features, so intra-column bit packing
            # is invisible), and view back.
            xb32 = pltpu.bitcast(xb, jnp.float32)  # (slab//2, 128)
            idx = jnp.broadcast_to(lo[None, :], (d_feat // 2, SB))
            g32 = jnp.take_along_axis(xb32, idx, axis=1)
            gk = pltpu.bitcast(g32, xb.dtype)  # (slab, 128)
        else:
            idx = jnp.broadcast_to(lo[None, :], (d_feat, SB))
            gk = jnp.take_along_axis(xb, idx, axis=1)  # lane gather
        if k_sub == 1:
            return gk
        sel = jax.lax.shift_right_logical(slo, 7) == k  # (128,)
        gk = jnp.where(sel[None, :], gk, jnp.zeros_like(gk))
        msg = gk if msg is None else msg + gk
    return msg


def _make_kernel(has_w: bool, bf16_pack: bool, window: int):
    shift = _meta_shift(window)
    unroll = _run_unroll(window)

    def kernel(*refs):
        if has_w:
            group_ref, first_ref, bucket_ref, meta_ref, w_ref, x_ref, o_ref = refs
        else:
            group_ref, first_ref, bucket_ref, meta_ref, x_ref, o_ref = refs
        t = pl.program_id(1)

        @pl.when(first_ref[t] == 1)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        d_feat = x_ref.shape[0]

        def run_body(r):
            b = bucket_ref[0, r // 128, r % 128]
            meta = meta_ref[0, r, :]  # (128,) packed src_lo | dst_lo<<shift
            slo = jnp.bitwise_and(meta, window - 1)
            msg = _window_gather(lambda off: x_ref[:, pl.ds(off, SB)],
                                 b, slo, d_feat, window, bf16_pack)
            if has_w:
                msg = msg * w_ref[0, r, :][None, :].astype(msg.dtype)
            dlo = jax.lax.shift_right_logical(meta, shift)  # (128,) in [0, JG]
            cols = jax.lax.broadcasted_iota(jnp.int32, (SB, JG), 1)
            oh = (dlo[:, None] == cols).astype(msg.dtype)  # (128, JG)
            o_ref[0] = o_ref[0] + jnp.dot(msg, oh, preferred_element_type=jnp.float32)

        # Narrow windows: full unroll — the rolled loop is SCALAR-bound
        # (~233ns/iteration of loop control + SMEM address math, measured on
        # v5e, vs ~170ns of actual VPU/MXU work); unrolling cut the
        # reddit-scale kernel from 54.8ms to 32.9ms. Mosaic only supports
        # unroll == num_steps, so wide windows (work-bound run bodies, K
        # sub-gathers each) instead roll an outer loop over unrolled blocks
        # to bound code size.
        if unroll == RUNS_PER_CHUNK:
            jax.lax.fori_loop(0, RUNS_PER_CHUNK,
                              lambda r, c: (run_body(r), 0)[1], 0,
                              unroll=RUNS_PER_CHUNK)
        else:
            def block_body(q, c):
                for j in range(unroll):
                    run_body(q * unroll + j)
                return c

            jax.lax.fori_loop(0, RUNS_PER_CHUNK // unroll, block_body, 0)

    return kernel


def lane_spmm(
    plan: LanePlan,
    x: jnp.ndarray,  # (num_src, D) — feature-major transposition is internal
    w: Optional[jnp.ndarray] = None,  # (chunks, R, 128) plan-layout edge weights
    *,
    in_degrees: Optional[jnp.ndarray] = None,  # for mean
    interpret: bool = False,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """copy_u (or u_mul_e with ``w``) SpMM via the lane plan; returns
    (n_dst_pad, D) f32 (sum reduce; pass in_degrees for mean).

    ``compute_dtype`` is the VMEM-resident feature dtype (bf16 default —
    halves VMEM and enables the lane-pair gather; accumulation is always
    f32 on the MXU). Wide features run as a feature-slab grid dimension.
    """
    d = x.shape[1]
    itemsize = jnp.dtype(compute_dtype).itemsize
    if itemsize == 2:
        d_k = -(-d // 16) * 16 if d > 16 else d + (d % 2)
    else:
        d_k = -(-d // 8) * 8 if d > 8 else d
    slab = _choose_slab(d_k, plan.n_src_pad, itemsize)
    if slab is None:
        raise ValueError(
            f"lane_spmm: feature-major operand (D={d_k}, N={plan.n_src_pad}, "
            f"{itemsize}B) exceeds the VMEM budget even at minimum slab"
        )
    d_k = -(-d_k // slab) * slab
    n_slabs = d_k // slab
    xt = (
        jnp.zeros((d_k, plan.n_src_pad), compute_dtype)
        .at[:d, : x.shape[0]]
        .set(x.T.astype(compute_dtype))
    )

    bf16_pack = itemsize == 2
    has_w = w is not None
    in_specs = [
        # per-chunk run bucket ids stream through SMEM blocks (a fully
        # prefetched array would overflow the ~1MB SMEM budget)
        pl.BlockSpec((1, 8, 128), lambda s, t, g_, f_: (t, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, RUNS_PER_CHUNK, SB), lambda s, t, g_, f_: (t, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [plan.bucket, plan.meta]
    if has_w:
        in_specs.append(
            pl.BlockSpec((1, RUNS_PER_CHUNK, SB), lambda s, t, g_, f_: (t, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        operands.append(w)
    if n_slabs == 1:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # x_t whole
    else:
        in_specs.append(
            pl.BlockSpec((slab, plan.n_src_pad), lambda s, t, g_, f_: (s, 0),
                         memory_space=pltpu.VMEM)
        )
    operands.append(xt)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # group, first (small; SMEM-resident whole)
        grid=(n_slabs, plan.num_chunks),  # slab-major: x slab fetched once
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, slab, JG), lambda s, t, g_, f_: (g_[t], s, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        _make_kernel(has_w, bf16_pack, plan.window),
        out_shape=jax.ShapeDtypeStruct((plan.num_groups, d_k, JG), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(plan.group, plan.first, *operands)
    out = out.transpose(0, 2, 1).reshape(plan.n_dst_pad, d_k)[:, :d]
    if in_degrees is not None:
        deg = jnp.maximum(in_degrees, 1).astype(out.dtype)
        out = out.at[: deg.shape[0]].set(out[: deg.shape[0]] / deg[:, None])
    return out
