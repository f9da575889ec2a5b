"""Fused GAT attention over the lane-plan layout.

The reference's GAT stack is three edge-wise kernel passes per layer —
SDDMM logits, edge-softmax, weighted SpMM (``main_pyg_arxiv_gat.py:98-111``,
DGL ``edge_softmax``) — each of which costs an E-length row gather/scatter
on TPU (~87M rows/s, the per-row wall). This module fuses the WHOLE
attention pipeline (logit, softmax, dropout, weighted aggregation, and the
full backward) into three lane-plan passes that never materialize an
E-length tensor:

* **forward** (1 pass over the forward plan): per-slot
  ``p = exp(leaky_relu(el[src] + er[dst]) - U[dst])`` and one one-hot MXU
  matmul accumulating ``[Σ m·p·v ; Σ p ; Σ m·p·slope·v ; Σ p·slope]`` —
  softmax numerator/denominator PLUS the two g-independent backward
  aggregations (``w1``/``w1s`` below, recovered by an ``1/s`` epilogue).
  The pass is gather-bound, so the extra accumulator rows ride the same
  slot gather for ~free and eliminate a whole backward pass.
* **backward** (1 reverse-plan pass) using three identities that collapse
  every per-edge quantity to weighted aggregations + N-wide math:
  - softmax max-shift: ``U[d] = leaky_relu(max(el) + er[d])`` is a valid
    per-dst upper bound because leaky_relu is monotone; softmax is
    invariant to the shift, and clamping the exponent at 0 (exact for real
    edges, which satisfy ``z ≤ U``) keeps padded slots finite.
  - Jacobian correction: ``C[d] = Σ_e α_e m_e (v[s]·g[d]) = g[d]·out[d]``
    — no edge pass needed.
  - ``grad_er[d] = g[d]·w1[d] − C[d]·w1s[d]`` with
    ``w1 = Σ α m s v``, ``w1s = Σ α s`` (computed IN the forward pass —
    both are ``1/s`` times forward-plan aggregations of g-independent
    per-slot quantities), and
    ``grad_el[s] = v[s]·w2[s] − w3[s]``, ``grad_v[s] = Σ m α g[d]`` with
    ``w2 = Σ m α s g``, ``w3 = Σ α s C[d]`` (reverse-plan aggregation),
    where ``s`` is the leaky-relu slope per edge.
* **attention dropout** is a stateless per-edge hash of the canonical edge
  id (murmur3 finalizer) — both plan layouts derive the identical mask
  from their ``eid`` slot maps, so no E-length mask tensor or cross-layout
  permutation exists.

Heads run as a grid dimension (per-head feature slab resident in VMEM);
requires plans with zero sparse-tile remainder (``dense_threshold=1``).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lane_spmm import (JG, RUNS_PER_CHUNK, SB, LanePlan, _meta_shift,
                        _run_unroll, _window_gather)

__all__ = ["lane_gat_agg", "lane_attn_fits"]


def _d_pad(d: int, itemsize: int) -> int:
    if itemsize == 2:
        return -(-d // 16) * 16 if d > 16 else d + (d % 2)
    return -(-d // 8) * 8 if d > 8 else d


_VMEM_ATTN_BUDGET = 24 * (1 << 20)
# the attention passes keep ONE whole feature slab resident (no slab
# double-buffering like lane_spmm), so they can afford a bigger budget than
# lane_spmm's default; the pallas_call raises Mosaic's per-kernel VMEM limit
# accordingly (v5e has 128 MiB)
_VMEM_LIMIT = 100 * (1 << 20)


def lane_attn_fits(plan: LanePlan, rplan: LanePlan, dh: int, compute_dtype,
                   plan2: LanePlan = None, rplan2: LanePlan = None) -> bool:
    """True when the fused path applies: the per-head feature slab fits the
    VMEM budget for all passes (tier-2 plans pad to their own wider window;
    sparse-tile remainders are fine — the hybrid path serves them through
    XLA segment ops under the same softmax normalization)."""
    itemsize = jnp.dtype(compute_dtype).itemsize
    dk = _d_pad(dh, itemsize)
    return all(
        dk * p.n_src_pad * itemsize <= _VMEM_ATTN_BUDGET
        for p in (plan, rplan, plan2, rplan2) if p is not None
    )


def _hash_keep(eid_i32, seed_i32, keep: float):
    """Stateless per-edge dropout: murmur3 fmix32 of (eid ^ seed) → keep
    mask scaled by 1/keep. Reproduced by tests in numpy."""
    x = (eid_i32 ^ seed_i32).astype(jnp.uint32)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    thresh = jnp.uint32(min(int(keep * float(1 << 24)), (1 << 24)))
    return jnp.where((x & jnp.uint32(0xFFFFFF)) < thresh,
                     jnp.float32(1.0 / keep), jnp.float32(0.0))


def _make_kernel(pass_kind: str, nb: int, ng: int, dk: int, rows_pad: int,
                 negative_slope: float, keep: float, bf16_pack: bool,
                 window: int):
    has_drop = keep < 1.0
    shift = _meta_shift(window)
    unroll = _run_unroll(window)

    def kernel(*refs):
        if has_drop:
            (group_ref, first_ref, seed_ref, bucket_ref, meta_ref, eid_ref,
             bs_ref, gs_ref, f_ref, o_ref) = refs
        else:
            (group_ref, first_ref, seed_ref, bucket_ref, meta_ref,
             bs_ref, gs_ref, f_ref, o_ref) = refs
        t = pl.program_id(1)

        @pl.when(first_ref[t] == 1)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        def run_body(r):
            b = bucket_ref[0, r // 128, r % 128]
            meta = meta_ref[0, r, :]  # packed src_lo | dst_lo<<shift
            slo = jnp.bitwise_and(meta, window - 1)
            msg = _window_gather(lambda off: f_ref[0, :, pl.ds(off, SB)],
                                 b, slo, dk, window, bf16_pack)
            bss = _window_gather(lambda off: bs_ref[0, :, pl.ds(off, SB)],
                                 b, slo, nb, window, False)
            dlo = jax.lax.shift_right_logical(meta, shift)
            cols = jax.lax.broadcasted_iota(jnp.int32, (SB, JG), 1)
            ohb = dlo[:, None] == cols  # (128, JG); padded slots: all-false row
            # group-side values per slot: one small MXU matmul reusing the
            # one-hot (gs stored group-transposed (JG, ng))
            gss = jnp.dot(ohb.astype(jnp.float32), gs_ref[0, :, :],
                          preferred_element_type=jnp.float32)  # (128, ng)
            raw = bss[0] + gss[:, 0]
            z = jnp.where(raw > 0, raw, negative_slope * raw)
            if has_drop:
                m = _hash_keep(eid_ref[0, r, :], seed_ref[0], keep)
            else:
                m = None
            if pass_kind == "fwd":
                # exponent clamp: exact for real edges (z <= U by the bound),
                # keeps garbage-gathered padded slots finite (NaN-safe 0*inf)
                p = jnp.exp(jnp.minimum(z - gss[:, 1], 0.0))
                w_main = p if m is None else p * m
                w_extra = p
                slope = jnp.where(raw > 0, 1.0, negative_slope)
                w_1 = w_main * slope   # Σ m·p·slope·v → w1 after 1/s
                w_1s = p * slope       # Σ p·slope     → w1s after 1/s
            else:  # b2: bs = [a_dst, U, invS, C], gs = [a_src]
                p = jnp.exp(jnp.minimum(z - bss[1], 0.0))
                alpha = p * bss[2]
                slope = jnp.where(raw > 0, 1.0, negative_slope)
                w_v = alpha if m is None else alpha * m
                w_2 = w_v * slope
                w_extra = alpha * slope * bss[3]
            cd = msg.dtype
            if pass_kind == "b2":
                aug = jnp.concatenate(
                    [
                        msg * w_v.astype(cd)[None, :],
                        msg * w_2.astype(cd)[None, :],
                        w_extra.astype(cd)[None, :],
                        jnp.zeros((rows_pad - 2 * dk - 1, SB), cd),
                    ],
                    axis=0,
                )
            else:
                aug = jnp.concatenate(
                    [
                        msg * w_main.astype(cd)[None, :],
                        w_extra.astype(cd)[None, :],
                        msg * w_1.astype(cd)[None, :],
                        w_1s.astype(cd)[None, :],
                        jnp.zeros((rows_pad - 2 * dk - 2, SB), cd),
                    ],
                    axis=0,
                )
            o_ref[0, 0] = o_ref[0, 0] + jnp.dot(
                aug, ohb.astype(cd), preferred_element_type=jnp.float32
            )

        # loop structure mirrors lane_spmm._make_kernel: full unroll for
        # narrow (scalar-bound) windows, rolled outer / unrolled blocks for
        # wide (work-bound) ones
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


def _feature_major(x, h: int, dk: int, n_pad: int, dtype):
    """(N, H, D) → (H, dk, n_pad) padded, compute dtype."""
    n, _, d = x.shape
    return (
        jnp.zeros((h, dk, n_pad), dtype)
        .at[:, :d, :n]
        .set(jnp.transpose(x, (1, 2, 0)).astype(dtype))
    )


def _node_stack(arrs, n_pad: int):
    """list of (N, H) f32 → (H, nb, n_pad) with nb padded to the f32
    sublane count (8) — Mosaic's lane gather needs sublane-aligned
    operands."""
    h = arrs[0].shape[1]
    out = jnp.zeros((h, 8, n_pad), jnp.float32)
    for i, a in enumerate(arrs):
        out = out.at[:, i, : a.shape[0]].set(a.T.astype(jnp.float32))
    return out


def _group_stack(arrs, n_pad: int):
    """list of (N, H) f32 → (H, n_pad, len(arrs)) (group-transposed for the
    in-kernel one-hot matmul)."""
    h = arrs[0].shape[1]
    out = jnp.zeros((h, n_pad, len(arrs)), jnp.float32)
    for i, a in enumerate(arrs):
        out = out.at[:, : a.shape[0], i].set(a.T.astype(jnp.float32))
    return out


def _attn_pass(pass_kind: str, plan: LanePlan, f, bs, gs, seed, *, dk: int,
               negative_slope: float, keep: float, interpret: bool):
    h = f.shape[0]
    nb, ng = bs.shape[1], gs.shape[2]
    n_rows = 2 * dk + 2 if pass_kind == "fwd" else 2 * dk + 1
    rows_pad = -(-n_rows // 8) * 8
    bf16_pack = jnp.dtype(f.dtype).itemsize == 2

    grid = (h, plan.num_chunks)
    in_specs = [
        pl.BlockSpec((1, 8, 128), lambda hh, t, g_, f_, s_: (t, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, RUNS_PER_CHUNK, SB), lambda hh, t, g_, f_, s_: (t, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [plan.bucket, plan.meta]
    if keep < 1.0:
        # the eid slot map streams only when dropout is active — it is a
        # third of the per-slot metadata traffic
        in_specs.append(
            pl.BlockSpec((1, RUNS_PER_CHUNK, SB), lambda hh, t, g_, f_, s_: (t, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        operands.append(plan.eid)
    in_specs += [
        pl.BlockSpec((1, nb, plan.n_src_pad), lambda hh, t, g_, f_, s_: (hh, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, JG, ng), lambda hh, t, g_, f_, s_: (hh, g_[t], 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, dk, plan.n_src_pad), lambda hh, t, g_, f_, s_: (hh, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # group, first, seed
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, rows_pad, JG), lambda hh, t, g_, f_, s_: (hh, g_[t], 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        _make_kernel(pass_kind, nb, ng, dk, rows_pad, negative_slope, keep,
                     bf16_pack, plan.window),
        out_shape=jax.ShapeDtypeStruct(
            (h, plan.num_groups, rows_pad, JG), jnp.float32
        ),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(plan.group, plan.first, seed, *operands, bs, gs, f)
    # (H, G, rows, JG) → (G*JG, H, rows)
    return jnp.transpose(out, (1, 3, 0, 2)).reshape(
        plan.n_dst_pad, h, rows_pad
    )


def _upper_bound(a_src, a_dst, negative_slope: float):
    """Per-dst softmax shift: valid upper bound on every edge logit because
    leaky_relu is monotone. Softmax output is invariant to it, so it is a
    stop-gradient constant."""
    max_a = jax.lax.stop_gradient(jnp.max(a_src, axis=0))
    raw = a_dst + max_a[None, :]
    return jnp.where(raw > 0, raw, negative_slope * raw)


def _rem_edge_common(rem, reid, side_src, side_dst, seed, keep: float,
                     ns: float):
    """Shared remainder-edge quantities. ``side_src``/``side_dst`` are
    pre-concatenated node stacks gathered with ONE row gather per side (the
    per-row wall makes gather count, not width, the cost)."""
    from ..ops.gather import gather_dst, gather_src

    se = gather_src(rem, side_src)
    de = gather_dst(rem, side_dst)
    if keep < 1.0:
        m = _hash_keep(reid[: se.shape[0]], seed[0], keep)
    else:
        m = None
    return se, de, m


def _rem_fwd_terms(rem, reid, v, a_src, a_dst, u, seed, keep, ns):
    """Remainder [Σ m·p·v ; Σ p ; Σ m·p·slope·v ; Σ p·slope] per dst — same
    math as the fwd lane pass (incl. the g-independent w1/w1s terms)."""
    from ..ops.spmm import gspmm

    h, dh = v.shape[1], v.shape[2]
    sstack = jnp.concatenate(
        [v.astype(jnp.float32).reshape(-1, h * dh), a_src], axis=1)
    dstack = jnp.stack([a_dst, u], axis=-1).reshape(-1, h * 2)
    se, de, m = _rem_edge_common(rem, reid, sstack, dstack, seed, keep, ns)
    ve = se[:, : h * dh].reshape(-1, h, dh)
    el = se[:, h * dh:]
    de = de.reshape(-1, h, 2)
    raw = el + de[..., 0]
    z = jnp.where(raw > 0, raw, ns * raw)
    p = jnp.exp(jnp.minimum(z - de[..., 1], 0.0))
    pm = p if m is None else p * m[:, None]
    slope = jnp.where(raw > 0, 1.0, ns)
    pms = pm * slope
    packed = jnp.concatenate(
        [pm[..., None] * ve, p[..., None], pms[..., None] * ve,
         (p * slope)[..., None]], axis=2)
    agg = gspmm(rem, "copy_e", "sum", e=packed)  # one segment reduce
    return (agg[..., :dh], agg[..., dh],
            agg[..., dh + 1 : 2 * dh + 1], agg[..., 2 * dh + 1])


def _rem_b2_terms(remr, reid, g_out, a_src, a_dst, u, inv_s, c, seed, keep, ns):
    """Remainder [Σ m·α·g ; Σ m·α·slope·g ; Σ α·slope·C] per ORIGINAL src —
    ``remr`` is the reverse-orientation remainder graph (b2 lane pass)."""
    from ..ops.spmm import gspmm

    h, dh = g_out.shape[1], g_out.shape[2]
    # src side of remr = original dst d
    sstack = jnp.concatenate(
        [g_out.reshape(-1, h * dh),
         jnp.stack([a_dst, u, inv_s, c], axis=-1).reshape(-1, h * 4)], axis=1)
    se, el, m = _rem_edge_common(remr, reid, sstack, a_src, seed, keep, ns)
    ge = se[:, : h * dh].reshape(-1, h, dh)
    dd = se[:, h * dh:].reshape(-1, h, 4)
    raw = el + dd[..., 0]
    z = jnp.where(raw > 0, raw, ns * raw)
    alpha = jnp.exp(jnp.minimum(z - dd[..., 1], 0.0)) * dd[..., 2]
    slope = jnp.where(raw > 0, 1.0, ns)
    wv = alpha if m is None else alpha * m[:, None]
    w2e = wv * slope
    w3e = alpha * slope * dd[..., 3]
    packed = jnp.concatenate(
        [wv[..., None] * ge, w2e[..., None] * ge, w3e[..., None]], axis=2)
    agg = gspmm(remr, "copy_e", "sum", e=packed)
    return agg[..., :dh], agg[..., dh : 2 * dh], agg[..., 2 * dh]


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5))
def _lane_gat(num_dst, negative_slope, keep, cd, interpret, num_src,
              fplan, rplan, fplan2, rplan2, rem_fwd, rem_feid, rem_rev,
              rem_reid, v, a_src, a_dst, seed):
    out, _ = _lane_gat_fwd(num_dst, negative_slope, keep, cd, interpret,
                           num_src, fplan, rplan, fplan2, rplan2, rem_fwd,
                           rem_feid, rem_rev, rem_reid, v, a_src, a_dst, seed)
    return out


def _fwd_pass_terms(plan, v, a_src, a_dst, u, seed, *, h, dh, dk, num_dst,
                    negative_slope, keep, cd, interpret):
    """One forward lane pass → (num, s, w1u, w1su) sliced to num_dst."""
    res = _attn_pass(
        "fwd", plan,
        _feature_major(v, h, dk, plan.n_src_pad, cd),
        _node_stack([a_src], plan.n_src_pad),
        _group_stack([a_dst, u], plan.n_dst_pad),
        seed, dk=dk, negative_slope=negative_slope, keep=keep,
        interpret=interpret,
    )
    return (res[:num_dst, :, :dh], res[:num_dst, :, dk],
            res[:num_dst, :, dk + 1 : dk + 1 + dh],
            res[:num_dst, :, 2 * dk + 1])


def _lane_gat_fwd(num_dst, negative_slope, keep, cd, interpret, num_src,
                  fplan, rplan, fplan2, rplan2, rem_fwd, rem_feid, rem_rev,
                  rem_reid, v, a_src, a_dst, seed):
    h, dh = v.shape[1], v.shape[2]
    dk = _d_pad(dh, jnp.dtype(cd).itemsize)
    u = _upper_bound(a_src, a_dst, negative_slope)
    kw = dict(h=h, dh=dh, dk=dk, num_dst=num_dst,
              negative_slope=negative_slope, keep=keep, cd=cd,
              interpret=interpret)
    num, s, w1u, w1su = _fwd_pass_terms(fplan, v, a_src, a_dst, u, seed, **kw)
    if fplan2 is not None:
        n2, s2, w2u, w2su = _fwd_pass_terms(fplan2, v, a_src, a_dst, u, seed,
                                            **kw)
        num, s, w1u, w1su = num + n2, s + s2, w1u + w2u, w1su + w2su
    if rem_fwd is not None:
        rnum, rden, rw1u, rw1su = _rem_fwd_terms(
            rem_fwd, rem_feid, v, a_src, a_dst, u, seed, keep, negative_slope)
        num = num + rnum[:num_dst]
        s = s + rden[:num_dst]
        w1u = w1u + rw1u[:num_dst]
        w1su = w1su + rw1su[:num_dst]
    out = jnp.where(s[:, :, None] > 0, num / jnp.where(s, s, 1.0)[:, :, None], 0.0)
    return out, (fplan, rplan, fplan2, rplan2, rem_fwd, rem_feid, rem_rev,
                 rem_reid, v, a_src, a_dst, u, s, out, w1u, w1su, seed)


def _b2_pass_terms(plan, g, a_src, a_dst, u, inv_s, c, seed, *, h, dk, dh,
                   num_src, negative_slope, keep, cd, interpret):
    """One backward (b2) lane pass → (grad_v, w2, w3) sliced to num_src."""
    b2 = _attn_pass(
        "b2", plan,
        _feature_major(g, h, dk, plan.n_src_pad, cd),
        _node_stack([a_dst, u, inv_s, c], plan.n_src_pad),
        _group_stack([a_src], plan.n_dst_pad),
        seed, dk=dk, negative_slope=negative_slope, keep=keep,
        interpret=interpret,
    )
    return (b2[:num_src, :, :dh], b2[:num_src, :, dk : dk + dh],
            b2[:num_src, :, 2 * dk])


def _lane_gat_bwd(num_dst, negative_slope, keep, cd, interpret, num_src,
                  res, g):
    (fplan, rplan, fplan2, rplan2, rem_fwd, rem_feid, rem_rev, rem_reid,
     v, a_src, a_dst, u, s, out, w1u, w1su, seed) = res
    h, dh = v.shape[1], v.shape[2]
    dk = _d_pad(dh, jnp.dtype(cd).itemsize)
    g = g.astype(jnp.float32)
    inv_s = jnp.where(s > 0, 1.0 / jnp.where(s, s, 1.0), 0.0)  # (num_dst, H)
    c = jnp.sum(g * out, axis=2)  # (num_dst, H)

    # w1/w1s came for free from the forward pass (g-independent): w1 = α
    # weights need the 1/s normalization the kernel omits
    w1 = w1u * inv_s[:, :, None]
    w1s = w1su * inv_s
    grad_a_dst = jnp.sum(g * w1, axis=2) - c * w1s

    kw = dict(h=h, dk=dk, dh=dh, num_src=num_src,
              negative_slope=negative_slope, keep=keep, cd=cd,
              interpret=interpret)
    grad_v, w2, w3 = _b2_pass_terms(rplan, g, a_src, a_dst, u, inv_s, c,
                                    seed, **kw)
    if rplan2 is not None:
        gv2, w22, w32 = _b2_pass_terms(rplan2, g, a_src, a_dst, u, inv_s, c,
                                       seed, **kw)
        grad_v, w2, w3 = grad_v + gv2, w2 + w22, w3 + w32
    if rem_rev is not None:
        rgv, rw2, rw3 = _rem_b2_terms(rem_rev, rem_reid, g, a_src, a_dst, u,
                                      inv_s, c, seed, keep, negative_slope)
        grad_v = grad_v + rgv[:num_src]
        w2 = w2 + rw2[:num_src]
        w3 = w3 + rw3[:num_src]
    grad_a_src = jnp.sum(v.astype(jnp.float32) * w2, axis=2) - w3

    f0 = lambda t: jax.tree_util.tree_map(
        lambda leaf: np.zeros(leaf.shape, jax.dtypes.float0)
        if jnp.issubdtype(leaf.dtype, jnp.integer) or jnp.issubdtype(leaf.dtype, jnp.bool_)
        else jnp.zeros(leaf.shape, leaf.dtype),
        t,
    )
    return (
        f0(fplan), f0(rplan), f0(fplan2), f0(rplan2), f0(rem_fwd),
        f0(rem_feid), f0(rem_rev), f0(rem_reid), grad_v.astype(v.dtype),
        grad_a_src.astype(a_src.dtype), grad_a_dst.astype(a_dst.dtype),
        np.zeros((), jax.dtypes.float0),
    )


_lane_gat.defvjp(_lane_gat_fwd, _lane_gat_bwd)


def lane_gat_agg(
    fplan: LanePlan,
    rplan: LanePlan,
    v: jnp.ndarray,       # (N_src, H, D) values (projected features)
    a_src: jnp.ndarray,   # (N_src, H) f32 — source attention coefficient
    a_dst: jnp.ndarray,   # (N_dst, H) f32 — destination attention coefficient
    num_dst: int,
    *,
    fplan2: LanePlan = None,  # tier-2 wide-window plan over fplan's remainder
    rplan2: LanePlan = None,
    rem_fwd=None,         # Graph of final remainder edges (src→dst)
    rem_fwd_eid=None,     # (E_rem_pad,) canonical eids, rem_fwd edge order
    rem_rev=None,         # Graph of final reverse remainder edges (dst→src)
    rem_rev_eid=None,
    negative_slope: float = 0.2,
    attn_keep: float = 1.0,
    seed=None,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused edge-softmax attention aggregation:
    ``out[d] = Σ_{e:dst=d} dropout(softmax_d(leaky_relu(a_src[s]+a_dst[d])))
    · v[s]`` returned as (num_dst, H, D) f32. Zero-in-degree rows are 0
    (DGL semantics).

    Hybrid coverage: dense tiles run in the tier-1 lane kernel; tier-1's
    sparse tiles run in the tier-2 wide-window kernel (``fplan2``/``rplan2``
    when attached); any final remainder edges (``rem_fwd``/``rem_rev``, all
    built by ``attach_lane_plans``) run through XLA gathers + one segment
    reduce per pass. All contributions sum into the SAME softmax
    numerator/denominator. ``rplan`` and the eid arrays must carry
    forward-canonical ids so dropout masks agree across layouts."""
    f_tail = fplan2 if fplan2 is not None else fplan
    r_tail = rplan2 if rplan2 is not None else rplan
    if (len(f_tail.rem_src) > 0) != (rem_fwd is not None):
        raise ValueError(
            "forward plan chain has a sparse-tile remainder: pass "
            "rem_fwd/rem_fwd_eid (attach_lane_plans builds them) or use "
            "dense_threshold=1"
        )
    if (len(r_tail.rem_src) > 0) != (rem_rev is not None):
        raise ValueError(
            "reverse plan chain has a sparse-tile remainder: pass "
            "rem_rev/rem_rev_eid or use dense_threshold=1"
        )
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    else:
        seed = jnp.asarray(seed, jnp.int32).reshape((1,))
    return _lane_gat(
        num_dst, float(negative_slope), float(attn_keep), compute_dtype,
        interpret, v.shape[0], fplan, rplan, fplan2, rplan2, rem_fwd,
        rem_fwd_eid, rem_rev, rem_rev_eid, v,
        a_src.astype(jnp.float32), a_dst.astype(jnp.float32), seed,
    )
