"""Oracle tests for the fused lane attention kernel (interpret mode).

The oracle is a pure-jnp edge-softmax attention using the same math
(including the identical U-shift, which softmax is invariant to, and the
identical eid-hash dropout mask) so forward AND gradients can be compared
exactly via jax.grad.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import dgl_tpu
from dgl_tpu.kernels import attach_lane_plans
from dgl_tpu.kernels.lane_attention import _hash_keep, lane_gat_agg
from dgl_tpu.ops.segment import segment_sum


def _leaky(x, ns):
    return jnp.where(x > 0, x, ns * x)


def _ref_gat(src, dst, n_dst, v, a_src, a_dst, ns, keep, seed):
    """Dense-op reference with the same U-shift and dropout hash."""
    max_a = jax.lax.stop_gradient(jnp.max(a_src, axis=0))
    u = _leaky(a_dst + max_a[None, :], ns)
    logits = _leaky(a_src[src] + a_dst[dst], ns)  # (E, H)
    p = jnp.exp(logits - u[dst])
    s = segment_sum(p, dst, n_dst, sorted=False)
    alpha = p / jnp.where(s, s, 1.0)[dst]
    if keep < 1.0:
        eid = jnp.arange(len(src), dtype=jnp.int32)
        alpha = alpha * _hash_keep(eid, jnp.int32(seed), keep)[:, None]
    out = segment_sum(alpha[:, :, None] * v[src], dst, n_dst, sorted=False)
    return jnp.where(
        (s > 0)[:, :, None], out, 0.0
    )


def _setup(rng, n, e, h, d, *, skew=False):
    if skew:
        src = (rng.zipf(1.5, e) - 1) % n
    else:
        src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    g = attach_lane_plans(
        dgl_tpu.from_edges(src, dst, n), dense_threshold=1, max_expansion=1e9
    )
    # plans must fully cover the edge set
    assert len(g.lane.plan.rem_src) == 0
    assert len(g.reverse.lane.plan.rem_src) == 0
    # canonical edge order (the Graph dst-sorts edges; plan eids refer to it)
    src_c, dst_c = g.edges_numpy()
    v = rng.standard_normal((n, h, d)).astype(np.float32)
    a_s = rng.standard_normal((n, h)).astype(np.float32)
    a_d = rng.standard_normal((n, h)).astype(np.float32)
    return g, src_c, dst_c, jnp.asarray(v), jnp.asarray(a_s), jnp.asarray(a_d)


@pytest.mark.parametrize("h,d", [(1, 16), (4, 8)])
def test_lane_gat_forward_matches_reference(rng, h, d):
    n, e = 150, 2500
    g, src, dst, v, a_s, a_d = _setup(rng, n, e, h, d)
    out = lane_gat_agg(
        g.lane.plan, g.reverse.lane.plan, v, a_s, a_d, n,
        compute_dtype=jnp.float32, interpret=True,
    )
    ref = _ref_gat(src, dst, n, v, a_s, a_d, 0.2, 1.0, 0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_lane_gat_zero_indegree_rows_are_zero(rng):
    n, e = 96, 600
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n // 2, e)  # upper half has no in-edges
    g = attach_lane_plans(
        dgl_tpu.from_edges(src, dst, n), dense_threshold=1, max_expansion=1e9
    )
    v = jnp.asarray(rng.standard_normal((n, 1, 8)).astype(np.float32))
    a = jnp.asarray(rng.standard_normal((n, 1)).astype(np.float32))
    out = lane_gat_agg(g.lane.plan, g.reverse.lane.plan, v, a, a, n,
                       compute_dtype=jnp.float32, interpret=True)
    assert np.all(np.asarray(out[n // 2 :]) == 0)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("keep", [1.0, 0.6])
def test_lane_gat_gradients_match_reference(rng, keep):
    n, e, h, d = 120, 1800, 2, 8
    g, src, dst, v, a_s, a_d = _setup(rng, n, e, h, d, skew=True)
    seed = 77
    tgt = jnp.asarray(rng.standard_normal((n, h, d)).astype(np.float32))

    def loss_lane(v, a_s, a_d):
        out = lane_gat_agg(
            g.lane.plan, g.reverse.lane.plan, v, a_s, a_d, n,
            attn_keep=keep, seed=seed, compute_dtype=jnp.float32,
            interpret=True,
        )
        return jnp.sum((out - tgt) ** 2)

    def loss_ref(v, a_s, a_d):
        out = _ref_gat(src, dst, n, v, a_s, a_d, 0.2, keep, seed)
        return jnp.sum((out - tgt) ** 2)

    l1, grads1 = jax.value_and_grad(loss_lane, argnums=(0, 1, 2))(v, a_s, a_d)
    l2, grads2 = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(v, a_s, a_d)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-4)
    for gl, gr, name in zip(grads1, grads2, ("v", "a_src", "a_dst")):
        np.testing.assert_allclose(
            np.asarray(gl), np.asarray(gr), rtol=5e-4, atol=5e-4,
            err_msg=f"grad mismatch: {name}",
        )


def test_lane_gat_bf16_close(rng):
    n, e, h, d = 150, 2500, 1, 16
    g, src, dst, v, a_s, a_d = _setup(rng, n, e, h, d)
    out = lane_gat_agg(g.lane.plan, g.reverse.lane.plan, v, a_s, a_d, n,
                       compute_dtype=jnp.bfloat16, interpret=True)
    ref = _ref_gat(src, dst, n, v, a_s, a_d, 0.2, 1.0, 0)
    denom = np.abs(np.asarray(ref)).max() + 1e-6
    rel = np.abs(np.asarray(out) - np.asarray(ref)).max() / denom
    assert rel < 0.05, f"bf16 rel err {rel}"


@pytest.mark.parametrize("keep", [1.0, 0.7])
def test_lane_gat_hybrid_remainder_matches_reference(rng, keep):
    """Plans built with a high dense_threshold leave sparse-tile remainders;
    the hybrid path (lane kernel + XLA remainder terms under one softmax)
    must still match the dense reference for values AND gradients."""
    n, h, d = 1500, 2, 8
    # half the edges concentrate in one src bucket (dense tiles), half are
    # uniform (sparse tiles -> remainder at this threshold)
    src = np.concatenate([rng.integers(0, 128, 1500), rng.integers(0, n, 1500)])
    dst = rng.integers(0, n, 3000)
    g = attach_lane_plans(
        dgl_tpu.from_edges(src, dst, n), dense_threshold=100, max_expansion=1e9
    )
    assert len(g.lane.plan.rem_src) > 0, "test graph must have a remainder"
    assert len(g.reverse.lane.plan.rem_src) > 0
    src_c, dst_c = g.edges_numpy()
    v = jnp.asarray(rng.standard_normal((n, h, d)).astype(np.float32))
    a_s = jnp.asarray(rng.standard_normal((n, h)).astype(np.float32))
    a_d = jnp.asarray(rng.standard_normal((n, h)).astype(np.float32))
    seed = 13

    def run_lane(v, a_s, a_d):
        return lane_gat_agg(
            g.lane.plan, g.reverse.lane.plan, v, a_s, a_d, n,
            rem_fwd=g.lane.remainder, rem_fwd_eid=g.lane.rem_eid,
            rem_rev=g.reverse.lane.remainder, rem_rev_eid=g.reverse.lane.rem_eid,
            attn_keep=keep, seed=seed, compute_dtype=jnp.float32,
            interpret=True,
        )

    out = run_lane(v, a_s, a_d)
    ref = _ref_gat(src_c, dst_c, n, v, a_s, a_d, 0.2, keep, seed)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=5e-5, atol=5e-5)

    tgt = jnp.asarray(rng.standard_normal((n, h, d)).astype(np.float32))
    l1, grads1 = jax.value_and_grad(
        lambda v, a, b: jnp.sum((run_lane(v, a, b) - tgt) ** 2), argnums=(0, 1, 2)
    )(v, a_s, a_d)
    l2, grads2 = jax.value_and_grad(
        lambda v, a, b: jnp.sum((_ref_gat(src_c, dst_c, n, v, a, b, 0.2, keep, seed) - tgt) ** 2),
        argnums=(0, 1, 2),
    )(v, a_s, a_d)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-4)
    for gl, gr, name in zip(grads1, grads2, ("v", "a_src", "a_dst")):
        np.testing.assert_allclose(
            np.asarray(gl), np.asarray(gr), rtol=5e-4, atol=5e-4,
            err_msg=f"hybrid grad mismatch: {name}",
        )


@pytest.mark.parametrize("window", [256, 1024])
def test_lane_gat_multi_window_forward_and_grads(rng, window):
    """Wide-window plans (K sub-bucket gathers) through the fused attention
    kernel: forward and all three gradients must match the oracle."""
    n, e, h, d = 1500, 9000, 2, 8
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    g = attach_lane_plans(
        dgl_tpu.from_edges(src, dst, n), dense_threshold=1,
        window=window, max_expansion=1e9,
    )
    assert g.lane.plan.window == window
    assert len(g.lane.plan.rem_src) == 0
    src_c, dst_c = g.edges_numpy()
    v = jnp.asarray(rng.standard_normal((n, h, d)).astype(np.float32))
    a_s = jnp.asarray(rng.standard_normal((n, h)).astype(np.float32))
    a_d = jnp.asarray(rng.standard_normal((n, h)).astype(np.float32))
    tgt = jnp.asarray(rng.standard_normal((n, h, d)).astype(np.float32))

    def loss_lane(v, a_s, a_d):
        out = lane_gat_agg(g.lane.plan, g.reverse.lane.plan, v, a_s, a_d, n,
                           compute_dtype=jnp.float32, interpret=True)
        return jnp.sum((out - tgt) ** 2)

    def loss_ref(v, a_s, a_d):
        out = _ref_gat(src_c, dst_c, n, v, a_s, a_d, 0.2, 1.0, 0)
        return jnp.sum((out - tgt) ** 2)

    out = lane_gat_agg(g.lane.plan, g.reverse.lane.plan, v, a_s, a_d, n,
                       compute_dtype=jnp.float32, interpret=True)
    ref = _ref_gat(src_c, dst_c, n, v, a_s, a_d, 0.2, 1.0, 0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)
    gl = jax.grad(loss_lane, argnums=(0, 1, 2))(v, a_s, a_d)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(v, a_s, a_d)
    for a, b, name in zip(gl, gr, ("v", "a_src", "a_dst")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3, err_msg=name)


@pytest.mark.parametrize("keep", [1.0, 0.7])
def test_lane_gat_two_tier_matches_reference(rng, keep):
    """v4 tier-2: fused attention with a wide-window second plan over the
    tier-1 remainder must match the dense reference (values + grads),
    including dropout masks keyed on canonical eids across both tiers."""
    from dgl_tpu.kernels.lane_spmm import build_plan

    n, h, d = 20000, 2, 8
    src = np.concatenate([rng.integers(0, 128, 3000), rng.integers(0, n, 3000)])
    dst = rng.integers(0, n, 6000)
    g = attach_lane_plans(
        dgl_tpu.from_edges(src, dst, n), dense_threshold=100, max_expansion=1e9
    )
    fplan, rplan = g.lane.plan, g.reverse.lane.plan
    assert len(fplan.rem_src) > 0 and len(rplan.rem_src) > 0
    # build tier-2 manually at full coverage (threshold=1 -> no remainder)
    fplan2 = build_plan(fplan.rem_src, fplan.rem_dst, n, n,
                        dense_threshold=1, eid=fplan.rem_eid, window=2048)
    rplan2 = build_plan(rplan.rem_src, rplan.rem_dst, n, n,
                        dense_threshold=1, eid=rplan.rem_eid, window=2048)
    assert len(fplan2.rem_src) == 0 and len(rplan2.rem_src) == 0

    src_c, dst_c = g.edges_numpy()
    v = jnp.asarray(rng.standard_normal((n, h, d)).astype(np.float32))
    a_s = jnp.asarray(rng.standard_normal((n, h)).astype(np.float32))
    a_d = jnp.asarray(rng.standard_normal((n, h)).astype(np.float32))
    seed = 23

    def run_lane(v, a_s, a_d):
        return lane_gat_agg(
            fplan, rplan, v, a_s, a_d, n, fplan2=fplan2, rplan2=rplan2,
            attn_keep=keep, seed=seed, compute_dtype=jnp.float32,
            interpret=True,
        )

    out = run_lane(v, a_s, a_d)
    ref = _ref_gat(src_c, dst_c, n, v, a_s, a_d, 0.2, keep, seed)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-5, atol=5e-5)

    tgt = jnp.asarray(rng.standard_normal((n, h, d)).astype(np.float32))
    l1, grads1 = jax.value_and_grad(
        lambda v, a, b: jnp.sum((run_lane(v, a, b) - tgt) ** 2), argnums=(0, 1, 2)
    )(v, a_s, a_d)
    l2, grads2 = jax.value_and_grad(
        lambda v, a, b: jnp.sum(
            (_ref_gat(src_c, dst_c, n, v, a, b, 0.2, keep, seed) - tgt) ** 2),
        argnums=(0, 1, 2),
    )(v, a_s, a_d)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-4)
    for gl, gr_, name in zip(grads1, grads2, ("v", "a_src", "a_dst")):
        np.testing.assert_allclose(
            np.asarray(gl), np.asarray(gr_), rtol=5e-4, atol=5e-4,
            err_msg=f"grad mismatch: {name}",
        )
