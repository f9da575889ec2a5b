"""Pallas lane-SpMM kernel tests (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import dgl_tpu
from dgl_tpu.kernels import build_plan, lane_spmm
from dgl_tpu.ops import gspmm


def _check(src, dst, n, d, rng, threshold=48):
    g = dgl_tpu.from_edges(src, dst, n)
    x = rng.standard_normal((n, d)).astype(np.float32)
    plan = build_plan(src, dst, n, n, dense_threshold=threshold)
    out = np.asarray(
        lane_spmm(plan, jnp.asarray(x), interpret=True, compute_dtype=jnp.float32)
    )[:n]
    if len(plan.rem_src):
        g_rem = dgl_tpu.from_edges(plan.rem_src, plan.rem_dst, n)
        out = out + np.asarray(gspmm(g_rem, "copy_u", "sum", x=jnp.asarray(x)))
    ref = np.asarray(gspmm(g, "copy_u", "sum", x=jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
    return plan


def test_lane_spmm_dense_graph(rng):
    n, e = 3000, 20000
    plan = _check(rng.integers(0, n, e), rng.integers(0, n, e), n, 16, rng, threshold=4)
    assert len(plan.rem_src) == 0


def test_lane_spmm_hybrid_split(rng):
    """Sparse tiles route to the remainder; dense tiles to the plan."""
    n = 4096
    # dense component: edges within a 512-node neighborhood
    src_d = rng.integers(0, 512, 30000)
    dst_d = rng.integers(0, 512, 30000)
    # sparse component: uniform random
    src_s = rng.integers(0, n, 2000)
    dst_s = rng.integers(0, n, 2000)
    src = np.concatenate([src_d, src_s])
    dst = np.concatenate([dst_d, dst_s])
    plan = _check(src, dst, n, 8, rng, threshold=48)
    assert len(plan.rem_src) > 0  # sparse tiles split out
    assert plan.num_edges > 25000  # dense tiles stayed in the plan
    assert plan.expansion < 1.5


def test_lane_spmm_mean(rng):
    n, e = 2000, 15000
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    g = dgl_tpu.from_edges(src, dst, n)
    x = rng.standard_normal((n, 16)).astype(np.float32)
    plan = build_plan(src, dst, n, n, dense_threshold=1)
    out = np.asarray(
        lane_spmm(plan, jnp.asarray(x), in_degrees=g.in_degrees(),
                  interpret=True, compute_dtype=jnp.float32)
    )[:n]
    ref = np.asarray(gspmm(g, "copy_u", "mean", x=jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_lane_spmm_rejects_wide_features(rng):
    n, e = 200, 1000
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    plan = build_plan(src, dst, n, n)
    with pytest.raises(ValueError, match="D<=32"):
        lane_spmm(plan, jnp.zeros((n, 64)), interpret=True)
