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


def test_lane_spmm_wide_features_and_weights(rng):
    """v2: wide D runs as a feature-slab grid; u_mul_e via plan-layout
    weights; both must match the numpy oracle."""
    from dgl_tpu.kernels.lane_spmm import plan_layout_edata

    n, e, d = 200, 4000, 64
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    plan = build_plan(src, dst, n, n, dense_threshold=1)
    x = rng.standard_normal((n, d)).astype(np.float32)
    oracle = np.zeros((plan.n_dst_pad, d), np.float32)
    np.add.at(oracle, dst, x[src])
    out = lane_spmm(plan, jnp.asarray(x), interpret=True, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), oracle, rtol=1e-5, atol=1e-4)

    w = rng.standard_normal(e).astype(np.float32)
    wp = plan_layout_edata(plan, w)
    oracle_w = np.zeros((plan.n_dst_pad, d), np.float32)
    np.add.at(oracle_w, dst, x[src] * w[:, None])
    out_w = lane_spmm(plan, jnp.asarray(x), jnp.asarray(wp), interpret=True,
                      compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out_w), oracle_w, rtol=1e-5, atol=1e-4)


def test_attach_and_dispatch_interpret(rng, monkeypatch):
    """attach_lane_plans + gspmm dispatch: value and grad must match the XLA
    path (interpret-mode kernel; dispatch forced on via backend monkeypatch)."""
    import dgl_tpu.ops.spmm as spmm_mod
    from dgl_tpu.kernels import attach_lane_plans
    import importlib
    lane_mod = importlib.import_module("dgl_tpu.kernels.lane_spmm")

    n, e, d = 2000, 30000, 8
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    g = dgl_tpu.from_edges(src, dst, n)
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))

    ref = np.asarray(gspmm(g, "copy_u", "mean", x=x))
    ref_grad = np.asarray(
        jax.grad(lambda x: jnp.sum(gspmm(g, "copy_u", "mean", x=x) ** 2))(x)
    )

    g2 = attach_lane_plans(g, dense_threshold=1, max_expansion=100.0)
    assert g2.lane is not None and g2.reverse.lane is not None
    # force dispatch on CPU via interpret-mode kernel
    monkeypatch.setattr(spmm_mod.jax, "default_backend", lambda: "tpu")
    orig = lane_mod.lane_spmm
    monkeypatch.setattr(
        lane_mod, "lane_spmm",
        lambda plan, x, **kw: orig(plan, x, **{**kw, "interpret": True,
                                               "compute_dtype": jnp.float32}),
    )
    out = np.asarray(gspmm(g2, "copy_u", "mean", x=x))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
    grad = np.asarray(
        jax.grad(lambda x: jnp.sum(gspmm(g2, "copy_u", "mean", x=x) ** 2))(x)
    )
    np.testing.assert_allclose(grad, ref_grad, rtol=1e-3, atol=1e-3)


def test_attach_plan_cache_roundtrip(rng, tmp_path):
    """attach_lane_plans(cache_dir=...): the reloaded attachment must be
    array-identical to the freshly built one (both directions, remainder
    graph, rem_eid), and a second call must hit the cache file."""
    import os

    from dgl_tpu.kernels import attach_lane_plans

    n, e = 1500, 25000
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    g = dgl_tpu.from_edges(src, dst, n)

    fresh = attach_lane_plans(g, dense_threshold=8, max_expansion=100.0)
    cached = attach_lane_plans(
        g, dense_threshold=8, max_expansion=100.0,
        cache_dir=str(tmp_path), cache_key="t",
    )
    files = [f for f in os.listdir(tmp_path) if f.endswith(".npz")]
    assert len(files) == 1
    mtime = os.path.getmtime(tmp_path / files[0])
    reloaded = attach_lane_plans(
        g, dense_threshold=8, max_expansion=100.0,
        cache_dir=str(tmp_path), cache_key="t",
    )
    assert os.path.getmtime(tmp_path / files[0]) == mtime  # no rebuild

    for a, b in [(fresh, cached), (fresh, reloaded)]:
        for att_a, att_b in [(a.lane, b.lane), (a.reverse.lane, b.reverse.lane)]:
            assert (att_a is None) == (att_b is None)
            pa, pb = att_a.plan, att_b.plan
            for f in ("meta", "bucket", "group", "first", "eid"):
                np.testing.assert_array_equal(
                    np.asarray(getattr(pa, f)), np.asarray(getattr(pb, f)), err_msg=f
                )
            assert pa.expansion == pytest.approx(pb.expansion)
            assert (pa.num_chunks, pa.num_groups, pa.n_src_pad, pa.n_dst_pad,
                    pa.num_edges, pa.num_edges_total) == (
                pb.num_chunks, pb.num_groups, pb.n_src_pad, pb.n_dst_pad,
                pb.num_edges, pb.num_edges_total)
            if att_a.remainder is not None:
                np.testing.assert_array_equal(
                    np.asarray(att_a.remainder.src), np.asarray(att_b.remainder.src))
                np.testing.assert_array_equal(
                    np.asarray(att_a.rem_eid), np.asarray(att_b.rem_eid))


def test_attach_plan_cache_rejects_changed_graph(rng, tmp_path):
    """A structurally different graph under the same cache key must not
    reuse the stale plan (content hash in the filename)."""
    import os

    from dgl_tpu.kernels import attach_lane_plans

    n, e = 800, 12000
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    g1 = dgl_tpu.from_edges(src, dst, n)
    attach_lane_plans(g1, dense_threshold=8, max_expansion=100.0,
                      cache_dir=str(tmp_path), cache_key="t")
    src2 = rng.integers(0, n, e)  # same count, different content
    g2 = dgl_tpu.from_edges(src2, dst, n)
    attach_lane_plans(g2, dense_threshold=8, max_expansion=100.0,
                      cache_dir=str(tmp_path), cache_key="t")
    files = [f for f in os.listdir(tmp_path) if f.endswith(".npz")]
    assert len(files) == 2


@pytest.mark.parametrize("window", [256, 512, 1024, 2048, 8192])
def test_lane_spmm_multi_window(rng, window):
    """v3 multi-window runs: K sub-bucket gathers + select must reproduce
    the exact copy_u/sum aggregation for every window width."""
    n, e = 3000, 18000
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    g = dgl_tpu.from_edges(src, dst, n)
    x = rng.standard_normal((n, 16)).astype(np.float32)
    plan = build_plan(src, dst, n, n, dense_threshold=1, window=window)
    assert plan.window == window and len(plan.rem_src) == 0
    out = np.asarray(
        lane_spmm(plan, jnp.asarray(x), interpret=True,
                  compute_dtype=jnp.float32)
    )[:n]
    ref = np.asarray(gspmm(g, "copy_u", "sum", x=jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("window", [256, 1024, 4096])
def test_lane_spmm_multi_window_weights(rng, window):
    """u_mul_e through a wide-window plan (plan-layout weights)."""
    from dgl_tpu.kernels.lane_spmm import plan_layout_edata

    n, e = 1500, 9000
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    g = dgl_tpu.from_edges(src, dst, n)
    src_c, dst_c = g.edges_numpy()
    w_canon = rng.standard_normal(e).astype(np.float32)
    plan = build_plan(src_c, dst_c, n, n, dense_threshold=1, window=window)
    w_plan = jnp.asarray(plan_layout_edata(plan, w_canon))
    x = rng.standard_normal((n, 8)).astype(np.float32)
    out = np.asarray(
        lane_spmm(plan, jnp.asarray(x), w=w_plan, interpret=True,
                  compute_dtype=jnp.float32)
    )[:n]
    e_pad = np.asarray(g.src).shape[0]  # sentinel-padded edge count
    w_padded = np.zeros((e_pad, 1), np.float32)
    w_padded[:e, 0] = w_canon
    ref = np.asarray(gspmm(g, "mul", "sum", x=jnp.asarray(x),
                           e=jnp.asarray(w_padded)))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_choose_plan_config_prefers_wide_window_on_sparse_pairs(rng):
    """A low-locality graph (tiny (group,bucket) pairs) must tune to a
    window wider than 128; a dense-block graph keeps plenty of coverage."""
    from dgl_tpu.kernels import choose_plan_config

    n = 16384
    src = rng.integers(0, n, 60000)
    dst = rng.integers(0, n, 60000)
    w, thr, info = choose_plan_config(src, dst)
    # uniform-random at this scale: avg pair size at W=128 is ~0.03, so the
    # tuner must either go wide or leave everything to the remainder
    assert w > 128 or info["rem_frac"] > 0.9
    # block-local graph: everything dense at W=128 already
    src2 = rng.integers(0, 128, 60000)
    dst2 = rng.integers(0, 1024, 60000)
    w2, thr2, info2 = choose_plan_config(src2, dst2)
    assert info2["rem_frac"] == 0.0 and info2["expansion"] < 1.1


def test_two_tier_attach_and_dispatch(rng, monkeypatch):
    """v4 tier-2: a graph whose tier-1 remainder is large must attach a
    wide-window plan2 covering it, and the gspmm dispatch (tier-1 + tier-2 +
    final remainder) must match the XLA path for value and grad."""
    import importlib

    import dgl_tpu.kernels.attach as attach_mod
    import dgl_tpu.ops.spmm as spmm_mod
    from dgl_tpu.kernels import attach_lane_plans

    lane_mod = importlib.import_module("dgl_tpu.kernels.lane_spmm")

    n = 60000
    # dense block (tier-1 tiles) + uniform tail: at n=60k the tail's (group,
    # 128-bucket) pairs hold ~1 edge (tier-1 remainder) while its (group,
    # 8192-window) tiles hold ~60 (tier-2 servable)
    src = np.concatenate([rng.integers(0, 256, 40000), rng.integers(0, n, 30000)])
    dst = np.concatenate([rng.integers(0, 1024, 40000), rng.integers(0, n, 30000)])
    g = dgl_tpu.from_edges(src, dst, n)
    x = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))

    ref = np.asarray(gspmm(g, "copy_u", "sum", x=x))
    ref_grad = np.asarray(
        jax.grad(lambda x: jnp.sum(gspmm(g, "copy_u", "sum", x=x) ** 2))(x)
    )

    monkeypatch.setattr(attach_mod, "_TIER2_MIN_EDGES", 1000)
    monkeypatch.setattr(attach_mod, "_TIER2_REM_NS", 1e9)  # always keep
    g2 = attach_lane_plans(g, dense_threshold=48, max_expansion=100.0)
    assert len(g2.lane.plan.rem_src) > 0, "tier-1 must leave a remainder"
    assert g2.lane.plan2 is not None, "tier-2 plan must attach"
    assert g2.lane.plan2.window > 1024
    # tier-2 covers most of tier-1's remainder
    assert len(g2.lane.plan2.rem_src) < len(g2.lane.plan.rem_src) / 2

    monkeypatch.setattr(spmm_mod.jax, "default_backend", lambda: "tpu")
    orig = lane_mod.lane_spmm
    monkeypatch.setattr(
        lane_mod, "lane_spmm",
        lambda plan, x, **kw: orig(plan, x, **{**kw, "interpret": True,
                                               "compute_dtype": jnp.float32}),
    )
    out = np.asarray(gspmm(g2, "copy_u", "sum", x=x))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
    grad = np.asarray(
        jax.grad(lambda x: jnp.sum(gspmm(g2, "copy_u", "sum", x=x) ** 2))(x)
    )
    np.testing.assert_allclose(grad, ref_grad, rtol=1e-3, atol=1e-3)


def test_two_tier_cache_roundtrip(rng, tmp_path, monkeypatch):
    """plan2 must survive the npz cache round-trip bit-identically."""
    import os

    import dgl_tpu.kernels.attach as attach_mod
    from dgl_tpu.kernels import attach_lane_plans

    monkeypatch.setattr(attach_mod, "_TIER2_MIN_EDGES", 1000)
    monkeypatch.setattr(attach_mod, "_TIER2_REM_NS", 1e9)
    n = 50000
    src = np.concatenate([rng.integers(0, 256, 30000), rng.integers(0, n, 20000)])
    dst = np.concatenate([rng.integers(0, 1024, 30000), rng.integers(0, n, 20000)])
    g = dgl_tpu.from_edges(src, dst, n)
    fresh = attach_lane_plans(g, dense_threshold=48, max_expansion=100.0,
                              cache_dir=str(tmp_path), cache_key="t2")
    assert fresh.lane.plan2 is not None
    reloaded = attach_lane_plans(g, dense_threshold=48, max_expansion=100.0,
                                 cache_dir=str(tmp_path), cache_key="t2")
    for att_a, att_b in [(fresh.lane, reloaded.lane),
                         (fresh.reverse.lane, reloaded.reverse.lane)]:
        assert (att_a.plan2 is None) == (att_b.plan2 is None)
        if att_a.plan2 is None:
            continue
        pa, pb = att_a.plan2, att_b.plan2
        assert pa.window == pb.window
        for f in ("meta", "bucket", "group", "first", "eid"):
            np.testing.assert_array_equal(
                np.asarray(getattr(pa, f)), np.asarray(getattr(pb, f)), err_msg=f)
        np.testing.assert_array_equal(pa.rem_src, pb.rem_src)


def test_rel_lane_agg_matches_gspmm_rel(rng, monkeypatch):
    """Weighted lane-pass RGCN aggregation (rel_lane_agg) must match
    gspmm_rel in value and grad-wrt-y; edge weights are constants on this
    path (their cotangent is zero by contract)."""
    monkeypatch.setenv("DGL_TPU_LANE_INTERPRET", "1")
    from dgl_tpu.kernels import attach_lane_plans
    from dgl_tpu.ops.rel_lane import RelLaneWeights, rel_lane_agg
    from dgl_tpu.ops.spmm import gspmm_rel

    n, e, R, d = 3000, 20000, 3, 4
    src = np.concatenate([rng.integers(0, 128, e // 2), rng.integers(0, n, e // 2)])
    dst = rng.integers(0, n, e)
    g = attach_lane_plans(dgl_tpu.from_edges(src, dst, n),
                          dense_threshold=8, max_expansion=1e9,
                          compute_dtype=jnp.float32)
    assert g.lane is not None
    # input-order weights -> canonical order, like the driver does
    w_in = np.zeros((g.num_edges_padded, R), np.float32)
    w_in[:e] = rng.standard_normal((e, R))
    w_canon = np.asarray(g.permute_edata(jnp.asarray(w_in)))
    lw = RelLaneWeights.build(g, w_canon, dtype=jnp.float32)
    y = jnp.asarray(rng.standard_normal((n, R, d)).astype(np.float32))

    ref = gspmm_rel("mean", 3, g, y, jnp.asarray(w_canon))
    out = rel_lane_agg("mean", R, True, g, y, lw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)

    gr = jax.grad(lambda y: jnp.sum(gspmm_rel("mean", 3, g, y, jnp.asarray(w_canon)) ** 2))(y)
    gl = jax.grad(lambda y: jnp.sum(rel_lane_agg("mean", R, True, g, y, lw) ** 2))(y)
    np.testing.assert_allclose(np.asarray(gl), np.asarray(gr),
                               rtol=1e-3, atol=1e-3)


# -- MXU piece reduce (kernels/piece_reduce.py) ------------------------------


def test_segment_sum_mxu_matches_scatter(rng):
    import jax
    import jax.numpy as jnp

    import dgl_tpu
    from dgl_tpu.kernels.piece_reduce import segment_sum_mxu

    for n, e, tail in [(50, 400, (3,)), (200, 5000, (2, 5)), (7, 9, (4,)),
                       (300, 1, (2,))]:
        src = rng.integers(0, n, e)
        dst = rng.integers(0, n, e)
        g = dgl_tpu.from_edges(src, dst, n)
        msg = rng.standard_normal((g.num_edges_padded,) + tail).astype(np.float32)
        msg[g.num_edges:] = 0.0
        mj = jnp.asarray(msg)
        ref = jax.ops.segment_sum(
            mj.reshape(g.num_edges_padded, -1), jnp.minimum(g.dst, n),
            num_segments=n + 1,
        )[:n]
        for interpret in (False, True):  # einsum oracle + pallas interpret
            out = segment_sum_mxu(mj, g.mxublocks, n, interpret)
            np.testing.assert_allclose(
                np.asarray(out).reshape(n, -1), np.asarray(ref), atol=1e-4,
                err_msg=f"n={n} e={e} interpret={interpret}",
            )
        # custom-VJP adjoint: grad_msg[e] = d/d out[dst[e]]
        gr = jax.grad(
            lambda m: jnp.sum(segment_sum_mxu(m, g.mxublocks, n, False) ** 2)
        )(mj)
        gd = 2.0 * np.asarray(ref)[
            np.minimum(np.asarray(g.dst), n - 1)
        ].reshape(gr.shape)
        mask = (np.asarray(g.dst) < n).reshape((-1,) + (1,) * len(tail))
        np.testing.assert_allclose(
            np.asarray(gr) * mask, gd * mask, atol=1e-4)
        # bf16 input → f32 accumulator output
        out_bf = segment_sum_mxu(mj.astype(jnp.bfloat16), g.mxublocks, n, False)
        assert out_bf.dtype == jnp.float32
        np.testing.assert_allclose(
            np.asarray(out_bf).reshape(n, -1), np.asarray(ref),
            atol=0.2, rtol=0.05)


def test_gspmm_mxu_mode_matches_default(rng, monkeypatch):
    """DGL_TPU_SEGSUM=mxu must reproduce the default path through gspmm."""
    import jax.numpy as jnp

    import dgl_tpu
    from dgl_tpu.ops import gspmm

    n, e = 120, 2000
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    g = dgl_tpu.from_edges(src, dst, n)
    x = jnp.asarray(rng.standard_normal((n, 40)).astype(np.float32))
    ref = np.asarray(gspmm(g, "copy_u", "sum", x=x))
    monkeypatch.setenv("DGL_TPU_SEGSUM", "mxu")
    out = np.asarray(gspmm(g, "copy_u", "sum", x=x))
    np.testing.assert_allclose(out, ref, atol=1e-4)
