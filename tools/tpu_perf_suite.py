"""Consolidated TPU measurement suite.

Waits (bounded) for a healthy chip window, then measures the queued perf
items from ROADMAP.md in one session: reddit SAGE epoch (bench parity),
reddit GAT epoch (restructured attention), lane_spmm vs XLA on a clustered
graph, and an ogbn-products SAGE epoch. Appends JSON lines to
``--out`` (default /tmp/tpu_perf_suite.jsonl) as results arrive so a killed
run still reports.
"""

import argparse
import json
import sys
import time


def log(out_path, **kv):
    kv["t"] = round(time.time(), 1)
    with open(out_path, "a") as f:
        f.write(json.dumps(kv) + "\n")
    print(json.dumps(kv), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/tpu_perf_suite.jsonl")
    ap.add_argument("--health-timeout-min", type=int, default=45)
    ap.add_argument("--skip-products", action="store_true")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    import sys as _s, os as _o
    _s.path.insert(0, _o.path.dirname(_o.path.dirname(_o.path.abspath(__file__))))
    from dgl_tpu.train import chip_health_ms

    deadline = time.time() + args.health_timeout_min * 60
    while True:
        h = chip_health_ms()
        log(args.out, stage="health", matmul_ms=round(h, 2))
        if h < 10.0 or time.time() > deadline:
            break
        time.sleep(60)
    healthy = h < 10.0
    log(args.out, stage="health_final", healthy=healthy, matmul_ms=round(h, 2))

    import dgl_tpu
    from dgl_tpu.data import load_node_dataset
    from dgl_tpu.models import GAT, GraphSAGE
    from dgl_tpu.ops import gspmm
    from dgl_tpu.ops.spmm import gspmm_chunked

    def epoch_time(model, g, x, y, mask, extra_apply_kwargs=None, epochs=8):
        extra = extra_apply_kwargs or {}
        params = model.init(jax.random.PRNGKey(0), g, x, **extra)["params"]
        tx = optax.adam(1e-2)
        opt = tx.init(params)

        def loss_fn(p, key, g, x, y, mask, xk):
            logits = model.apply({"params": p}, g, x, **xk,
                                 deterministic=False, rngs={"dropout": key})
            logp = jax.nn.log_softmax(logits)
            ce = -jnp.take_along_axis(logp, y[:, None], 1)[:, 0]
            m = mask.astype(ce.dtype)
            return jnp.sum(ce * m) / jnp.sum(m)

        @jax.jit
        def step(params, opt, key, g, x, y, mask, xk):
            l, gr = jax.value_and_grad(loss_fn)(params, key, g, x, y, mask, xk)
            up, opt = tx.update(gr, opt)
            return optax.apply_updates(params, up), opt, l

        key = jax.random.PRNGKey(0)
        for _ in range(3):
            key, sub = jax.random.split(key)
            params, opt, l = step(params, opt, sub, g, x, y, mask, extra)
        float(l)
        times = []
        for _ in range(epochs):
            key, sub = jax.random.split(key)
            t0 = time.time()
            params, opt, l = step(params, opt, sub, g, x, y, mask, extra)
            float(l)
            times.append(time.time() - t0)
        return min(times), times

    # ---- reddit SAGE (headline) ----
    try:
        data = load_node_dataset("reddit")
        g = dgl_tpu.from_edges(data.src, data.dst, data.num_nodes)
        x = jnp.asarray(data.features)
        y = jnp.asarray(data.labels)
        mask = jnp.asarray(data.train_mask)
        x_agg = gspmm_chunked(g, "copy_u", "mean", x)
        jax.block_until_ready(x_agg)
        model = GraphSAGE(hidden_feats=16, out_feats=data.num_classes, num_layers=2)
        dt, times = epoch_time(model, g, x, y, mask, {"x_agg": x_agg})
        log(args.out, stage="reddit_sage", epoch_s=round(dt, 4),
            vs_dgl_v100=round(0.3627 / dt, 2), times=[round(t, 3) for t in times])
        dt2, _ = epoch_time(model, g, x, y, mask, None, epochs=5)
        log(args.out, stage="reddit_sage_nohoist", epoch_s=round(dt2, 4),
            vs_dgl_v100=round(0.3627 / dt2, 2))
    except Exception as e:
        log(args.out, stage="reddit_sage", error=repr(e)[:300])

    # ---- reddit GAT ----
    try:
        from dgl_tpu.graph.transforms import add_self_loops

        s2, d2 = add_self_loops(data.src, data.dst, data.num_nodes)
        g2 = dgl_tpu.from_edges(s2, d2, data.num_nodes)
        gat = GAT(hidden_feats=16, out_feats=data.num_classes, heads=(1, 1, 1),
                  feat_drop=0.18, attn_drop=0.18)
        dt, times = epoch_time(gat, g2, x, y, mask)
        log(args.out, stage="reddit_gat", epoch_s=round(dt, 4),
            vs_dgl_v100=round(0.5532 / dt, 2), times=[round(t, 3) for t in times])
    except Exception as e:
        log(args.out, stage="reddit_gat", error=repr(e)[:300])

    # ---- lane_spmm vs XLA on a clustered graph ----
    try:
        from dgl_tpu.kernels import build_plan, lane_spmm

        rng = np.random.default_rng(0)
        n, d_feat, e = 262144, 16, 12_000_000
        src_c = rng.integers(0, n, e)
        off = rng.integers(-2048, 2048, e)
        dst_c = np.where(rng.random(e) < 0.85,
                         np.clip(src_c + off, 0, n - 1), rng.integers(0, n, e))
        plan = build_plan(src_c, dst_c, n, n)
        gc = dgl_tpu.from_edges(src_c, dst_c, n)
        xs = jnp.asarray(rng.standard_normal((n, d_feat)).astype(np.float32))

        def carry_bench(f, *a, R=5):
            fj = jax.jit(f)
            c = fj(jnp.float32(0), *a)
            jax.block_until_ready(c)
            t0 = time.time()
            c = jnp.float32(0)
            for _ in range(R):
                c = fj(c, *a)
            float(c)
            return (time.time() - t0) / R

        t_xla = carry_bench(lambda c, g, x: jnp.sum(gspmm(g, "copy_u", "sum", x=x + c)) * 1e-30 + c, gc, xs)
        t_lane = carry_bench(lambda c, p, x: jnp.sum(lane_spmm(p, x + c)) * 1e-30 + c, plan, xs)
        out = jax.jit(lane_spmm)(plan, xs)
        ref = gspmm(gc, "copy_u", "sum", x=xs)
        rel = float(jnp.max(jnp.abs(out[:n] - ref)) / jnp.maximum(jnp.max(jnp.abs(ref)), 1e-6))
        log(args.out, stage="lane_spmm", xla_ms=round(t_xla * 1000, 1),
            lane_ms=round(t_lane * 1000, 1), expansion=round(plan.expansion, 2),
            rem_frac=round(len(plan.rem_src) / e, 3), max_rel_err=round(rel, 5))
    except Exception as e:
        log(args.out, stage="lane_spmm", error=repr(e)[:300])

    # ---- ogbn-products SAGE ----
    if not args.skip_products:
        try:
            pd_ = load_node_dataset("ogbn-products")
            gp = dgl_tpu.from_edges(pd_.src, pd_.dst, pd_.num_nodes)
            xp = jnp.asarray(pd_.features)
            yp = jnp.asarray(pd_.labels)
            mp = jnp.asarray(pd_.train_mask)
            xp_agg = gspmm_chunked(gp, "copy_u", "mean", xp, chunk=32)
            jax.block_until_ready(xp_agg)
            mprod = GraphSAGE(hidden_feats=64, out_feats=pd_.num_classes, num_layers=3)
            dt, times = epoch_time(mprod, gp, xp, yp, mp, {"x_agg": xp_agg}, epochs=4)
            log(args.out, stage="products_sage", epoch_s=round(dt, 4),
                vs_dgl_v100=round(0.3436 / dt, 2), times=[round(t, 3) for t in times])
        except Exception as e:
            log(args.out, stage="products_sage", error=repr(e)[:300])


if __name__ == "__main__":
    main()
