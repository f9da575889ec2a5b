"""Calibrate the lane-plan auto-tuner's cost model on real hardware.

Measures, per gather-window width:
  * lane_spmm per-slot nanoseconds (copy_u, D=16 and D=128) on a fully
    dense synthetic plan (expansion ~1.0 so slots ≈ edges), and
  * the XLA hybrid path's per-edge nanoseconds (row gather + segment
    reduce) on the same graph,
then prints suggested values for ``dgl_tpu.kernels.attach._SLOT_NS``,
``_SUBGATHER_FRAC`` and ``_REM_NS``. Bump ``_PLAN_CACHE_VERSION`` when
updating the constants (the tuner's cached choices go stale).

Run on the TPU: ``python tools/calibrate_lane.py``
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def _dense_graph(rng, n_src, n_dst, epp):
    """Every (1024-dst-group, 128-src-bucket) pair holds ``epp`` edges →
    plans at any window have expansion ~1.0."""
    groups = n_dst // 1024
    buckets = n_src // 128
    src, dst = [], []
    for g in range(groups):
        for b in range(buckets):
            src.append(b * 128 + rng.integers(0, 128, epp))
            dst.append(g * 1024 + rng.integers(0, 1024, epp))
    return np.concatenate(src), np.concatenate(dst)


def main():
    from dgl_tpu.kernels.lane_spmm import build_plan, lane_spmm
    from dgl_tpu.ops import gspmm
    from dgl_tpu.train.timing import time_fn
    import dgl_tpu

    rng = np.random.default_rng(0)
    n_src, n_dst, epp = 128 * 256, 1024 * 32, 360  # ~11.8M edges
    src, dst = _dense_graph(rng, n_src, n_dst, epp)
    e = len(src)
    print(f"calibration graph: N_src={n_src} N_dst={n_dst} E={e}")

    results = {}
    for d in (16, 128):
        x = jnp.asarray(rng.standard_normal((n_src, d)).astype(np.float32))
        for window in (128, 256, 512, 1024, 2048, 4096, 8192):
            plan = build_plan(src, dst, n_src, n_dst, dense_threshold=1,
                              window=window)
            slots = plan.num_chunks * 256 * 128
            fn = jax.jit(lambda x, p=plan: lane_spmm(p, x))
            t = time_fn(lambda: fn(x), reps=10, warmup=2)
            ns = t * 1e9 / slots
            results[(d, window)] = ns
            print(f"D={d:4d} window={window:5d}: {t*1e3:7.2f} ms "
                  f"({ns:.2f} ns/slot, slots={slots/1e6:.1f}M)")

    # XLA hybrid path per-edge cost on the same graph
    g = dgl_tpu.from_edges(src, dst, n_src if n_src >= n_dst else n_dst)
    for d in (16, 128):
        x = jnp.asarray(rng.standard_normal((g.num_src_nodes, d)).astype(np.float32))
        fn = jax.jit(lambda x: gspmm(g, "copy_u", "sum", x=x))
        t = time_fn(lambda: fn(x), reps=10, warmup=2)
        print(f"XLA copy_u/sum D={d:4d}: {t*1e3:7.2f} ms ({t*1e9/e:.2f} ns/edge)")

    base16 = results.get((16, 128))
    if base16:
        fracs = [(results[(16, w)] / base16 - 1) / (w // 128 - 1)
                 for w in (256, 512, 1024) if (16, w) in results]
        print(f"\nsuggested _SLOT_NS = {base16:.2f}")
        if fracs:
            print(f"suggested _SUBGATHER_FRAC = {np.mean(fracs):.3f}")
        print("suggested _REM_NS = (XLA ns/edge above; use the D the "
              "workload runs at; attention pays ~2x)")


if __name__ == "__main__":
    main()
