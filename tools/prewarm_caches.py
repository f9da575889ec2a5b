"""Pre-warm host-side caches (locality orders + lane-plan npz) on CPU.

The lane-plan cache is keyed by content hash + planner version
(`dgl_tpu/kernels/attach.py`), so bumping ``_PLAN_CACHE_VERSION``
invalidates every existing plan file. Plan building is pure NumPy — it
needs no TPU — but it costs minutes at products scale and ~1 min at
reddit scale PER PROCESS, which is exactly the budget a suite row or the
end-of-round ``bench.py`` run can't afford to burn. This tool replays the
exact graph construction of every lane-kernel consumer (bench.py,
main_sage.py, main_gat.py — bidirect/self-loop order and cache keys must
match byte-for-byte or the cache misses) and populates the caches.

Run after any ``_PLAN_CACHE_VERSION`` bump: ``python tools/prewarm_caches.py``
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("DGL_TPU_PLATFORM", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import dgl_tpu  # noqa: E402
from dgl_tpu.data.loaders import data_root, load_node_dataset  # noqa: E402
from dgl_tpu.graph import transforms  # noqa: E402
from dgl_tpu.graph.reorder import apply_order, locality_order  # noqa: E402
from dgl_tpu.kernels import attach_lane_plans  # noqa: E402

# (dataset, bidirect, self_loops, order/plan cache key) — one row per
# lane-kernel call site; keys mirror the argparse defaults (seed=0, scale=1.0)
TARGETS = [
    ("reddit", False, False, "reddit"),            # bench.py
    ("reddit", False, False, "reddit_s1.0"),       # main_sage --lane-kernel
    ("ogbn-arxiv", True, False, "ogbn-arxiv_s1.0"),
    ("reddit", False, True, "reddit_s1.0_gat"),    # main_gat --lane-kernel
    ("ogbn-arxiv", True, True, "ogbn-arxiv_s1.0_gat"),
]


def main():
    for dataset, bidirect, self_loops, key in TARGETS:
        t0 = time.time()
        data = load_node_dataset(dataset, seed=0, scale=1.0)
        src, dst = data.src, data.dst
        if bidirect:
            src, dst = transforms.to_bidirected(src, dst, data.num_nodes)
        order = locality_order(src, dst, data.num_nodes, seed=0,
                               cache_dir=data_root(), cache_key=key)
        src, dst, _ = apply_order(order, src, dst)
        if self_loops:
            src, dst = transforms.add_self_loops(src, dst, data.num_nodes)
        g = dgl_tpu.from_edges(src, dst, data.num_nodes)
        g = attach_lane_plans(g, cache_dir=data_root(), cache_key=key)
        lane = "attached" if g.lane is not None else "skipped (too sparse)"
        print(f"{key}: E={len(src)} lane={lane} [{time.time() - t0:.0f}s]",
              flush=True)


if __name__ == "__main__":
    main()
