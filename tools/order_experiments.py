"""Offline experiments: node-ordering strategies vs the lane cost model.

The lane kernel's speed is a pure function of (ordering, plan config); the
auto-tuner's counting cost model (`kernels.attach.choose_plan_config`)
scores an ordering without touching a TPU. This script compares ordering
strategies on the suite graphs (both plan directions, like attach does)
so ordering changes can be validated host-side before hardware time.

Usage: python tools/order_experiments.py [--dataset ogbn-arxiv] [--gat]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("DGL_TPU_PLATFORM", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from dgl_tpu.data.loaders import data_root, load_node_dataset  # noqa: E402
from dgl_tpu.graph import transforms  # noqa: E402
from dgl_tpu.graph.partition import partition_assignment  # noqa: E402
from dgl_tpu.graph.reorder import apply_order, locality_order  # noqa: E402
from dgl_tpu.kernels.attach import choose_plan_config  # noqa: E402


def score(src, dst, label):
    wf, tf, f = choose_plan_config(src, dst)
    wr, tr, r = choose_plan_config(dst, src)
    cost = (f["cost_ns"] + r["cost_ns"]) / 1e6
    print(f"{label:34s} cost={cost:8.2f}ms  fwd(w={wf},t={tf} "
          f"rem={f['rem_frac']:.1%} exp={f['expansion']:.2f})  "
          f"rev(w={wr},t={tr} rem={r['rem_frac']:.1%} "
          f"exp={r['expansion']:.2f})", flush=True)
    return cost


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="ogbn-arxiv")
    ap.add_argument("--gat", action="store_true", help="add self loops")
    args = ap.parse_args()

    data = load_node_dataset(args.dataset, seed=0, scale=1.0)
    n = data.num_nodes
    src, dst = data.src, data.dst
    if args.dataset in ("ogbn-arxiv", "ogbn-products"):
        src, dst = transforms.to_bidirected(src, dst, n)
    print(f"{args.dataset}: N={n} E={len(src)}")

    # shared partition (the expensive step) — reuse across strategies
    k = max(n // 1024, 2)
    t0 = time.time()
    part = partition_assignment(src, dst, n, k, method="metis", seed=0,
                                cache_dir=data_root(),
                                cache_key=f"exp_{args.dataset}_locality")
    print(f"partition: k={k} [{time.time() - t0:.0f}s]")

    def finish(order):
        s, d, _ = apply_order(order, src, dst)
        if args.gat:
            s, d = transforms.add_self_loops(s, d, n)
        return s, d

    # A. baseline: dataset order
    score(*finish(np.arange(n)), "A dataset order")

    # B. current locality_order (hubs + part-id blocks)
    order_b = locality_order(src, dst, n, part=part)
    score(*finish(order_b), "B hubs + blocks (current)")

    deg = np.bincount(src, minlength=n) + np.bincount(dst, minlength=n)
    hub_count = min(n // 16, 8192)
    hubs = np.argpartition(-deg, hub_count)[:hub_count]
    hubs = hubs[np.argsort(-deg[hubs], kind="stable")]
    is_hub = np.zeros(n, bool)
    is_hub[hubs] = True

    # block graph: edge weights between partition blocks (hubs excluded)
    pe_s, pe_d = part[src], part[dst]
    m = ~(is_hub[src] | is_hub[dst]) & (pe_s != pe_d)
    bkey = pe_s[m].astype(np.int64) * k + pe_d[m]
    ukey, w = np.unique(bkey, return_counts=True)
    bs, bd = (ukey // k).astype(np.int64), (ukey % k).astype(np.int64)

    def rcm_blocks():
        """Reverse Cuthill-McKee on the weighted block graph."""
        import scipy.sparse as sp
        from scipy.sparse.csgraph import reverse_cuthill_mckee

        a = sp.coo_matrix((w, (bs, bd)), shape=(k, k)).tocsr()
        a = a + a.T
        return np.asarray(reverse_cuthill_mckee(a, symmetric_mode=True))

    def greedy_blocks():
        """Order blocks by repeatedly taking the block most connected to
        the tail window of already-placed blocks."""
        import scipy.sparse as sp

        a = (sp.coo_matrix((w, (bs, bd)), shape=(k, k)).tocsr())
        a = (a + a.T).tolil()
        placed = np.zeros(k, bool)
        out = []
        gain = np.zeros(k)
        cur = int(np.argmax(np.asarray(a.sum(axis=1)).ravel()))
        for _ in range(k):
            placed[cur] = True
            out.append(cur)
            gain[cur] = -1
            rows, vals = a.rows[cur], a.data[cur]
            for j, v in zip(rows, vals):
                if not placed[j]:
                    gain[j] += v
            nxt = int(np.argmax(gain))
            if gain[nxt] <= 0:
                rem = np.where(~placed)[0]
                if not len(rem):
                    break
                deg_rem = np.asarray(a[rem].sum(axis=1)).ravel()
                nxt = int(rem[np.argmax(deg_rem)])
            cur = nxt
        return np.asarray(out)

    def order_from_block_seq(bseq, align):
        """hubs first, then whole blocks in bseq order; align=True pads
        each block's start to the next 128 boundary (bucket alignment) by
        borrowing from the next block — realized as stable grouping when
        False."""
        rest_parts = part.copy()
        rest = np.where(~is_hub)[0]
        rank = np.empty(k, np.int64)
        rank[bseq] = np.arange(k)
        rest = rest[np.argsort(rank[rest_parts[rest]], kind="stable")]
        return np.concatenate([hubs, rest])

    try:
        order_c = order_from_block_seq(rcm_blocks(), align=False)
        score(*finish(order_c), "C hubs + RCM blocks")
    except ImportError:
        print("scipy unavailable — skipping RCM")

    order_d = order_from_block_seq(greedy_blocks(), align=False)
    score(*finish(order_d), "D hubs + greedy-affinity blocks")

    # E. no hubs, greedy blocks only (does hub extraction still pay?)
    rank = np.empty(k, np.int64)
    rank[greedy_blocks()] = np.arange(k)
    order_e = np.argsort(rank[part], kind="stable")
    score(*finish(order_e), "E greedy blocks, no hubs")

    # F. hub variation: 4096 hubs
    hc2 = min(n // 32, 4096)
    hubs2 = np.argpartition(-deg, hc2)[:hc2]
    hubs2 = hubs2[np.argsort(-deg[hubs2], kind="stable")]
    is_hub2 = np.zeros(n, bool)
    is_hub2[hubs2] = True
    rest2 = np.where(~is_hub2)[0]
    rank = np.empty(k, np.int64)
    rank[greedy_blocks()] = np.arange(k)
    rest2 = rest2[np.argsort(rank[part[rest2]], kind="stable")]
    score(*finish(np.concatenate([hubs2, rest2])), "F 4096 hubs + greedy blocks")


if __name__ == "__main__":
    main()
