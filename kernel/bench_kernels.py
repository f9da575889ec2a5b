"""SpMM / SDDMM kernel microbenchmarks (reference L0 tier:
``kernel/dgl-new.py`` + ``kernel/utils.py``).

Same protocol: sweep feature sizes 2^0..2^7, 10 reps with 2 cold-start
skipped (``dgl-new.py:8,18-23``), per-size OOM caught (``:26-27``), datasets
reddit / ogbn-arxiv / ogbn-proteins (``utils.py:50-61``), binary-op ×
reduce-op axes from the CLI (``:48-58``).

TPU methodology: timing uses a scalar-carry chain + host fetch — plain
``block_until_ready`` under the remote TPU tunnel does not give reliable
per-op times (see dgl_tpu docs / tpu-gather-perf notes).
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/kernel/", 1)[0])

import jax
import jax.numpy as jnp

import dgl_tpu
from dgl_tpu.data import load_node_dataset
from dgl_tpu.ops import gsddmm, gspmm

N_REPEATS = 10
N_COLD_START = 2
FEAT_SIZES = [2**x for x in range(8)]
_CSV_PATH = None

# HBM roofline: v5e ≈ 819 GB/s (public spec). The % column reports
# min-traffic / (time × BW) where min-traffic is the information-theoretic
# floor for the op — node features read ONCE (perfect reuse), output written
# once, plus the edge structure stream. 100% = speed of light; the gap is
# gather replay + scatter machinery. Override via DGL_TPU_HBM_GBPS for other
# chips.
import os as _os

_HBM_BPS = float(_os.environ.get("DGL_TPU_HBM_GBPS", "819")) * 1e9


def _min_bytes(kind, graph, n_hid, itemsize=4):
    e = graph.num_edges
    n_src, n_dst = graph.num_src_nodes, graph.num_dst_nodes
    feat = n_hid * itemsize
    if kind == "spmm":  # read x once + edge ids + write out
        return n_src * feat + e * 4 + n_dst * feat
    if kind == "sddmm":  # read u,v once + 2 edge ids + write per-edge out
        return (n_src + n_dst) * feat + e * 8 + e * feat
    if kind == "scatter":  # materialized (E, D) message path: gather write+read
        return n_src * feat + e * 4 + 2 * e * feat + n_dst * feat
    return None


def _sol_pct(kind, graph, n_hid, seconds):
    b = _min_bytes(kind, graph, n_hid)
    if b is None or seconds <= 0:
        return ""
    return f"{100.0 * b / (_HBM_BPS * seconds):.1f}"


def _csv(dataset, kind, op, hidden, seconds, sol=""):
    if _CSV_PATH:
        import os
        new = not os.path.exists(_CSV_PATH)
        with open(_CSV_PATH, "a") as f:
            if new:
                f.write("dataset,kind,op,hidden,seconds,sol_pct\n")
            f.write(f"{dataset},{kind},{op},{hidden},{seconds},{sol}\n")


def bench_op(fn, *args):
    fj = jax.jit(fn)
    c = jnp.float32(0.0)
    for _ in range(N_COLD_START):
        c = fj(c, *args)
    float(c)
    t0 = time.perf_counter()
    for _ in range(N_REPEATS):
        c = fj(c, *args)
    float(c)  # hard sync
    return (time.perf_counter() - t0) / N_REPEATS


def bench_spmm(g, binary_op, reduce_op, scale):
    print("SPMM\n----")
    data = load_node_dataset(g, scale=scale)
    graph = dgl_tpu.from_edges(data.src, data.dst, data.num_nodes)
    rng = np.random.default_rng(0)
    for n_hid in FEAT_SIZES:
        try:
            nfeat = (
                jnp.asarray(rng.standard_normal((graph.num_src_nodes, n_hid)).astype(np.float32))
                if binary_op != "copy_rhs" else None
            )
            efeat = (
                jnp.asarray(rng.standard_normal((graph.num_edges_padded, n_hid)).astype(np.float32))
                if binary_op != "copy_lhs" else None
            )

            def run(c, nfeat=nfeat, efeat=efeat):
                x = None if nfeat is None else nfeat + c
                e = None if efeat is None else efeat + c
                out = gspmm(graph, binary_op, reduce_op, x=x, e=e)
                return jnp.sum(out) * 1e-30 + c

            avg = bench_op(run)
            sol = _sol_pct("spmm", graph, n_hid, avg)
            print("hidden size: {}, avg time: {}  (SOL {}%)".format(n_hid, avg, sol))
            _csv(g, "spmm", f"{binary_op}.{reduce_op}", n_hid, avg, sol)
        except Exception as e:  # OOM etc → report and continue (dgl-new.py:26)
            print("hidden size: {}, OOM/err: {}".format(n_hid, type(e).__name__))


def bench_spmm_lane(g, reduce_op, scale):
    """Pallas lane-kernel rows (forced — bypasses the profitability model so
    the table shows lane vs XLA crossover across the full width sweep).
    Graph gets the same locality reorder + plan attach as the drivers."""
    from dgl_tpu.graph.reorder import apply_order, locality_order
    from dgl_tpu.kernels import attach_lane_plans
    from dgl_tpu.ops.spmm import _lane_copy_u
    from dgl_tpu.data.loaders import data_root

    print("SPMM (lane kernel, forced)\n----")
    data = load_node_dataset(g, scale=scale)
    order = locality_order(data.src, data.dst, data.num_nodes,
                           cache_dir=data_root(), cache_key=f"{g}_s{scale}_kb")
    src, dst, *_ = apply_order(order, data.src, data.dst)
    graph = dgl_tpu.from_edges(src, dst, data.num_nodes)
    graph = attach_lane_plans(graph, cache_dir=data_root(),
                              cache_key=f"{g}_s{scale}_kb")
    if graph.lane is None:
        print("lane plans did not attach (graph tiles too sparsely); skipping")
        return
    rng = np.random.default_rng(0)
    for n_hid in FEAT_SIZES:
        try:
            nfeat = jnp.asarray(
                rng.standard_normal((graph.num_src_nodes, n_hid)).astype(np.float32))

            def run(c, nfeat=nfeat):
                out = _lane_copy_u(reduce_op, graph, nfeat + c)
                return jnp.sum(out) * 1e-30 + c

            avg = bench_op(run)
            sol = _sol_pct("spmm", graph, n_hid, avg)
            print("hidden size: {}, avg time: {}  (SOL {}%)".format(n_hid, avg, sol))
            _csv(g, "lane_spmm", f"copy_lhs.{reduce_op}", n_hid, avg, sol)
        except Exception as e:
            print("hidden size: {}, OOM/err: {}".format(n_hid, type(e).__name__))


def bench_sddmm(g, binary_op, scale):
    print("SDDMM\n----")
    data = load_node_dataset(g, scale=scale)
    graph = dgl_tpu.from_edges(data.src, data.dst, data.num_nodes)
    rng = np.random.default_rng(0)
    for n_hid in FEAT_SIZES:
        try:
            ufeat = jnp.asarray(rng.standard_normal((graph.num_src_nodes, n_hid)).astype(np.float32))
            vfeat = jnp.asarray(rng.standard_normal((graph.num_dst_nodes, n_hid)).astype(np.float32))

            def run(c, u=ufeat, v=vfeat):
                out = gsddmm(graph, binary_op, u + c, v + c, mask_padding=False)
                return jnp.sum(out) * 1e-30 + c

            avg = bench_op(run)
            sol = _sol_pct("sddmm", graph, n_hid, avg)
            print("hidden size: {}, avg time: {}  (SOL {}%)".format(n_hid, avg, sol))
            _csv(g, "sddmm", binary_op, n_hid, avg, sol)
        except Exception as e:
            print("hidden size: {}, OOM/err: {}".format(n_hid, type(e).__name__))


def bench_scatter(g, reduce_op, scale):
    """PyG-twin tier (reference K2, ``kernel/pyg-new.py``): the same
    aggregation expressed through the USER-LEVEL scatter API — an explicit
    edge gather followed by ``ops.segment_{sum,mean,max}`` — instead of the
    fused ``gspmm``. The gap between this sweep and the SPMM sweep is the
    fusion benefit the reference measures DGL-vs-PyG."""
    from dgl_tpu.ops import segment

    print("SCATTER (segment user ops)\n----")
    data = load_node_dataset(g, scale=scale)
    graph = dgl_tpu.from_edges(data.src, data.dst, data.num_nodes)
    seg_fn = {"sum": segment.segment_sum, "mean": segment.segment_mean,
              "max": segment.segment_max}[reduce_op]
    src = graph.src
    dst = graph.dst
    n_dst = graph.num_dst_nodes
    for n_hid in FEAT_SIZES:
        try:
            rng = np.random.default_rng(0)
            nfeat = jnp.asarray(
                rng.standard_normal((graph.num_src_nodes, n_hid)).astype(np.float32)
            )

            def run(c, nfeat=nfeat):
                msg = (nfeat + c)[src]  # explicit gather (scatter-API style)
                out = seg_fn(msg, dst, n_dst)
                return jnp.sum(out) * 1e-30 + c

            avg = bench_op(run)
            sol = _sol_pct("scatter", graph, n_hid, avg)
            print("hidden size: {}, avg time: {}  (SOL {}%)".format(n_hid, avg, sol))
            _csv(g, "scatter", f"gather.segment_{reduce_op}", n_hid, avg, sol)
        except Exception as e:
            print("hidden size: {}, OOM/err: {}".format(n_hid, type(e).__name__))


if __name__ == "__main__":
    parser = argparse.ArgumentParser("benchmark on g-spmm and g-sddmm (dgl_tpu)")
    parser.add_argument("--spmm-binary", type=str, default="copy_lhs",
                        choices=["add", "sub", "mul", "div", "copy_lhs", "copy_rhs"])
    parser.add_argument("--spmm-reduce", type=str, default="sum",
                        choices=["sum", "mean", "max", "min"])
    parser.add_argument("--sddmm-binary", type=str, default="add",
                        choices=["add", "sub", "mul", "div", "dot"])
    parser.add_argument("-g", "--gpu", type=str, default="0", help="unused (TPU)")
    parser.add_argument("--datasets", type=str, default="reddit,ogbn-arxiv,ogbn-proteins")
    parser.add_argument("--scale", type=float, default=1.0)
    parser.add_argument("--skip-sddmm", action="store_true")
    parser.add_argument("--skip-spmm", action="store_true")
    parser.add_argument("--lane", action="store_true",
                        help="also sweep the forced Pallas lane-kernel path "
                             "(locality reorder + plan attach)")
    parser.add_argument("--scatter", action="store_true",
                        help="also sweep the user-level scatter API "
                             "(gather + segment_* — the PyG-twin tier)")
    parser.add_argument("--csv", type=str, default=None,
                        help="append rows (dataset,kind,op,hidden,seconds) to this CSV")
    args = parser.parse_args()
    print(args)
    _CSV_PATH = args.csv
    globals()["_CSV_PATH"] = args.csv
    for dataset in args.datasets.split(","):
        print("benchmarking on:", dataset)
        if not args.skip_spmm:
            bench_spmm(dataset, args.spmm_binary, args.spmm_reduce, args.scale)
        if not args.skip_sddmm:
            bench_sddmm(dataset, args.sddmm_binary, args.scale)
        if args.scatter:
            reduce = args.spmm_reduce if args.spmm_reduce != "min" else "max"
            bench_scatter(dataset, reduce, args.scale)
        if args.lane:
            reduce = args.spmm_reduce if args.spmm_reduce in ("sum", "mean") else "sum"
            bench_spmm_lane(dataset, reduce, args.scale)
