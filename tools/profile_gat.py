"""Per-stage timing of the GAT attention pipeline on the current device.

Builds a reddit-shaped synthetic graph (same loader/ordering as the
benchmark driver), attaches lane plans, and times:

  1. fused lane attention forward (train layer shape h=1, dh=16)
  2. its value_and_grad (all three lane passes + hybrid remainder)
  3. the XLA attention path (gather + edge-softmax + gspmm), fwd and grad
  4. the output-layer shape (dh = num classes, always XLA — VMEM slab)

Gives the decomposition reddit-GAT epoch time optimization needs.
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])

import jax
import jax.numpy as jnp


def timed(fn, *args, reps=8, cold=2):
    fj = jax.jit(fn)
    c = jnp.float32(0.0)
    for _ in range(cold):
        c = fj(c, *args)
    float(c)
    t0 = time.perf_counter()
    for _ in range(reps):
        c = fj(c, *args)
    float(c)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="reddit")
    ap.add_argument("--dh", type=int, default=16)
    ap.add_argument("--heads", type=int, default=1)
    ap.add_argument("--keep", type=float, default=0.82)
    ap.add_argument("--dense-threshold", type=int, default=None,
                    help="None = auto-tuned, matching the benchmark driver "
                         "(and sharing its plan cache file)")
    ap.add_argument("--max-expansion", type=float, default=2.5)
    args = ap.parse_args()

    import dgl_tpu
    from dgl_tpu.data import load_node_dataset
    from dgl_tpu.data.loaders import data_root
    from dgl_tpu.graph import transforms
    from dgl_tpu.graph.reorder import apply_order, locality_order
    from dgl_tpu.kernels import attach_lane_plans
    from dgl_tpu.kernels.lane_attention import lane_gat_agg
    from dgl_tpu.ops import edge_softmax, gsddmm, gspmm
    from dgl_tpu.train.timing import chip_health_ms

    print("health ms:", round(chip_health_ms(), 2))
    data = load_node_dataset(args.dataset)
    src, dst = data.src, data.dst
    order = locality_order(src, dst, data.num_nodes, seed=0,
                           cache_dir=data_root(), cache_key=f"{args.dataset}_s1.0_gat")
    src, dst, _ = apply_order(order, src, dst)
    src, dst = transforms.add_self_loops(src, dst, data.num_nodes)
    g = attach_lane_plans(
        dgl_tpu.from_edges(src, dst, data.num_nodes),
        dense_threshold=args.dense_threshold, max_expansion=args.max_expansion,
        cache_dir=data_root(), cache_key=f"{args.dataset}_s1.0_gat",
    )
    n = data.num_nodes
    h, dh = args.heads, args.dh
    has_lane = g.lane is not None and g.reverse.lane is not None
    if has_lane:
        fp = g.lane.plan
        rp = g.reverse.lane.plan
        print(f"plans: fwd exp={fp.expansion:.2f} rem={len(fp.rem_src)/max(fp.num_edges_total,1):.2%} "
              f"rev exp={rp.expansion:.2f} rem={len(rp.rem_src)/max(rp.num_edges_total,1):.2%}")
    else:
        print("plans: none attached (profitability gate) — XLA path only")

    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((n, h, dh)).astype(np.float32))
    a_s = jnp.asarray(rng.standard_normal((n, h)).astype(np.float32))
    a_d = jnp.asarray(rng.standard_normal((n, h)).astype(np.float32))

    # graph/plans are jit ARGUMENTS (closed-over arrays are baked into the
    # HLO as constants and blow the remote compiler's request limit)
    def lane_fwd(c, gg, v, a_s, a_d):
        out = lane_gat_agg(
            gg.lane.plan, gg.reverse.lane.plan, v + c, a_s, a_d, n,
            fplan2=gg.lane.plan2, rplan2=gg.reverse.lane.plan2,
            rem_fwd=gg.lane.remainder, rem_fwd_eid=gg.lane.rem_eid,
            rem_rev=gg.reverse.lane.remainder, rem_rev_eid=gg.reverse.lane.rem_eid,
            attn_keep=args.keep, seed=3,
        )
        return jnp.sum(out) * 1e-30 + c

    def lane_grad(c, gg, v, a_s, a_d):
        def loss(v, a_s, a_d):
            out = lane_gat_agg(
                gg.lane.plan, gg.reverse.lane.plan, v, a_s, a_d, n,
                fplan2=gg.lane.plan2, rplan2=gg.reverse.lane.plan2,
                rem_fwd=gg.lane.remainder, rem_fwd_eid=gg.lane.rem_eid,
                rem_rev=gg.reverse.lane.remainder, rem_rev_eid=gg.reverse.lane.rem_eid,
                attn_keep=args.keep, seed=3,
            )
            return jnp.sum(out * out)
        l, gr = jax.value_and_grad(loss, argnums=(0, 1, 2))(v + c, a_s, a_d)
        return l * 1e-30 + sum(jnp.sum(x) for x in gr) * 1e-30 + c

    from dgl_tpu.nn.conv import _attn_bound
    from dgl_tpu.ops.gather import gather_src_rows as _gsr

    def xla_fwd(c, gg, v, a_s, a_d):
        # mirrors GATConv's XLA fallback: shared src row-gather, bound-shift
        # softmax (no segment-max scatter), fused copy_e aggregation
        el = gsddmm(gg, "add", (a_s + c)[:, :, None], a_d[:, :, None])
        z = jax.nn.leaky_relu(el, 0.2)
        alpha = edge_softmax(gg, z, dst_bound=_attn_bound(a_s + c, a_d, 0.2))
        hh, dd = v.shape[1], v.shape[2]
        msg = _gsr(gg, (v + c).reshape(n, hh * dd)).reshape(-1, hh, dd) * alpha[:, :hh, :]
        out = gspmm(gg, "copy_e", "sum", e=msg)
        return jnp.sum(out) * 1e-30 + c

    def xla_grad(c, gg, v, a_s, a_d):
        def loss(v, a_s, a_d):
            el = gsddmm(gg, "add", a_s[:, :, None], a_d[:, :, None])
            z = jax.nn.leaky_relu(el, 0.2)
            alpha = edge_softmax(gg, z, dst_bound=_attn_bound(a_s, a_d, 0.2))
            hh, dd = v.shape[1], v.shape[2]
            msg = _gsr(gg, v.reshape(n, hh * dd)).reshape(-1, hh, dd) * alpha[:, :hh, :]
            out = gspmm(gg, "copy_e", "sum", e=msg)
            return jnp.sum(out * out)
        l, gr = jax.value_and_grad(loss, argnums=(0, 1, 2))(v + c, a_s, a_d)
        return l * 1e-30 + sum(jnp.sum(x) for x in gr) * 1e-30 + c

    if has_lane:
        print("lane fwd        :", round(timed(lane_fwd, g, v, a_s, a_d), 4), "s", flush=True)
        print("lane fwd+grad   :", round(timed(lane_grad, g, v, a_s, a_d), 4), "s", flush=True)
    print("xla  fwd        :", round(timed(xla_fwd, g, v, a_s, a_d), 4), "s", flush=True)
    print("xla  fwd+grad   :", round(timed(xla_grad, g, v, a_s, a_d), 4), "s", flush=True)

    # ---- per-op decomposition of the XLA path (fwd + grad separately) ----
    from dgl_tpu.ops.gather import gather_src_rows

    def op_gather(c, gg, v, a_s, a_d):
        z = gather_src_rows(gg, (v + c).reshape(n, h * dh))
        return jnp.sum(z) * 1e-30 + c

    def op_gather_grad(c, gg, v, a_s, a_d):
        def loss(v):
            z = gather_src_rows(gg, v.reshape(n, h * dh))
            return jnp.sum(z * z)
        l, gr = jax.value_and_grad(loss)(v + c)
        return l * 1e-30 + jnp.sum(gr) * 1e-30 + c

    def op_logits(c, gg, v, a_s, a_d):
        el = gsddmm(gg, "add", (a_s + c)[:, :, None], a_d[:, :, None])
        return jnp.sum(el) * 1e-30 + c

    def op_softmax(c, gg, v, a_s, a_d):
        el = gsddmm(gg, "add", (a_s + c)[:, :, None], a_d[:, :, None])
        alpha = edge_softmax(gg, jax.nn.leaky_relu(el, 0.2),
                             dst_bound=_attn_bound(a_s + c, a_d, 0.2))
        return jnp.sum(alpha) * 1e-30 + c

    def op_softmax_grad(c, gg, v, a_s, a_d):
        def loss(a_s, a_d):
            el = gsddmm(gg, "add", a_s[:, :, None], a_d[:, :, None])
            alpha = edge_softmax(gg, jax.nn.leaky_relu(el, 0.2),
                                 dst_bound=_attn_bound(a_s, a_d, 0.2))
            return jnp.sum(alpha * alpha)
        l, gr = jax.value_and_grad(loss, argnums=(0, 1))(a_s + c, a_d)
        return l * 1e-30 + sum(jnp.sum(x) for x in gr) * 1e-30 + c

    def op_spmm_e(c, gg, v, a_s, a_d):
        msg = jnp.broadcast_to((v + c)[gg.src], (gg.num_edges_padded, h, dh))
        out = gspmm(gg, "copy_e", "sum", e=msg)
        return jnp.sum(out) * 1e-30 + c

    print("  op gather(E,HD) fwd :", round(timed(op_gather, g, v, a_s, a_d), 4), "s", flush=True)
    print("  op gather       grad:", round(timed(op_gather_grad, g, v, a_s, a_d), 4), "s", flush=True)
    print("  op logits   (E,H)   :", round(timed(op_logits, g, v, a_s, a_d), 4), "s", flush=True)
    print("  op softmax  (E,H)   :", round(timed(op_softmax, g, v, a_s, a_d), 4), "s", flush=True)
    print("  op softmax      grad:", round(timed(op_softmax_grad, g, v, a_s, a_d), 4), "s", flush=True)
    print("  op spmm copy_e fwd  :", round(timed(op_spmm_e, g, v, a_s, a_d), 4), "s", flush=True)

    c_out = data.num_classes
    v2 = jnp.asarray(rng.standard_normal((n, 1, c_out)).astype(np.float32))
    print("xla out-layer fwd+grad (dh={}):".format(c_out),
          round(timed(xla_grad, g, v2, a_s, a_d), 4), "s", flush=True)


if __name__ == "__main__":
    main()
