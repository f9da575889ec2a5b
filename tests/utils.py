"""Dense NumPy oracles for the message-passing ops (tests only).

The reference has no unit tests (SURVEY §4); these oracles are the
correctness layer we add: every kernel is checked against a dense
adjacency-matrix computation on tiny random graphs.
"""

import numpy as np


def random_graph(rng, n_src, n_dst, n_edges, *, self_loops=True):
    src = rng.integers(0, n_src, size=n_edges).astype(np.int64)
    dst = rng.integers(0, n_dst, size=n_edges).astype(np.int64)
    return src, dst


def dense_spmm(src, dst, n_src, n_dst, x, e, op, reduce):
    """out[v] = reduce over edges (u->v) of op(x[u], e[edge])."""
    D = np.broadcast_shapes(
        x.shape[1:] if x is not None else (), e.shape[1:] if e is not None else ()
    )
    out = np.zeros((n_dst,) + D, dtype=np.float64)
    cnt = np.zeros(n_dst, dtype=np.int64)
    if reduce == "max":
        out[:] = -np.inf
    if reduce == "min":
        out[:] = np.inf
    for i in range(len(src)):
        u, v = src[i], dst[i]
        xe = x[u] if x is not None else None
        ee = e[i] if e is not None else None
        if op in ("copy_u", "copy_lhs"):
            m = xe
        elif op in ("copy_e", "copy_rhs"):
            m = ee
        elif op == "add":
            m = xe + ee
        elif op == "sub":
            m = xe - ee
        elif op == "mul":
            m = xe * ee
        elif op == "div":
            m = xe / ee
        else:
            raise ValueError(op)
        if reduce in ("sum", "mean"):
            out[v] += m
        elif reduce == "max":
            out[v] = np.maximum(out[v], m)
        elif reduce == "min":
            out[v] = np.minimum(out[v], m)
        cnt[v] += 1
    if reduce == "mean":
        out = out / np.maximum(cnt, 1).reshape((-1,) + (1,) * (out.ndim - 1))
    if reduce in ("max", "min"):
        out[~np.isfinite(out)] = 0.0
        out[cnt == 0] = 0.0
    return out


def dense_sddmm(src, dst, u, v, op):
    ue = u[src] if u is not None else None
    ve = v[dst] if v is not None else None
    if op in ("copy_u", "copy_lhs"):
        return ue
    if op in ("copy_v", "copy_rhs"):
        return ve
    if op == "add":
        return ue + ve
    if op == "sub":
        return ue - ve
    if op == "mul":
        return ue * ve
    if op == "div":
        return ue / ve
    if op == "dot":
        return np.sum(ue * ve, axis=-1, keepdims=True)
    raise ValueError(op)


def dense_edge_softmax(src, dst, n_dst, logits):
    out = np.zeros_like(logits)
    for v in range(n_dst):
        idx = np.where(dst == v)[0]
        if len(idx) == 0:
            continue
        z = logits[idx]
        z = z - z.max(axis=0, keepdims=True)
        ez = np.exp(z)
        out[idx] = ez / ez.sum(axis=0, keepdims=True)
    return out
