"""Edge softmax — numerically stable softmax over in-edges of each node.

TPU-native equivalent of DGL's ``edge_softmax`` (the core of every GAT
workload: N5–N7, S3, S4, S6 in SURVEY §2.1; the math is spelled out in the
PyG twin ``main_pyg_arxiv_gat.py:103-105``): per destination node ``v``::

    alpha[e] = exp(z[e] - max_{e'→v} z[e']) / sum_{e'→v} exp(...)

Composed from a sorted segment-max (SDDMM-style), an exp, a sorted
segment-sum and a gather — exactly the decomposition DGL fuses natively; XLA
fuses the elementwise stages, and the two segment reductions are the same
primitive the Pallas SpMM kernel accelerates.

Padded edges produce garbage alpha values but are dropped by the downstream
scatter (their dst is the out-of-range sentinel); apply ``g.edge_mask`` if
the raw values are consumed directly.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..graph.graph import Graph
from .segment import segment_sum
from .gather import gather_dst
import jax

__all__ = ["edge_softmax"]


def edge_softmax(g: Graph, logits: jnp.ndarray) -> jnp.ndarray:
    """Softmax of (E_pad, ...) edge logits grouped by destination node.

    Trailing dims (e.g. attention heads) are independent.
    """
    n = g.num_dst_nodes
    # mask padded logits to -inf so they never affect the max
    m = g.edge_mask(jnp.bool_).reshape((-1,) + (1,) * (logits.ndim - 1))
    z = jnp.where(m, logits, -jnp.inf)
    seg_max = jax.ops.segment_max(z, g.dst, num_segments=n, indices_are_sorted=True)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    # dst-side spreads use the scan-based gather (see ops/gather.py) — on
    # TPU this avoids two per-row E-gathers per softmax
    shifted = jnp.where(m, logits - gather_dst(g, seg_max), -jnp.inf)
    expz = jnp.exp(shifted)
    denom = segment_sum(expz, g.dst, n, sorted=True)
    denom = gather_dst(g, denom)
    return expz / jnp.maximum(denom, jnp.finfo(expz.dtype).tiny)
