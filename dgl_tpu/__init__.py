"""dgl_tpu — a TPU-native graph neural network framework.

Built from scratch on JAX/XLA/Pallas to cover the full capability surface of
the ``dglai/dgl-0.5-benchmark`` suite (see SURVEY.md): an immutable
static-shape graph tensor, fused message-passing kernels (SpMM / SDDMM /
edge-softmax), a functional NN layer zoo (SAGE, GAT, GCN, RGCN, GCMC),
sampling + partitioning pipelines, and mesh-sharded multi-chip execution.
"""

__version__ = "0.1.0"

from .graph import (
    Graph,
    GraphBatch,
    HeteroGraph,
    batch_graphs,
    from_edges,
    from_scipy_coo,
    readout,
)
from . import ops
from . import graph

__all__ = [
    "Graph",
    "GraphBatch",
    "HeteroGraph",
    "batch_graphs",
    "from_edges",
    "from_scipy_coo",
    "readout",
    "ops",
    "graph",
]
