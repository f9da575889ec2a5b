from .graph import Graph, from_edges, from_scipy_coo, pad_length
from .batch import GraphBatch, batch_graphs, readout
from .hetero import HeteroGraph
from . import transforms

__all__ = [
    "Graph",
    "from_edges",
    "from_scipy_coo",
    "pad_length",
    "GraphBatch",
    "batch_graphs",
    "readout",
    "HeteroGraph",
    "transforms",
]
