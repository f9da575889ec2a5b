from .dataloader import GraphBatchLoader, prefetch
from .neighbor import CSRGraph, MultiLayerNeighborSampler, NodeDataLoader, MiniBatch
from .cluster import ClusterIter, ClusterBatch

__all__ = [
    "GraphBatchLoader",
    "prefetch",
    "CSRGraph",
    "MultiLayerNeighborSampler",
    "NodeDataLoader",
    "MiniBatch",
    "ClusterIter",
    "ClusterBatch",
]
