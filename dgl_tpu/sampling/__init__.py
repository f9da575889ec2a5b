from .dataloader import GraphBatchLoader, prefetch
from .neighbor import CSRGraph, MultiLayerNeighborSampler, NodeDataLoader, MiniBatch
from .device import DeviceNeighborSampler
from .cluster import ClusterIter, ClusterBatch

__all__ = [
    "GraphBatchLoader",
    "prefetch",
    "CSRGraph",
    "MultiLayerNeighborSampler",
    "DeviceNeighborSampler",
    "NodeDataLoader",
    "MiniBatch",
    "ClusterIter",
    "ClusterBatch",
]
