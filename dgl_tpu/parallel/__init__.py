from .spmd import (
    device_mesh,
    replicated,
    graph_sharding,
    node_sharding,
    shard_graph,
)
from .halo import (
    ShardedGraph,
    shard_fullgraph,
    halo_spmm,
    place,
    BoundarySharded,
    shard_fullgraph_boundary,
    halo_spmm_boundary,
)
from .dp import stack_minibatches, make_dp_train_step

__all__ = [
    "device_mesh",
    "replicated",
    "graph_sharding",
    "node_sharding",
    "shard_graph",
    "ShardedGraph",
    "shard_fullgraph",
    "halo_spmm",
    "place",
    "BoundarySharded",
    "shard_fullgraph_boundary",
    "halo_spmm_boundary",
    "stack_minibatches",
    "make_dp_train_step",
]
