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
    halo_gat_boundary,
)
from .halo_train import (
    halo_sage_init,
    halo_sage_apply,
    halo_gat_init,
    halo_gat_apply,
    make_halo_train_step,
    exchange_stats,
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
    "halo_sage_init",
    "halo_sage_apply",
    "halo_gat_boundary",
    "halo_gat_init",
    "halo_gat_apply",
    "make_halo_train_step",
    "exchange_stats",
    "stack_minibatches",
    "make_dp_train_step",
]
