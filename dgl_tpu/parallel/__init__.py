from .spmd import (
    device_mesh,
    replicated,
    graph_sharding,
    node_sharding,
    shard_graph,
)

__all__ = [
    "device_mesh",
    "replicated",
    "graph_sharding",
    "node_sharding",
    "shard_graph",
]
