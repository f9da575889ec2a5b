from .synthetic import (
    NODE_DATASET_STATS,
    GRAPH_DATASET_STATS,
    NodeClassificationData,
    GraphClassificationData,
    synthetic_node_classification,
    synthetic_graph_classification,
)
from .loaders import load_node_dataset, load_graph_dataset, data_root

__all__ = [
    "NODE_DATASET_STATS",
    "GRAPH_DATASET_STATS",
    "NodeClassificationData",
    "GraphClassificationData",
    "synthetic_node_classification",
    "synthetic_graph_classification",
    "load_node_dataset",
    "load_graph_dataset",
    "data_root",
]
