from .sage import GraphSAGE
from .gat import GAT
from .gcn_graph import GCNGraphClassifier, GCNMolClassifier
from .rgcn import RGCN
from .gcmc import GCMCNet

__all__ = ["GraphSAGE", "GAT", "GCNGraphClassifier", "GCNMolClassifier", "RGCN", "GCMCNet"]
