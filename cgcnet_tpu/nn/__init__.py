from cgcnet_tpu.nn.adjacency import EllAdj, DenseAdj
from cgcnet_tpu.nn.layers import GATConv, SAGEConv, GINConv, TorchBatchNorm, activation
from cgcnet_tpu.nn.jk import DenseJK
from cgcnet_tpu.nn.blocks import GNNBlock, diff_pool
from cgcnet_tpu.nn.model import CGCNet

__all__ = [
    "EllAdj",
    "DenseAdj",
    "SAGEConv",
    "GATConv",
    "GINConv",
    "TorchBatchNorm",
    "activation",
    "DenseJK",
    "GNNBlock",
    "diff_pool",
    "CGCNet",
]
