from cgcnet_tpu.core.graph import CellGraph, DenseGraph, node_mask
from cgcnet_tpu.core import convert

__all__ = ["CellGraph", "DenseGraph", "node_mask", "convert"]
