"""cgcnet_tpu — a TPU-native cell-graph GNN framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of CGC-Net
("Cell Graph Convolutional Network for Grading of Colorectal Cancer Histology
Images", ICCVW 2019; reference implementation surveyed in /root/repo/SURVEY.md):

- hierarchical GNN graph classification (adaptive GraphSAGE / GIN convolutions,
  DiffPool soft-cluster pooling, LSTM jumping knowledge, max readouts)
- cell-graph dataflow: nucleus appearance features, farthest-point / fused
  subsampling, radius-bounded kNN graph construction
- training/eval loops with image-level majority-vote metrics, checkpointing,
  3-fold cross-validation
- TPU-first execution: static-shape padded ELL graph layouts, Pallas sparse
  aggregation kernels, pjit/shard_map data- and graph-parallelism over device
  meshes.

The compute path is pure JAX (jit/pjit/Pallas); host-side graph construction
has a native C++ fast path (see ``native/``) with a NumPy fallback.
"""

__version__ = "0.1.0"

from cgcnet_tpu.config import ModelConfig, TrainConfig, DataConfig, Config
from cgcnet_tpu.core.graph import CellGraph, DenseGraph

__all__ = [
    "ModelConfig",
    "TrainConfig",
    "DataConfig",
    "Config",
    "CellGraph",
    "DenseGraph",
]
