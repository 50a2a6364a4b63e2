from cgcnet_tpu.dataflow.proto import PatchProto, save_proto, load_proto
from cgcnet_tpu.dataflow.dataset import NucleiGraphDataset, CROSS_VAL_FOLDS
from cgcnet_tpu.dataflow.loader import GraphLoader
from cgcnet_tpu.dataflow.rng import patch_rng

__all__ = [
    "PatchProto",
    "save_proto",
    "load_proto",
    "NucleiGraphDataset",
    "CROSS_VAL_FOLDS",
    "GraphLoader",
    "patch_rng",
]
