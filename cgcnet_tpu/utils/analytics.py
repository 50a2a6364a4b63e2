"""Dataset analytics (reference dev tools, common/utils.py:131-164):
max-node scan and feature statistics over a proto tree."""

from __future__ import annotations

import numpy as np

from cgcnet_tpu.dataflow.proto import list_protos, load_proto
from cgcnet_tpu.dataflow.stats import compute_stats


def max_nodes_in_dataset(
    root: str, folds: list[str], dataset: str = "colorectal"
) -> tuple[list[int], int]:
    counts = [
        load_proto(root, n, dataset).num_nodes
        for n in list_protos(root, folds, dataset)
    ]
    return counts, max(counts) if counts else 0


def dataset_feature_stats(
    root: str, folds: list[str], dataset: str = "colorectal"
) -> tuple[np.ndarray, np.ndarray]:
    feats = [
        load_proto(root, n, dataset).full_features()
        for n in list_protos(root, folds, dataset)
    ]
    return compute_stats(feats)
