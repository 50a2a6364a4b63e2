"""Shared whole-slide input construction for the mega path.

One pipeline — normalize, spatially band-sort, pad to the shard multiple,
build the radius graph (native grid hash when available), partition, and
(on TPU backends) build the per-shard BSR tables — used by both the slide
CLI (cgcnet_tpu/cli/slide.py) and the slide train-step benchmark
(benchmarks/slide_step.py), so production and measurement can never drift
apart on graph construction.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import numpy as np


@dataclass
class SlideBuild:
    """Device-ready mega inputs plus the construction facts callers report."""

    inputs: object          # mega_model.MegaInputs
    part: object            # mega_graph.ShardedGraphPartition
    n: int                  # real nuclei
    cap: int                # padded node capacity (multiple of 128*shards)
    input_dim: int
    edges: int              # real (masked) ELL edges
    bsr: bool               # Pallas BSR tables built
    t_graph_s: float        # radius-graph build time
    t_part_s: float         # partition (+BSR table) time


def synthetic_slide(nuclei: int, seed: int = 0):
    """Synthetic slide at the reference's ~5000 nuclei / 3584px tile density
    (same generator the slide CLI demo has always used)."""
    rng = np.random.default_rng(seed)
    side = 3584.0 * max(1.0, np.sqrt(nuclei / 5000.0))
    coords = rng.uniform(0, side, (nuclei, 2)).astype(np.float32)
    feats = (rng.normal(size=(nuclei, 16)) * 10 + 40).astype(np.float32)
    return feats, coords


def build_slide_inputs(cfg, feats, coords, shards, mesh) -> SlideBuild:
    """feats [N, F_raw], coords [N, 2] -> sharded MegaInputs on ``mesh``.

    Normalization uses the reference per-fold stats tables
    (dataflow/stats.py); BSR tables are built only on TPU backends, where
    the Pallas aggregation kernel runs (XLA gathers elsewhere).
    """
    import jax

    from cgcnet_tpu.dataflow import native, stats as stats_mod
    from cgcnet_tpu.ops.knn import radius_knn_np
    from cgcnet_tpu.parallel.mega_graph import partition_graph
    from cgcnet_tpu.parallel.mega_model import prepare_mega_inputs

    n = len(coords)
    mean, std = stats_mod.reference_stats(
        cfg.data.cross_val, cfg.data.feature_type
    )
    band = np.floor(coords[:, 0] / cfg.data.max_edge_distance)
    order = np.lexsort((coords[:, 1], band))
    feats, coords = feats[order], coords[order]
    x = (np.concatenate([feats, coords], -1) - mean) / std

    cap = -(-n // (128 * shards)) * (128 * shards)
    xp = np.zeros((cap, x.shape[1]), np.float32)
    xp[:n] = x

    t0 = time.perf_counter()
    if native.available():
        nbr, mask = native.radius_knn(
            coords, cfg.data.max_edge_distance, cfg.data.max_neighbours
        )
    else:
        nbr, mask = radius_knn_np(
            coords, cfg.data.max_edge_distance, cfg.data.max_neighbours
        )
    # pad rows point at themselves with zero mask (no phantom edges)
    nbrp = np.tile(np.arange(cap, dtype=np.int32)[:, None], (1, nbr.shape[1]))
    maskp = np.zeros((cap, nbr.shape[1]), np.float32)
    nbrp[:n], maskp[:n] = nbr, mask
    t_graph = time.perf_counter() - t0

    t0 = time.perf_counter()
    part = partition_graph(nbrp, maskp, shards)
    tables = None
    if jax.default_backend() == "tpu":
        from cgcnet_tpu.parallel.mega_graph import build_bsr_tables

        tables = build_bsr_tables(part)
    t_part = time.perf_counter() - t0
    inputs = prepare_mega_inputs(xp, part, mesh, n_real=n, bsr=tables)

    return SlideBuild(
        inputs=inputs,
        part=part,
        n=n,
        cap=cap,
        input_dim=x.shape[1],
        edges=int(maskp.sum()),
        bsr=tables is not None,
        t_graph_s=t_graph,
        t_part_s=t_part,
    )
