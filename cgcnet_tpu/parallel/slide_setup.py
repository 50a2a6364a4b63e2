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
    caps: "SlideCaps | None" = None  # sticky caps actually used


@dataclass
class SlideCaps:
    """Sticky shape caps for multi-slide streaming.

    Every per-slide table dimension that varies with graph structure (halo
    capacity P, BSR blocks per row tile M/MT, transpose ELL width KT) is
    padded UP to these caps so consecutive slides of the same node capacity
    share one compiled executable — the same sticky-cap idea the patch
    loader uses for its BSR tables. ``grow`` quantizes a slide's needs up
    (P to 64, KT to 4, M/MT to 2) so one slightly-denser slide doesn't
    recompile the stream; a grown cap is carried forward by the caller.
    """

    halo_p: int = 0
    kt: int = 0
    m: int = 0
    mt: int = 0

    @staticmethod
    def _q(v: int, q: int) -> int:
        return -(-max(v, 1) // q) * q

    def grown(self, halo_p: int, kt: int, m: int, mt: int) -> "SlideCaps":
        return SlideCaps(
            halo_p=max(self.halo_p, self._q(halo_p, 64)),
            kt=max(self.kt, self._q(kt, 4)),
            m=max(self.m, self._q(m, 2)),
            mt=max(self.mt, self._q(mt, 2)),
        )


def synthetic_slide(nuclei: int, seed: int = 0):
    """Synthetic slide at the reference's ~5000 nuclei / 3584px tile density
    (same generator the slide CLI demo has always used)."""
    rng = np.random.default_rng(seed)
    side = 3584.0 * max(1.0, np.sqrt(nuclei / 5000.0))
    coords = rng.uniform(0, side, (nuclei, 2)).astype(np.float32)
    feats = (rng.normal(size=(nuclei, 16)) * 10 + 40).astype(np.float32)
    return feats, coords


def _build_part_tables(nbrp, maskp, shards, caps, want_bsr):
    """Partition + BSR tables, padded to sticky ``caps`` when given.

    Returns (part, tables, caps_used). A slide that outgrows the caps falls
    back to a plain build, grows the caps (quantized — SlideCaps.grown), and
    rebuilds padded so the stream's compiled shapes stay stable."""
    from cgcnet_tpu.parallel.mega_graph import (
        build_bsr_tables,
        partition_graph,
    )

    if caps is not None and caps.halo_p:
        try:
            part = partition_graph(
                nbrp, maskp, shards, halo_capacity=caps.halo_p
            )
            tables = (
                build_bsr_tables(
                    part, kt_cap=caps.kt, m_cap=caps.m, mt_cap=caps.mt
                )
                if want_bsr
                else None
            )
            return part, tables, caps
        except ValueError:
            pass  # outgrown: learn this slide's needs below
    part = partition_graph(nbrp, maskp, shards)
    tables = build_bsr_tables(part) if want_bsr else None
    if caps is None:
        return part, tables, None
    grown = caps.grown(
        part.halo_capacity,
        tables.nbr_t.shape[-1] if tables is not None else 1,
        tables.blk_cols.shape[-1] if tables is not None else 1,
        tables.blk_cols_t.shape[-1] if tables is not None else 1,
    )
    part = partition_graph(nbrp, maskp, shards, halo_capacity=grown.halo_p)
    tables = (
        build_bsr_tables(
            part, kt_cap=grown.kt, m_cap=grown.m, mt_cap=grown.mt
        )
        if want_bsr
        else None
    )
    return part, tables, grown


def spatial_sort_order(
    coords: np.ndarray, band_px: float, stripes: int = 1,
    shard_rows: int | None = None,
) -> np.ndarray:
    """Spatial band-sort order; ``stripes`` > 1 sorts within equal-count
    y-stripes first (round 5).

    The banded BSR kernel's window must cover a row's x-band neighbours,
    and the x-band length grows with the FULL slide height — span ~
    sqrt(N_total) — so banding rejects at ~300k+ nuclei NO MATTER how the
    graph is sharded (measured: 600k x 2/4 shards rejected,
    shard_scale_r4.json). With ``stripes`` set to the shard count, shards
    align with y-stripes: each shard's internal band length shrinks by the
    stripe factor (span ~ sqrt(N)/stripes), and cross-stripe edges become
    cross-SHARD edges — halo slots, which the halo-WINDOWED banded kernel
    streams through its second per-super-tile window
    (bsr_kernel._banded_halo_kernel; the halo slot order is globally
    y-then-band sorted per source stripe, so a group's halo span is a few
    dozen slots)."""
    n = len(coords)
    band = np.floor(coords[:, 0] / band_px)
    if stripes <= 1:
        return np.lexsort((coords[:, 1], band))
    y_order = np.argsort(coords[:, 1], kind="stable")
    # stripe boundaries at EXACT shard row counts (capacity // shards), so
    # shard boundaries never cut a stripe: a row spilled across the cut
    # would carry in-shard edges back to the previous stripe's rows at
    # local distance ~Ns (measured: one spilled row blew the span to the
    # whole shard). The final stripe absorbs the remainder plus the
    # capacity pad rows the caller appends.
    per = shard_rows if shard_rows is not None else n // stripes
    bounds = np.minimum(np.arange(1, stripes) * per, n)
    stripe_id = np.empty(n, np.int32)
    stripe_id[y_order] = np.searchsorted(
        bounds, np.arange(n), side="right"
    ).astype(np.int32)
    return np.lexsort((coords[:, 1], band, stripe_id))


def build_slide_inputs(cfg, feats, coords, shards, mesh,
                       caps: SlideCaps | None = None) -> SlideBuild:
    """feats [N, F_raw], coords [N, 2] -> sharded MegaInputs on ``mesh``.

    Normalization uses the reference per-fold stats tables
    (dataflow/stats.py); BSR tables are built only on TPU backends, where
    the Pallas aggregation kernel runs (XLA gathers elsewhere). ``caps``
    (multi-slide streaming) pads the variable table dims to sticky caps —
    pass the previous slide's ``SlideBuild.caps`` forward.
    """
    import jax

    from cgcnet_tpu.dataflow import native, stats as stats_mod
    from cgcnet_tpu.ops.knn import radius_knn_np
    from cgcnet_tpu.parallel.mega_model import prepare_mega_inputs

    n = len(coords)
    mean, std = stats_mod.reference_stats(
        cfg.data.cross_val, cfg.data.feature_type
    )
    # per-shard rows rounded to G_BAND row tiles (4*128) so the banded
    # x-window BSR kernel applies (bsr_kernel.band_window_table contract)
    from cgcnet_tpu.ops.pallas.bsr_kernel import G_BAND

    q = 128 * G_BAND * shards
    cap = -(-n // q) * q
    order = spatial_sort_order(
        coords, cfg.data.max_edge_distance, stripes=shards,
        shard_rows=cap // shards,
    )
    feats, coords = feats[order], coords[order]
    x = (np.concatenate([feats, coords], -1) - mean) / std
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
    want_bsr = jax.default_backend() == "tpu"
    part, tables, caps_used = _build_part_tables(
        nbrp, maskp, shards, caps, want_bsr
    )
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
        caps=caps_used,
        t_graph_s=t_graph,
        t_part_s=t_part,
    )
