"""Edge-partitioned whole-slide mega-graphs with halo exchange.

The reference never scales past one patch — its answer to large graphs is
subsampling (dataflow/data.py:195-225; SURVEY.md §5 "long-context"). The TPU
build adds the graph analog of sequence parallelism (BASELINE.json configs
4-5): a whole-slide graph (100k+ nuclei, no sampling) is node-partitioned
*contiguously in spatial order* across the mesh's ``graph`` axis, so each
shard owns a spatial band and the cross-shard ("halo") neighbours of a shard
are few and near its boundary.

Per aggregation:
  1. each shard gathers the rows its peers asked for (static request tables,
     capacity-padded) into a [D, P, F] send buffer;
  2. one ``all_to_all`` over ICI delivers every shard its halo rows;
  3. local ELL gather-sum runs over [local ++ halo] features.

All shapes are static; tables come from :func:`partition_graph` on the host.
The op is differentiable end-to-end (all_to_all and gathers are linear), so
the same code path serves forward and backward.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from cgcnet_tpu.ops.ell import ell_gather_sum


@dataclasses.dataclass
class ShardedGraphPartition:
    """Host-built static routing tables for one mega-graph on D shards.

    Shapes (D shards, Ns = nodes/shard, K ELL width, P halo capacity per
    peer pair, H = D*P total halo capacity):

      nbr_remap   i32[D, Ns, K] — neighbour indices into [local ++ halo]
                   space: j < Ns hits the local block, j >= Ns hits halo slot
                   j - Ns (= position in the recv buffer).
      nbr_mask    f32[D, Ns, K]
      req_idx     i32[D, D, P] — req_idx[d, e] = local row indices THIS shard
                   d must send to peer e (self-pairs unused).
      req_mask    f32[D, D, P]
      n_nodes     i32[D] real node count per shard.
    """

    nbr_remap: np.ndarray
    nbr_mask: np.ndarray
    req_idx: np.ndarray
    req_mask: np.ndarray
    n_nodes: np.ndarray

    @property
    def num_shards(self) -> int:
        return self.nbr_remap.shape[0]

    @property
    def halo_capacity(self) -> int:
        return self.req_idx.shape[2]


def partition_graph(
    nbr: np.ndarray,
    mask: np.ndarray,
    num_shards: int,
    halo_capacity: int | None = None,
) -> ShardedGraphPartition:
    """Split a global ELL graph (nodes already spatially sorted) into D
    contiguous shards and build the halo routing tables.

    Global node j lives on shard j // Ns at local row j % Ns.
    """
    n, k = nbr.shape
    assert n % num_shards == 0, "pad the global graph to a multiple of shards"
    ns = n // num_shards
    nbr = np.ascontiguousarray(nbr, np.int32)
    mask3 = mask.reshape(num_shards, ns, k) > 0
    nbr3 = nbr.reshape(num_shards, ns, k)
    owner3 = nbr3 // np.int32(ns)
    is_local = owner3 == np.arange(num_shards, dtype=np.int32)[:, None, None]

    # halo sets in ONE sort: key = requesting shard * n + wanted global node
    # (a per-shard unique loop over 100k-node shards costs ~3x this)
    remote = (~is_local) & mask3
    d_of = np.repeat(
        np.arange(num_shards, dtype=np.int64), int(ns) * k
    ).reshape(num_shards, ns, k)
    keys = np.unique(d_of[remote] * n + nbr3[remote].astype(np.int64))
    key_d = (keys // n).astype(np.int32)
    key_node = (keys % n).astype(np.int32)
    key_e = key_node // np.int32(ns)
    # per (d, e) counts -> capacity
    de_counts = np.zeros((num_shards, num_shards), np.int64)
    np.add.at(de_counts, (key_d, key_e), 1)
    need = int(de_counts.max()) if keys.size else 0
    p = halo_capacity if halo_capacity is not None else max(need, 1)
    if need > p:
        raise ValueError(f"halo capacity {p} < required {need}")

    req_idx = np.zeros((num_shards, num_shards, p), np.int32)
    req_mask = np.zeros((num_shards, num_shards, p), np.float32)
    # slot of each key within its (d, e) run (keys are sorted, so runs are
    # contiguous and per-run slot = rank - run start)
    run_key = key_d.astype(np.int64) * num_shards + key_e
    run_start = np.searchsorted(run_key, run_key, side="left")
    slot = (np.arange(len(keys)) - run_start).astype(np.int32)
    # shard e sends rows (key_node % ns) to d: sender-indexed table
    req_idx[key_e, key_d, slot] = key_node % np.int32(ns)
    req_mask[key_e, key_d, slot] = 1.0
    # per-shard lookup: global node id -> halo slot (ns + e*p + slot)
    halo_slot = np.zeros((num_shards, n), np.int32)
    halo_slot[key_d, key_node] = key_e * np.int32(p) + slot

    own_row = np.broadcast_to(
        np.arange(ns, dtype=np.int32)[None, :, None], nbr3.shape
    )
    remap_halo = np.int32(ns) + np.take_along_axis(
        halo_slot, nbr3.reshape(num_shards, -1), axis=1
    ).reshape(num_shards, ns, k)
    nbr_remap = np.where(
        ~mask3, own_row, np.where(is_local, nbr3 % np.int32(ns), remap_halo)
    )
    nbr_mask = mask3.astype(np.float32)

    return ShardedGraphPartition(
        nbr_remap=nbr_remap,
        nbr_mask=nbr_mask,
        req_idx=req_idx,
        req_mask=req_mask,
        n_nodes=np.full(num_shards, ns, np.int32),
    )


@dataclasses.dataclass
class ShardedBsrTables:
    """Per-shard BSR metadata for the local [Ns x NC] aggregation operator
    (NC = Ns + halo slots, padded to a 128 multiple) and its transpose —
    lets the mega path run the gather-free Pallas MXU kernel instead of XLA
    row-gathers (round-1 weakness: the mega path paid per-row gather
    latency). Halo columns are ordinary extra column tiles."""

    blk_cols: np.ndarray    # i32[D, R, M]       forward operator
    blk_mask: np.ndarray    # f32[D, R, M]
    nbr_t: np.ndarray       # i32[D, NC, KT]     transpose (in-edge lists)
    mask_t: np.ndarray      # f32[D, NC, KT]
    blk_cols_t: np.ndarray  # i32[D, RC, MT]
    blk_mask_t: np.ndarray  # f32[D, RC, MT]
    nc: int                 # padded column-space size
    # banded-window bases (bsr_kernel.band_window_table) per direction, or
    # None when that direction's band exceeds W_BAND on any shard — the
    # matvec then uses the streamed kernel instead of the x-window one
    win_base: np.ndarray | None = None    # i32[D, R // G_BAND]
    win_base_t: np.ndarray | None = None  # i32[D, RC // G_BAND]
    # halo-window bases (bsr_kernel.band_window_table_halo) for the forward
    # direction when the halo exceeds the resident tail (multi-shard) —
    # None means win_base's kernel uses the resident-tail form
    win_halo: np.ndarray | None = None    # i32[D, R // G_BAND]


def build_bsr_tables(
    part: ShardedGraphPartition,
    max_blocks: int = 16,
    tile: int = 128,
    kt_cap: int | None = None,
    m_cap: int | None = None,
    mt_cap: int | None = None,
) -> ShardedBsrTables | None:
    """Host-side BSR metadata for every shard's local operator. Returns None
    when the layout is not tileable (Ns not a multiple of 128) or a shard
    exceeds ``max_blocks`` column tiles per row tile.

    ``kt_cap``/``m_cap``/``mt_cap`` optionally FIX the transpose ELL width
    and blocks-per-row-tile instead of using this slide's minima — multi-
    slide streaming pads every slide to sticky caps so the jitted step keeps
    ONE compiled shape (cli/slide.py --slides). ValueError when a cap is too
    small (callers grow the sticky cap and rebuild)."""
    from cgcnet_tpu.ops.pallas.bsr_kernel import bsr_block_meta

    d, ns, k = part.nbr_remap.shape
    if ns % tile != 0:
        return None
    h = d * part.halo_capacity
    # column space rounded to G_BAND row tiles so the TRANSPOSE direction's
    # row count also tiles for the banded-window kernel (its row space = NC)
    from cgcnet_tpu.ops.pallas.bsr_kernel import G_BAND

    nc = -(-(ns + h) // (tile * G_BAND)) * (tile * G_BAND)

    # rectangular transpose of the OFF-DIAGONAL local operator: rows =
    # column space NC. Self slots must be excluded — the forward blocks are
    # built from off_mask (the self weight is applied as an epilogue), so
    # the transpose must match or gradients gain phantom diagonal terms.
    nbr_ts, mask_ts = [], []
    kt = 0
    for di in range(d):
        nbr_s = part.nbr_remap[di]
        ok = (part.nbr_mask[di] > 0) & (
            nbr_s != np.arange(ns, dtype=nbr_s.dtype)[:, None]
        )
        src = np.repeat(np.arange(ns, dtype=np.int64), k)[ok.ravel()]
        dst = nbr_s.ravel().astype(np.int64)[ok.ravel()]
        counts = np.bincount(dst, minlength=nc)
        kt = max(kt, int(counts.max()) if len(dst) else 1)
        nbr_ts.append((src, dst, counts))
    kt = max(kt, 1)
    if kt_cap is not None:
        if kt > kt_cap:
            raise ValueError(f"kt_cap {kt_cap} < required {kt}")
        kt = kt_cap
    t_idx = np.zeros((d, nc, kt), np.int32)
    t_mask = np.zeros((d, nc, kt), np.float32)
    for di, (src, dst, counts) in enumerate(nbr_ts):
        order = np.argsort(dst, kind="stable")
        src, dst = src[order], dst[order]
        starts = np.concatenate([[0], np.cumsum(counts)])
        slot = np.arange(len(src)) - starts[dst]
        t_idx[di, dst, slot] = src.astype(np.int32)
        t_mask[di, dst, slot] = 1.0

    try:
        metas = [
            bsr_block_meta(part.nbr_remap[di], part.nbr_mask[di], max_blocks)
            for di in range(d)
        ]
    except ValueError:
        return None
    try:
        metas_t = [
            bsr_block_meta(t_idx[di], t_mask[di], max_blocks)
            for di in range(d)
        ]
        t_rows = nc
    except ValueError:
        # halo transpose rows don't tile: a 128-slot halo tile aggregates
        # in-edges from MANY destination bands (boundary rows are ~10-30
        # per band, so one tile spans 4-13 bands → 24-64 distinct column
        # tiles; measured M_t=64 at 600k x 2 stripes). Band the transpose
        # over LOCAL rows only — its halo rows (halo_fraction <1% of the
        # graph) run as an ELL gather in the backward
        # (ops/ell._bsr_local_bwd's nbr_t_h path).
        try:
            metas_t = [
                bsr_block_meta(t_idx[di, :ns], t_mask[di, :ns], max_blocks)
                for di in range(d)
            ]
            t_rows = ns
        except ValueError:
            return None
    # one static M across shards (shard_map needs identical shapes)
    m = max(max(mm[2] for mm in metas), 1)
    mt = max(max(mm[2] for mm in metas_t), 1)
    if m_cap is not None:
        if m > m_cap:
            raise ValueError(f"m_cap {m_cap} < required {m}")
        assert m_cap <= max_blocks, (m_cap, max_blocks)
        m = m_cap
    if mt_cap is not None:
        if mt > mt_cap:
            raise ValueError(f"mt_cap {mt_cap} < required {mt}")
        assert mt_cap <= max_blocks, (mt_cap, max_blocks)
        mt = mt_cap
    blk_cols = np.stack([mm[0][:, :m] for mm in metas])
    blk_mask = np.stack([mm[1][:, :m] for mm in metas])
    blk_cols_t = np.stack([mm[0][:, :mt] for mm in metas_t])
    blk_mask_t = np.stack([mm[1][:, :mt] for mm in metas_t])

    # banded-window bases per direction: all shards must band (shard_map
    # needs uniform shapes). Forward halo columns: resident tail when they
    # fit in H_BAND_MAX tiles (single-shard / tiny halos), per-super-tile
    # halo WINDOWS otherwise (round 5 — the multi-shard capacity path,
    # where halos are thousands of rows but globally spatially sorted)
    from cgcnet_tpu.ops.pallas.bsr_kernel import (
        H_BAND_MAX,
        band_window_table,
        band_window_table_halo,
    )

    ns_tiles = ns // tile
    def _wins(cols, masks, n_col_tiles):
        outs = []
        for di in range(d):
            w = band_window_table(cols[di], masks[di], n_col_tiles)
            if w is None:
                return None
            outs.append(w)
        return np.stack(outs)

    h_tiles_total = nc // tile - ns_tiles
    win_halo = None
    if h_tiles_total <= H_BAND_MAX:
        win_base = _wins(blk_cols, blk_mask, ns_tiles)
    else:
        locs, halos = [], []
        for di in range(d):
            tabs = band_window_table_halo(
                blk_cols[di], blk_mask[di], ns_tiles, h_tiles_total
            )
            if tabs is None:
                locs = None
                break
            locs.append(tabs[0])
            halos.append(tabs[1])
        win_base = np.stack(locs) if locs is not None else None
        win_halo = np.stack(halos) if locs is not None else None
    # transpose x = the forward's row space (no halo columns)
    win_base_t = _wins(blk_cols_t, blk_mask_t, ns_tiles)

    return ShardedBsrTables(
        blk_cols=blk_cols,
        blk_mask=blk_mask,
        nbr_t=t_idx,
        mask_t=t_mask,
        blk_cols_t=blk_cols_t,
        blk_mask_t=blk_mask_t,
        nc=nc,
        win_base=win_base,
        win_base_t=win_base_t,
        win_halo=win_halo,
    )


# ---------------------------------------------------------------------------
# shard_map ops (run under a mesh with axis name 'graph')
# ---------------------------------------------------------------------------

def _halo_exchange(x_local, req_idx, req_mask, axis: str):
    """x_local [Ns, F]; req_idx i32[D, P]; -> halo rows [D*P, F].

    The mask multiply MUST happen at x_local's dtype: req_mask is f32, and
    an unguarded ``bf16 * f32`` promotes the halo rows (and, through the
    concat, EVERY downstream stage-1 aggregation incl. the [Ns, 1140] A@S)
    to f32 — the round-3 slide profile showed the whole sharded forward
    silently running f32 because of exactly that (2x the matvec bytes on
    chip and 2x the all_to_all bytes on ICI)."""
    send = x_local[req_idx] * req_mask[..., None].astype(x_local.dtype)
    recv = jax.lax.all_to_all(
        send, axis, split_axis=0, concat_axis=0, tiled=True
    )                                                      # [D, P, F]
    return recv.reshape(-1, recv.shape[-1])                # [D*P, F]


def sharded_gather_sum(
    x: jax.Array,
    nbr_remap: jax.Array,
    nbr_mask: jax.Array,
    w: jax.Array,
    req_idx: jax.Array,
    req_mask: jax.Array,
    mesh: Mesh,
    axis: str = "graph",
) -> jax.Array:
    """Distributed A @ x with halo exchange.

    Global-view args (sharded over ``axis`` on the leading dim):
      x         f32[N, F]      node features (N = D * Ns)
      nbr_remap i32[N, K]      per-shard remapped neighbours (stacked)
      nbr_mask  f32[N, K]      UNUSED here (w already folds the mask); kept
                               so this signature matches the _overlap
                               variant, which needs the raw mask — callers
                               switch between the two behind a config flag
      w         f32[N, K]      edge weights (mask folded)
      req_idx   i32[D*D, P]    send tables (stacked shard-major)
      req_mask  f32[D*D, P]
    """

    def local(x_l, nbr_l, mask_l, w_l, req_i, req_m):
        halo = _halo_exchange(x_l, req_i, req_m, axis)
        xx = jnp.concatenate([x_l, halo], axis=0)
        return ell_gather_sum(nbr_l[None], w_l[None], xx[None])[0][
            : x_l.shape[0]
        ]

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
    )
    return fn(x, nbr_remap, nbr_mask, w, req_idx, req_mask)


def sharded_gather_sum_overlap(
    x: jax.Array,
    nbr_remap: jax.Array,
    nbr_mask: jax.Array,
    w: jax.Array,
    req_idx: jax.Array,
    req_mask: jax.Array,
    mesh: Mesh,
    axis: str = "graph",
) -> jax.Array:
    """Halo aggregation structured for collective/compute overlap.

    Same contract as :func:`sharded_gather_sum`, but the aggregation is split
    into an interior part (rows whose neighbours are all shard-local — the
    vast majority under spatial partitioning) that has NO data dependency on
    the all_to_all, and a boundary part that consumes the received halo. XLA
    can schedule the interior gather concurrently with the in-flight
    collective (async collective start/done), hiding the exchange latency —
    SURVEY.md §7 hard part 3.
    """

    def local(x_l, nbr_l, mask_l, w_l, req_i, req_m):
        ns = x_l.shape[0]
        # a row is interior iff every real slot stays in the local block
        slot_local = jnp.where(mask_l > 0, nbr_l, 0) < ns
        interior = jnp.all(slot_local, axis=-1)                  # [Ns]
        w_int = w_l * interior[:, None]
        w_bnd = w_l * (~interior)[:, None]

        # start the exchange; the interior gather below does not depend on it
        halo = _halo_exchange(x_l, req_i, req_m, axis)

        nbr_clipped = jnp.minimum(nbr_l, ns - 1)
        out_int = ell_gather_sum(nbr_clipped[None], w_int[None], x_l[None])[0]

        xx = jnp.concatenate([x_l, halo], axis=0)
        out_bnd = ell_gather_sum(nbr_l[None], w_bnd[None], xx[None])[0]
        return out_int + out_bnd

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
    )
    return fn(x, nbr_remap, nbr_mask, w, req_idx, req_mask)


def sharded_gather_sum_allgather(
    x: jax.Array,
    nbr: jax.Array,
    w: jax.Array,
    mesh: Mesh,
    axis: str = "graph",
) -> jax.Array:
    """Baseline distributed A @ x: all_gather the full feature table, then
    local gather. Correct for any partition; bandwidth scales with N*F.
    Used as the oracle for halo-exchange tests and for small graphs."""

    def local(x_l, nbr_l, w_l):
        x_full = jax.lax.all_gather(x_l, axis, axis=0, tiled=True)
        return ell_gather_sum(nbr_l[None], w_l[None], x_full[None])[0]

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=P(axis),
    )
    return fn(x, nbr, w)
