"""Block-sparse (BSR) aggregation kernel — gather-free SpMM on the MXU.

Why: XLA lowers ELL aggregation to row-gathers whose cost is per-ROW latency,
not bytes — profiling the train step shows a [B*N*KT, 20] backward gather
costing 3.2 ms for 44 MB of data, and the 1140-wide DiffPool gathers ~19 ms
(see CLAUDE.md). Mosaic exposes no general gather either (vreg-local only).

Design: nuclei are spatially sorted by the loader, so the radius graph is
band-limited — each 128-row tile's neighbours fall into a handful of 128-col
tiles. The kernel walks the nonzero block list per row tile (scalar-prefetched
block-column indices), materializes each 128x128 adjacency block *on the fly
in VMEM* from the ELL slots (K broadcast-compares on the VPU — no block
values ever touch HBM), and contracts it with the matching feature tile on
the MXU:

    out[r*T:(r+1)*T] = sum_m  A_block(r, cols[r, m]) @ x[cols[r, m]*T : +T]

Per block: ~131k VPU compare-accumulate ops to build A_block, then a
128x128xF MXU matmul. For F=1140 this turns a ~2.5 GB gather into ~20 GFLOP
of bf16-width matmul; for F=20 it replaces per-row latency with a few
microseconds of MXU time.

The same kernel runs the backward over the transposed graph's ELL + block
metadata (see ops.ell.ell_spmm_factored wiring in nn/adjacency.py).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128

_INTERPRET = False


def set_interpret(value: bool) -> None:
    global _INTERPRET
    _INTERPRET = value


# ---------------------------------------------------------------------------
# host-side metadata builder
# ---------------------------------------------------------------------------

def bsr_blocks_needed(nbr: np.ndarray, mask: np.ndarray, tile: int = TILE) -> int:
    """Max column tiles touched by any row tile (the minimal viable
    ``max_blocks`` for :func:`bsr_block_meta`)."""
    n = nbr.shape[0]
    if n % tile != 0:
        return 1 << 30  # not tileable
    need = 0
    for ri in range(n // tile):
        rows = slice(ri * tile, (ri + 1) * tile)
        sel = nbr[rows][mask[rows] > 0]
        if sel.size:
            need = max(need, len(np.unique(sel // tile)))
    return max(need, 1)


def bsr_block_meta(
    nbr: np.ndarray,
    mask: np.ndarray,
    max_blocks: int,
    tile: int = TILE,
    strict: bool = True,
) -> tuple[np.ndarray, np.ndarray, int]:
    """Per-row-tile nonzero block-column lists.

    Args:
      nbr/mask: [N, K] padded ELL (N a multiple of ``tile``).
      max_blocks: static blocks-per-row-tile capacity.

    Returns (blk_cols i32[R, max_blocks], blk_mask f32[R, max_blocks],
    max_needed). Raises if a row tile touches more than ``max_blocks`` column
    tiles — spatially sort the nodes or raise the cap — unless
    ``strict=False``, in which case over-cap row tiles are left zero and the
    caller checks ``max_needed`` (single-scan need measurement).
    """
    n, _ = nbr.shape
    assert n % tile == 0, f"N={n} not a multiple of {tile}"
    r = n // tile
    blk_cols = np.zeros((r, max_blocks), np.int32)
    blk_mask = np.zeros((r, max_blocks), np.float32)
    max_needed = 0
    for ri in range(r):
        rows = slice(ri * tile, (ri + 1) * tile)
        cols = np.unique((nbr[rows][mask[rows] > 0]) // tile)
        max_needed = max(max_needed, len(cols))
        if len(cols) > max_blocks:
            if strict:
                raise ValueError(
                    f"row tile {ri} touches {len(cols)} column tiles > cap "
                    f"{max_blocks}; spatially sort nodes or raise bsr "
                    "max_blocks"
                )
            continue
        blk_cols[ri, : len(cols)] = cols
        blk_mask[ri, : len(cols)] = 1.0
    return blk_cols, blk_mask, max_needed


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _bsr_kernel(
    blk_cols_ref,   # scalar prefetch: i32[B*R*M] (flat — see _flat_tables)
    blk_mask_ref,   # scalar prefetch: i32[B*R*M]
    nbr_ref,        # i32[1, T, K]
    w_ref,          # f32[1, T, K]
    x_ref,          # f32[1, T, F]   (column tile selected via blk_cols)
    out_ref,        # f32[1, T, F]
    *, r: int, m_cap: int,
):
    b = pl.program_id(0)
    ri = pl.program_id(1)
    m = pl.program_id(2)

    t, k = nbr_ref.shape[1], nbr_ref.shape[2]
    idx = (b * r + ri) * m_cap + m
    col_base = blk_cols_ref[idx] * t
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1) + col_base
    nbr = nbr_ref[0]
    w = w_ref[0]
    # bm zeroes the contribution of padding block slots; every grid step
    # writes the output block (required for the revisit/accumulate pipeline)
    bm = blk_mask_ref[idx].astype(jnp.float32)
    block = jnp.zeros((t, t), jnp.float32)
    for kk in range(k):
        # select(cmp, w, 0) is one VPU op fewer than cmp.astype * w — the
        # build is VPU-bound so this shows directly in build time
        block = block + jnp.where(
            nbr[:, kk][:, None] == col_ids, w[:, kk][:, None], 0.0
        )
    contrib = jnp.dot(
        (bm * block).astype(x_ref.dtype),
        x_ref[0],
        preferred_element_type=jnp.float32,
    )

    @pl.when(m == 0)
    def _():
        out_ref[0] = contrib.astype(out_ref.dtype)

    @pl.when(m > 0)
    def _():
        out_ref[0] += contrib.astype(out_ref.dtype)


def _bsr_kernel_resident(
    blk_cols_ref,   # scalar prefetch: i32[B*R*M] (flat)
    blk_mask_ref,   # scalar prefetch: i32[B*R*M]
    nbr_ref,        # i32[1, N, K]
    w_ref,          # f32[1, N, K]
    x_ref,          # [1, N, F]  (whole table resident in VMEM)
    out_ref,        # [1, N, F]
    *, m_cap: int,
):
    b = pl.program_id(0)
    n, k = nbr_ref.shape[1], nbr_ref.shape[2]
    t = TILE
    r = n // t
    f = x_ref.shape[2]

    def row_tile(ri, _):
        base = pl.multiple_of(ri * t, t)
        nbr = nbr_ref[0, pl.ds(base, t), :]
        w = w_ref[0, pl.ds(base, t), :]
        acc = jnp.zeros((t, f), jnp.float32)
        # static unroll over the block-slot capacity: Mosaic pipelines the
        # unrolled body; a dynamic trip count measured ~20% slower even
        # though it skips padded slots
        for mi in range(m_cap):
            idx = (b * r + ri) * m_cap + mi
            col_base = pl.multiple_of(blk_cols_ref[idx] * t, t)
            bm = blk_mask_ref[idx].astype(jnp.float32)
            col_ids = (
                jax.lax.broadcasted_iota(jnp.int32, (t, t), 1) + col_base
            )
            block = jnp.zeros((t, t), jnp.float32)
            for kk in range(k):
                block = block + jnp.where(
                    nbr[:, kk][:, None] == col_ids, w[:, kk][:, None], 0.0
                )
            xt = x_ref[0, pl.ds(col_base, t), :]
            acc = acc + bm * jnp.dot(
                block.astype(xt.dtype), xt, preferred_element_type=jnp.float32
            )
        out_ref[0, pl.ds(base, t), :] = acc.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, r, row_tile, 0)


def _bsr_resident_call(nbr, w, blk_cols, blk_mask, x):
    b, n, k = nbr.shape
    f = x.shape[-1]
    m_cap = blk_cols.shape[-1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, k), lambda bi, bc, bm: (bi, 0, 0)),
            pl.BlockSpec((1, n, k), lambda bi, bc, bm: (bi, 0, 0)),
            pl.BlockSpec((1, n, f), lambda bi, bc, bm: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, n, f), lambda bi, bc, bm: (bi, 0, 0)),
    )
    return pl.pallas_call(
        functools.partial(_bsr_kernel_resident, m_cap=m_cap),
        out_shape=jax.ShapeDtypeStruct((b, n, f), x.dtype),
        grid_spec=grid_spec,
        interpret=_INTERPRET,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (n // TILE) * m_cap * TILE * TILE * f,
            bytes_accessed=b * n * (2 * k * 4 + 2 * f * 4),
            transcendentals=0,
        ),
    )(
        # flat 1D prefetch tables: SMEM pads 2D+ scalar operands to (8,128)
        # tiles, which blows the 1 MB SMEM budget at slide scale — an
        # [R=3908, M=9] i32 table pads to 2 MB (observed 500k-nuclei compile
        # OOM); flattened it stays R*M*4 bytes
        blk_cols.reshape(-1),
        blk_mask.astype(jnp.int32).reshape(-1),
        nbr, w.astype(jnp.float32), x,
    )


# ---------------------------------------------------------------------------
# amortized path: build block values ONCE per step, then matmul-only matvecs
# ---------------------------------------------------------------------------
#
# The adjacency is constant across all of a train step's stage-1 matvecs
# (6 convolutions + the DiffPool quadform, forward and backward): rebuilding
# the 128x128 blocks from ELL inside every matvec redoes the K x T x T VPU
# compare work ~14x per step. bsr_build_blocks materializes the weighted
# blocks to HBM once per direction; bsr_matmul then streams them through the
# MXU with zero per-matvec build cost.


def _build_blocks_kernel(
    blk_cols_ref,   # scalar prefetch: i32[B*R*M] (flat)
    blk_mask_ref,   # scalar prefetch: i32[B*R*M]
    nbr_ref,        # i32[1, T, K]
    w_ref,          # f32[1, T, K]
    vals_ref,       # [1, 1, M, T, T]
    *, r: int,
):
    b = pl.program_id(0)
    ri = pl.program_id(1)
    t, k = nbr_ref.shape[1], nbr_ref.shape[2]
    m_cap = vals_ref.shape[2]
    nbr = nbr_ref[0]
    w = w_ref[0]
    for mi in range(m_cap):
        idx = (b * r + ri) * m_cap + mi
        col_base = blk_cols_ref[idx] * t
        bm = blk_mask_ref[idx].astype(jnp.float32)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1) + col_base
        block = jnp.zeros((t, t), jnp.float32)
        for kk in range(k):
            block = block + jnp.where(
                nbr[:, kk][:, None] == col_ids, w[:, kk][:, None], 0.0
            )
        vals_ref[0, 0, mi] = (bm * block).astype(vals_ref.dtype)


def bsr_build_blocks(
    nbr: jax.Array,        # i32[B, N, K]
    w: jax.Array,          # f32[B, N, K] full edge weights (mask folded in)
    blk_cols: jax.Array,   # i32[B, R, M]
    blk_mask: jax.Array,   # i32/f32[B, R, M]
    dtype=jnp.float32,
) -> jax.Array:
    """Materialize the block-sparse values: vals[b, r, m] is the 128x128
    dense block of A at row tile r, column tile blk_cols[b, r, m] (zero for
    padded block slots). A is fully defined by the ELL weights ``w`` —
    including any self-loop/renormalization weights, so a subsequent
    bsr_matmul IS A @ x with no epilogue."""
    b, n, k = nbr.shape
    r = n // TILE
    m = blk_cols.shape[-1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, r),
        in_specs=[
            pl.BlockSpec((1, TILE, k), lambda bi, ri, bc, bm: (bi, ri, 0)),
            pl.BlockSpec((1, TILE, k), lambda bi, ri, bc, bm: (bi, ri, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, m, TILE, TILE), lambda bi, ri, bc, bm: (bi, ri, 0, 0, 0)
        ),
    )
    return pl.pallas_call(
        functools.partial(_build_blocks_kernel, r=r),
        out_shape=jax.ShapeDtypeStruct((b, r, m, TILE, TILE), dtype),
        grid_spec=grid_spec,
        interpret=_INTERPRET,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * k * TILE,
            bytes_accessed=b * (n * k * 8 + r * m * TILE * TILE * 4),
            transcendentals=0,
        ),
    )(
        blk_cols.reshape(-1),
        blk_mask.astype(jnp.int32).reshape(-1),
        nbr, w.astype(jnp.float32),
    )


def _bsr_mm_resident_kernel(
    blk_cols_ref,   # scalar prefetch: i32[B*R*M] (flat)
    vals_ref,       # ANY/HBM: [B, R, M, T, T]
    x_ref,          # VMEM: [1, NC, F] (whole table resident)
    out_ref,        # VMEM: [1, R*T, F] (rows may differ from NC — the
                    #   operator can be rectangular, e.g. transposed
                    #   local+halo blocks on the mega path)
    scratch,        # VMEM: [2, M, T, T]
    sems,           # DMA semaphores (2,)
):
    b = pl.program_id(0)
    f = x_ref.shape[2]
    t = TILE
    r = out_ref.shape[1] // t
    g_sz, m_cap = scratch.shape[1], scratch.shape[2]
    chunks = r // g_sz

    # G row tiles of block values per DMA (they are contiguous in HBM):
    # fewer, larger transfers — per-DMA latency dominated the per-row-tile
    # version at small F
    def vals_dma(slot, ci):
        return pltpu.make_async_copy(
            vals_ref.at[b, pl.ds(ci * g_sz, g_sz)],
            scratch.at[slot],
            sems.at[slot],
        )

    vals_dma(0, 0).start()

    def chunk(ci, _):
        slot = jax.lax.rem(ci, 2)

        @pl.when(ci + 1 < chunks)
        def _():
            vals_dma(jax.lax.rem(ci + 1, 2), ci + 1).start()

        vals_dma(slot, ci).wait()
        for gi in range(g_sz):
            ri = ci * g_sz + gi
            acc = jnp.zeros((t, f), jnp.float32)
            for mi in range(m_cap):
                idx = (b * r + ri) * m_cap + mi
                col_base = pl.multiple_of(blk_cols_ref[idx] * t, t)
                xt = x_ref[0, pl.ds(col_base, t), :]
                # int8 vals (binary adjacency, mega path) convert at use:
                # one VPU pass per block vs half the HBM/DMA bytes
                acc = acc + jnp.dot(
                    scratch[slot, gi, mi].astype(xt.dtype), xt,
                    preferred_element_type=jnp.float32,
                )
            out_ref[0, pl.ds(pl.multiple_of(ri * t, t), t), :] = acc.astype(
                out_ref.dtype
            )
        return 0

    jax.lax.fori_loop(0, chunks, chunk, 0)


def _make_streamed_kernel(m_cap: int):
    """Large-F matmul kernel: per (b, ri) grid step the M column tiles of x
    arrive as M independently-pipelined BlockSpec inputs (their index maps
    read the scalar-prefetched block-column list) — Mosaic double-buffers
    them across grid steps, and unaligned F needs no manual DMA."""

    def kernel(blk_cols_ref, vals_ref, *refs):
        x_refs = refs[:m_cap]
        out_ref = refs[m_cap]
        f = out_ref.shape[2]
        acc = jnp.zeros((TILE, f), jnp.float32)
        for mi in range(m_cap):
            acc = acc + jnp.dot(
                # int8 vals (binary adjacency) convert at use — see
                # _bsr_mm_resident_kernel
                vals_ref[0, 0, mi].astype(x_refs[mi].dtype),
                x_refs[mi][0],
                preferred_element_type=jnp.float32,
            )
        out_ref[0] = acc.astype(out_ref.dtype)

    return kernel


def bsr_matmul(
    vals: jax.Array,       # [B, R, M, T, T] from bsr_build_blocks
    blk_cols: jax.Array,   # i32[B, R, M]
    x: jax.Array,          # [B, NC, F]
) -> jax.Array:
    """out[B, R*T, F] = A @ x with A given as precomputed block-sparse
    values. Pure MXU + DMA — no per-matvec block construction. A may be
    rectangular: output rows come from the block metadata (R*T), columns
    from x."""
    b, r, m = blk_cols.shape
    n, f = x.shape[1], x.shape[2]
    nr = r * TILE
    itemsize = jnp.dtype(x.dtype).itemsize
    flops = 2 * b * r * m * TILE * TILE * f
    vals_bytes = b * r * m * TILE * TILE * jnp.dtype(vals.dtype).itemsize
    # VMEM residency must be judged at the LANE-PADDED width: an [*, F<128]
    # buffer occupies ceil(F/128)*128 lanes per row in VMEM, so at slide
    # scale a bf16 [100k, 18] x-operand is 25.6 MB, not 3.6 MB (the round-3
    # slide step OOM'd scoped vmem exactly this way — the f32 variant only
    # survived because its raw byte count happened to overflow this gate)
    f_pad = -(-f // 128) * 128
    if (n + nr) * f_pad * itemsize <= 2 * _RESIDENT_LIMIT:
        # x (and out) stay VMEM-resident; vals double-buffered from HBM in
        # chunks of G row tiles (largest divisor of R within ~2 MB)
        vsz = jnp.dtype(vals.dtype).itemsize
        g_sz = 1
        for cand in range(min(r, 16), 0, -1):
            if r % cand == 0 and cand * m * TILE * TILE * vsz <= 2 << 20:
                g_sz = cand
                break
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((1, n, f), lambda bi, bc: (bi, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, nr, f), lambda bi, bc: (bi, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, g_sz, m, TILE, TILE), vals.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        return pl.pallas_call(
            _bsr_mm_resident_kernel,
            out_shape=jax.ShapeDtypeStruct((b, nr, f), x.dtype),
            grid_spec=grid_spec,
            interpret=_INTERPRET,
            cost_estimate=pl.CostEstimate(
                flops=flops,
                bytes_accessed=vals_bytes + b * (n + nr) * f * itemsize,
                transcendentals=0,
            ),
        )(blk_cols.reshape(-1), vals, x)
    # large feature tables: the M x column tiles of each row tile arrive as
    # M pipelined BlockSpec inputs selected by the prefetched block columns.
    #
    # Scoped-VMEM guard: every pipelined operand is double-buffered, so the
    # streamed call's stack is ~2*(M x-blocks [TILE, f_pad] + vals block
    # [M, T, T] + out block [TILE, f_pad]). At f32 F=1140 M=12 that is
    # 16.12 MB — 128 KB OVER Mosaic's 16 MB scoped limit (observed: the f32
    # patch-step backward failed AOT compile exactly here, 2026-08-20; the
    # bf16 variant is half the bytes and fine). Split the call along F at a
    # lane-aligned point; vals are re-read once per part (~+11% traffic on
    # the f32 patch backward) which beats a failed compile. Recursion
    # halves F until the stack fits.
    vsz = jnp.dtype(vals.dtype).itemsize
    scoped = 2 * (m + 1) * TILE * f_pad * itemsize + 2 * m * TILE * TILE * vsz
    if scoped > _SCOPED_VMEM_BUDGET and f > 128:
        half = -(-((f + 1) // 2) // 128) * 128  # multiple of 128, >= f/2
        return jnp.concatenate(
            [
                bsr_matmul(vals, blk_cols, x[..., :half]),
                bsr_matmul(vals, blk_cols, x[..., half:]),
            ],
            axis=-1,
        )

    def x_spec(mi):
        # bc is the FLAT [B*R*M] block-column list (SMEM pads 2D scalar
        # operands to (8,128) tiles — 2 MB at slide scale, over the 1 MB
        # SMEM budget; flat it stays B*R*M*4 bytes)
        return pl.BlockSpec(
            (1, TILE, f),
            lambda bi, ri, bc, mi=mi: (bi, bc[(bi * r + ri) * m + mi], 0),
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, r),
        in_specs=[
            pl.BlockSpec(
                (1, 1, m, TILE, TILE), lambda bi, ri, bc: (bi, ri, 0, 0, 0)
            ),
        ]
        + [x_spec(mi) for mi in range(m)],
        out_specs=pl.BlockSpec((1, TILE, f), lambda bi, ri, bc: (bi, ri, 0)),
    )
    return pl.pallas_call(
        _make_streamed_kernel(m),
        out_shape=jax.ShapeDtypeStruct((b, nr, f), x.dtype),
        grid_spec=grid_spec,
        interpret=_INTERPRET,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=vals_bytes + b * r * m * TILE * f * itemsize,
            transcendentals=0,
        ),
    )(blk_cols.reshape(-1), vals, *([x] * m))


# feature tables up to this many bytes stay fully VMEM-resident (the
# single-grid-step kernel); larger tables use the tiled column-DMA kernel
_RESIDENT_LIMIT = 4 * 1024 * 1024

# streamed-kernel double-buffered stack budget: Mosaic's scoped-vmem limit
# is 16 MB; leave headroom for the kernel's own temporaries
_SCOPED_VMEM_BUDGET = 14 * 1024 * 1024


# ---------------------------------------------------------------------------
# banded-window kernel: multi-row-tile x reuse for slide-scale F
# ---------------------------------------------------------------------------
#
# The streamed kernel above re-DMAs each x column tile once per (row tile,
# block slot): at 100k nuclei / F=1140 that is M≈9 x-tile reads per row tile
# = 2.05 GB of x traffic per matvec — the measured 2.8 ms/leg A@S cost is
# exactly that DMA (roofline r4). The graph is spatially sorted, so the
# block columns of G consecutive row tiles live in ONE contiguous window of
# column tiles: this kernel processes G row tiles per grid step, manually
# double-buffering a [W_BAND + halo] column-tile x window, cutting x traffic
# by ~G*M/(W_BAND) ≈ 3x. Halo column tiles (index >= ns) sit permanently in
# the window's tail (they are few — gate H_BAND_MAX). vals/out pipeline via
# ordinary BlockSpecs.

G_BAND = 4        # row tiles per grid step (capacities padded to 4*128)
W_BAND = 16       # contiguous column-tile window per grid step (the 100k
                  # spatially-sorted slide's worst 4-tile-group span is
                  # exactly 16; 12 rejected 193/196 super tiles).
                  # Applicability boundary: a group's span grows with the
                  # x-strip population (~sqrt(N) at fixed density) — windows
                  # fit to ~150-200k nuclei per shard at reference density
                  # (600k measured rejected: benchmarks/shard_scale_r4.json)
                  # and band_window_table then returns None, falling the
                  # wide-F legs back to the streamed kernel. Widening W is
                  # VMEM-bound: at F=1152 bf16 the double-buffered window is
                  # ~590 KB per (W+h) tile, so W=16 is the ~16 MB/core
                  # ceiling; a single-buffered W~32 variant would only serve
                  # the 300-700k single-shard band (multi-shard halo tails
                  # outgrow the resident cap below first) — not worth the
                  # second kernel.
H_BAND_MAX = 4    # max halo column tiles resident in the window tail
BAND_MIN_F = 512  # dispatch floor: below this the leg is vals-DMA-bound
                  # (the window cuts x traffic only) and the kernel's
                  # internal lane-pad of x would be pure overhead


def band_window_table(
    blk_cols: np.ndarray,   # i32[R, M] one shard
    blk_mask: np.ndarray,   # [R, M]
    ns_tiles: int,          # local column tiles (halo tiles start here)
) -> np.ndarray | None:
    """Per-super-row-tile window bases, or None when the band is too wide
    for W_BAND (caller falls back to the streamed kernel). Requires
    R % G_BAND == 0 (capacities are padded to 4*128 on the mega path) and
    ns_tiles >= W_BAND."""
    r = blk_cols.shape[0]
    if r % G_BAND or r < G_BAND or ns_tiles < W_BAND:
        return None
    s_count = r // G_BAND
    base = np.zeros(s_count, np.int32)
    for si in range(s_count):
        rows = slice(si * G_BAND, (si + 1) * G_BAND)
        cols = blk_cols[rows][blk_mask[rows] > 0]
        cols = cols[cols < ns_tiles]  # halo tiles ride in the resident tail
        if len(cols) == 0:
            continue
        lo, hi = int(cols.min()), int(cols.max())
        b0 = min(lo, ns_tiles - W_BAND)
        if hi >= b0 + W_BAND:
            return None  # band wider than the window at this super tile
        base[si] = b0
    return base


H_SUB = H_BAND_MAX // 2  # tiles per halo sub-window (two of them)


def band_window_table_halo(
    blk_cols: np.ndarray,   # i32[R, M] one shard
    blk_mask: np.ndarray,   # [R, M]
    ns_tiles: int,          # local column tiles (halo tiles start here)
    h_tiles_total: int,     # halo column tiles available in the halo array
) -> tuple[np.ndarray, np.ndarray] | None:
    """(local_base[S], halo_bases[S, 2]) for the halo-WINDOWED banded
    kernel (round 5), or None when a band is too wide at some super tile.

    The resident-tail form (band_window_table) dies when the halo exceeds
    H_BAND_MAX tiles — exactly the multi-shard deployment (≥2 shards at
    ≥300k nuclei have thousands of halo rows). Under the shard-aligned
    stripe sort (parallel/slide_setup.spatial_sort_order), a destination
    shard's halo array is per-SOURCE-segment spatially sorted, and a super
    row tile's remote neighbours land in (at most) two narrow clusters —
    one per adjacent stripe; a group straddling an x-band edge touches
    BOTH stripe boundaries at once (measured: per-cluster span ≤2 tiles,
    cross-cluster distance ~15 tiles at 600k × 4). So the halo tail is TWO
    independently-based H_SUB-tile sub-windows, double-buffered per super
    step like the local band — same VMEM as the resident tail.

    Each sub-window's base is clamped in-range; a lone cluster gets the
    contiguous pair (hb2 = hb1 + H_SUB). Kernel mapping contract
    (_banded_halo_kernel): halo col h goes to sub-window 1 iff
    h < hb1 + H_SUB, else sub-window 2 — the builder guarantees cluster 2
    starts at ≥ hb1 + H_SUB or falls back to the contiguous pair."""
    r = blk_cols.shape[0]
    if r % G_BAND or r < G_BAND or ns_tiles < W_BAND:
        return None
    if h_tiles_total < H_BAND_MAX:
        return None  # tail fits resident — use band_window_table instead
    s_count = r // G_BAND
    base = np.zeros(s_count, np.int32)
    hbase = np.zeros((s_count, 2), np.int32)
    hmax = h_tiles_total - H_SUB
    for si in range(s_count):
        rows = slice(si * G_BAND, (si + 1) * G_BAND)
        cols = blk_cols[rows][blk_mask[rows] > 0]
        loc = cols[cols < ns_tiles]
        hal = np.unique(cols[cols >= ns_tiles] - ns_tiles)
        if len(loc):
            lo, hi = int(loc.min()), int(loc.max())
            b0 = min(lo, ns_tiles - W_BAND)
            if hi >= b0 + W_BAND:
                return None  # local band wider than the window
            base[si] = b0
        if len(hal):
            if len(hal) > 1:
                gi = int(np.argmax(np.diff(hal)))
                a, b = hal[:gi + 1], hal[gi + 1:]
            else:
                a, b = hal, hal[:0]
            hb1 = min(int(a.min()), hmax)
            if len(b) == 0 or int(b.min()) < hb1 + H_SUB:
                # one cluster (or clusters closer than a sub-window):
                # contiguous pair covering up to 2*H_SUB tiles
                span_hi = int(hal.max())
                hb1 = min(int(hal.min()), h_tiles_total - 2 * H_SUB)
                if span_hi >= hb1 + 2 * H_SUB:
                    return None
                hbase[si] = (hb1, hb1 + H_SUB)
            else:
                if int(a.max()) >= hb1 + H_SUB:
                    return None
                hb2 = min(int(b.min()), hmax)
                if int(b.max()) >= hb2 + H_SUB:
                    return None
                hbase[si] = (hb1, hb2)
    return base, hbase


def _banded_kernel(
    blk_cols_ref,   # scalar prefetch: i32[B*R*M] (flat)
    win_ref,        # scalar prefetch: i32[B*S]
    x_ref,          # ANY/HBM: [B, NCx, F] local columns
    xh_ref,         # ANY/HBM: halo-column source (x_ref itself, offset
                    #   ns_tiles*T, when the caller passed one concatenated
                    #   array; a separate [B, H*T, F] array otherwise — the
                    #   separate form lets the mega path SKIP the 228 MB
                    #   local++halo concat entirely)
    *refs,          # [acc_ref (HBM [1, NA, F], when acc_tiles)] ++
                    # vals_ref VMEM [1, G, M, T, T] (pipelined),
                    # out_ref VMEM [1, G*T, F],
                    # xw scratch [2, (W+H)*T, F], sems DMA (2,),
                    # [accw scratch (2, T, F), asem DMA (2,) (when acc)]
    r: int, m_cap: int, ns_tiles: int, h_tiles: int, halo_off: int,
    acc_tiles: int = 0, epilogue: bool = False,
):
    out_halo_ref = None
    if acc_tiles and acc_tiles < r:
        acc_ref, vals_ref, out_ref, out_halo_ref, xw, accw, sems, asem = refs
    elif acc_tiles:
        acc_ref, vals_ref, out_ref, xw, accw, sems, asem = refs
    elif epilogue:
        sw_ref, vals_ref, out_ref, xw, sww, srw, sems, esem = refs
    else:
        vals_ref, out_ref, xw, sems = refs
    bi = pl.program_id(0)
    si = pl.program_id(1)
    s_count = pl.num_programs(1)
    t = TILE
    w = W_BAND
    acc_supers = acc_tiles // G_BAND  # caller guarantees divisibility

    def acc_dma(slot, sj):
        # super-step row accumulator added to the output (round 5: the
        # pool-ds contractions ride into the transpose leg instead of a
        # separate full-width add pass). ONE [G*T, F] DMA per super step,
        # double-buffered on the band cadence — a per-[T, F]-tile schedule
        # was measured NOT to hide (the window DMA is already the binding
        # stream; +1.2 ms on the 100k transpose leg).
        return pltpu.make_async_copy(
            acc_ref.at[0, pl.ds(sj * G_BAND * t, G_BAND * t), :],
            accw.at[slot],
            asem.at[slot],
        )

    def epi_dmas(slot, sj):
        # forward _ShardedAdj epilogue (round 5): out = scale*(A@x) +
        # self_w*x_rows — x rows at the OUTPUT offset (x IS s on the A@S
        # leg) plus the [*, 128]-packed scale/self_w lanes, both on the
        # band DMA cadence
        return (
            pltpu.make_async_copy(
                x_ref.at[bi, pl.ds(sj * G_BAND * t, G_BAND * t), :],
                srw.at[slot],
                esem.at[0, slot],
            ),
            pltpu.make_async_copy(
                sw_ref.at[0, pl.ds(sj * G_BAND * t, G_BAND * t), :],
                sww.at[slot],
                esem.at[1, slot],
            ),
        )

    def band_dma(slot, sj):
        base = win_ref[bi * s_count + sj] * t
        return pltpu.make_async_copy(
            x_ref.at[bi, pl.ds(base, w * t), :],
            xw.at[slot, pl.ds(0, w * t), :],
            sems.at[slot],
        )

    @pl.when(si == 0)
    def _():
        # halo tail: tiny, copied once per batch into BOTH slots
        if h_tiles:
            for slot in range(2):
                c = pltpu.make_async_copy(
                    xh_ref.at[bi, pl.ds(halo_off, h_tiles * t), :],
                    xw.at[slot, pl.ds(w * t, h_tiles * t), :],
                    sems.at[slot],
                )
                c.start()
                c.wait()
        band_dma(0, 0).start()
        if acc_tiles:
            acc_dma(0, 0).start()
        if epilogue:
            for c in epi_dmas(0, 0):
                c.start()

    @pl.when(si + 1 < s_count)
    def _():
        band_dma((si + 1) % 2, si + 1).start()
        if acc_tiles:
            @pl.when(si + 1 < acc_supers)
            def _():
                acc_dma((si + 1) % 2, si + 1).start()
        if epilogue:
            for c in epi_dmas((si + 1) % 2, si + 1):
                c.start()

    slot = si % 2
    band_dma(slot, si).wait()
    if acc_tiles:
        @pl.when(si < acc_supers)
        def _():
            acc_dma(slot, si).wait()
    if epilogue:
        for c in epi_dmas(slot, si):
            c.wait()
    base = win_ref[bi * s_count + si]
    for gi in range(G_BAND):
        # accumulate at the lane-padded window width; the store below drops
        # the pad lanes (vector-level slice — BlockSpec outputs handle
        # non-128-multiple minor dims, manual DMAs do not)
        acc = jnp.zeros((t, xw.shape[2]), jnp.float32)
        for mi in range(m_cap):
            idx = (bi * r + si * G_BAND + gi) * m_cap + mi
            col = blk_cols_ref[idx]
            # halo tiles live at window offset W_BAND+; padded slots (col 0,
            # zero block) clamp anywhere legal
            rel = jnp.where(col >= ns_tiles, w + (col - ns_tiles), col - base)
            rel = jnp.clip(rel, 0, w + h_tiles - 1)
            xt = xw[slot, pl.ds(pl.multiple_of(rel * t, t), t), :]
            acc = acc + jnp.dot(
                vals_ref[0, gi, mi].astype(xt.dtype), xt,
                preferred_element_type=jnp.float32,
            )
        out = acc[:, : out_ref.shape[2]]
        if epilogue:
            f_out = out_ref.shape[2]
            sc = sww[slot, pl.ds(gi * t, t), 0:1].astype(jnp.float32)
            sf = sww[slot, pl.ds(gi * t, t), 1:2].astype(jnp.float32)
            st = srw[slot, pl.ds(gi * t, t), :f_out].astype(jnp.float32)
            out = sc * out + sf * st
        if not acc_tiles:
            out_ref[0, pl.ds(gi * t, t), :] = out.astype(out_ref.dtype)
        else:
            # dual outputs: acc-covered rows -> out_ref, the tail (a
            # transpose leg's halo row tiles) -> out_halo_ref. Rows past
            # the split feed a DIFFERENT consumer (the halo-exchange
            # transpose); a single [R*T, F] output forces the [:NA] slice
            # to materialize in front of the Pallas assign-tail backward
            # (+0.69 ms at 100k). Correctness rides the revisit pipeline:
            # the inactive output's window keeps its resident content and
            # flushes once after its last visit.
            @pl.when(si < acc_supers)
            def _():
                out_ref[0, pl.ds(gi * t, t), :] = (
                    out
                    + accw[slot, pl.ds(gi * t, t), : out_ref.shape[2]]
                    .astype(jnp.float32)
                ).astype(out_ref.dtype)

            if out_halo_ref is not None:
                @pl.when(si >= acc_supers)
                def _():
                    out_halo_ref[0, pl.ds(gi * t, t), :] = out.astype(
                        out_halo_ref.dtype
                    )


def _banded_halo_kernel(
    blk_cols_ref,   # scalar prefetch: i32[B*R*M] (flat)
    win_ref,        # scalar prefetch: i32[B*S] local-band bases
    hwin_ref,       # scalar prefetch: i32[B*S*2] halo sub-window bases
    x_ref,          # ANY/HBM: [B, NS, F] local columns
    xh_ref,         # ANY/HBM: [B, H*T, F] halo columns (separate array)
    *refs,          # [acc_ref (HBM [1, NA, F], when acc_tiles)] ++
                    # vals_ref VMEM [1, G, M, T, T] (pipelined),
                    # out_ref VMEM [1, G*T, F],
                    # xw scratch [2, (W+2*H_SUB)*T, F],
                    # sems DMA (3, 2): [0]=band, [1]/[2]=halo subs,
                    # [accw scratch (2, T, F), asem DMA (2,) (when acc)]
    r: int, m_cap: int, ns_tiles: int, acc_tiles: int = 0,
    epilogue: bool = False,
):
    """Halo-WINDOWED variant of _banded_kernel (round 5): instead of a
    resident halo tail copied once per batch (dies at H > H_BAND_MAX tiles
    — every multi-shard deployment), the halo columns stream through TWO
    per-super-tile H_SUB-tile sub-windows, double-buffered like the local
    band. Two windows because a group straddling an x-band edge touches
    both adjacent stripes' halo segments at once
    (band_window_table_halo)."""
    if acc_tiles:
        acc_ref, vals_ref, out_ref, xw, accw, sems, asem = refs
    elif epilogue:
        sw_ref, vals_ref, out_ref, xw, sww, srw, sems, esem = refs
    else:
        vals_ref, out_ref, xw, sems = refs
    bi = pl.program_id(0)
    si = pl.program_id(1)
    s_count = pl.num_programs(1)
    t = TILE
    w = W_BAND

    def acc_dma(slot, sj):
        # see _banded_kernel.acc_dma; this variant's blocks cover exactly
        # the acc rows (hybrid transpose), so no output split is needed
        return pltpu.make_async_copy(
            acc_ref.at[0, pl.ds(sj * G_BAND * t, G_BAND * t), :],
            accw.at[slot],
            asem.at[slot],
        )

    def epi_dmas(slot, sj):
        # see _banded_kernel.epi_dmas
        return (
            pltpu.make_async_copy(
                x_ref.at[bi, pl.ds(sj * G_BAND * t, G_BAND * t), :],
                srw.at[slot],
                esem.at[0, slot],
            ),
            pltpu.make_async_copy(
                sw_ref.at[0, pl.ds(sj * G_BAND * t, G_BAND * t), :],
                sww.at[slot],
                esem.at[1, slot],
            ),
        )

    def band_dma(slot, sj):
        base = win_ref[bi * s_count + sj] * t
        return pltpu.make_async_copy(
            x_ref.at[bi, pl.ds(base, w * t), :],
            xw.at[slot, pl.ds(0, w * t), :],
            sems.at[0, slot],
        )

    def halo_dma(slot, sj, sub):
        hb = hwin_ref[(bi * s_count + sj) * 2 + sub] * t
        off = (w + sub * H_SUB) * t
        return pltpu.make_async_copy(
            xh_ref.at[bi, pl.ds(hb, H_SUB * t), :],
            xw.at[slot, pl.ds(off, H_SUB * t), :],
            sems.at[1 + sub, slot],
        )

    @pl.when(si == 0)
    def _():
        band_dma(0, 0).start()
        halo_dma(0, 0, 0).start()
        halo_dma(0, 0, 1).start()
        if acc_tiles:
            acc_dma(0, 0).start()
        if epilogue:
            for c in epi_dmas(0, 0):
                c.start()

    @pl.when(si + 1 < s_count)
    def _():
        band_dma((si + 1) % 2, si + 1).start()
        halo_dma((si + 1) % 2, si + 1, 0).start()
        halo_dma((si + 1) % 2, si + 1, 1).start()
        if acc_tiles:
            acc_dma((si + 1) % 2, si + 1).start()
        if epilogue:
            for c in epi_dmas((si + 1) % 2, si + 1):
                c.start()

    slot = si % 2
    band_dma(slot, si).wait()
    halo_dma(slot, si, 0).wait()
    halo_dma(slot, si, 1).wait()
    if acc_tiles:
        acc_dma(slot, si).wait()
    if epilogue:
        for c in epi_dmas(slot, si):
            c.wait()
    base = win_ref[bi * s_count + si]
    hb1 = hwin_ref[(bi * s_count + si) * 2]
    hb2 = hwin_ref[(bi * s_count + si) * 2 + 1]
    for gi in range(G_BAND):
        acc = jnp.zeros((t, xw.shape[2]), jnp.float32)
        for mi in range(m_cap):
            idx = (bi * r + si * G_BAND + gi) * m_cap + mi
            col = blk_cols_ref[idx]
            # halo tiles map through the sub-window whose range holds them
            # (builder contract: sub-window 1 iff hcol < hb1 + H_SUB);
            # padded slots (col 0, zero block) clamp anywhere legal
            hcol = col - ns_tiles
            rel_h = jnp.where(
                hcol < hb1 + H_SUB,
                w + (hcol - hb1),
                w + H_SUB + (hcol - hb2),
            )
            rel = jnp.where(col >= ns_tiles, rel_h, col - base)
            rel = jnp.clip(rel, 0, w + 2 * H_SUB - 1)
            xt = xw[slot, pl.ds(pl.multiple_of(rel * t, t), t), :]
            acc = acc + jnp.dot(
                vals_ref[0, gi, mi].astype(xt.dtype), xt,
                preferred_element_type=jnp.float32,
            )
        out = acc[:, : out_ref.shape[2]]
        if acc_tiles:
            out = out + accw[
                slot, pl.ds(gi * t, t), : out_ref.shape[2]
            ].astype(jnp.float32)
        if epilogue:
            f_out = out_ref.shape[2]
            sc = sww[slot, pl.ds(gi * t, t), 0:1].astype(jnp.float32)
            sf = sww[slot, pl.ds(gi * t, t), 1:2].astype(jnp.float32)
            st = srw[slot, pl.ds(gi * t, t), :f_out].astype(jnp.float32)
            out = sc * out + sf * st
        out_ref[0, pl.ds(gi * t, t), :] = out.astype(out_ref.dtype)


def bsr_matmul_banded(
    vals: jax.Array,       # [B, R, M, T, T] from bsr_build_blocks
    blk_cols: jax.Array,   # i32[B, R, M]
    win_base: jax.Array,   # i32[B, S]  (S = R // G_BAND), band_window_table
    x: jax.Array,          # [B, NCx, F]
    ns_rows: int,          # local rows (halo rows of x start here)
    halo: jax.Array | None = None,  # [B, H*T, F] halo columns as their own
                                    #   array — skips the local++halo concat
    halo_win: jax.Array | None = None,  # i32[B, S] halo-band bases
                                        #   (band_window_table_halo) — the
                                        #   halo-windowed kernel variant
    acc: jax.Array | None = None,  # [1, NA, F] row accumulator ADDED to the
                                   #   first NA output rows in-kernel (round
                                   #   5: the pool-ds contractions ride into
                                   #   the transpose leg — kills the
                                   #   separate 4-operand full-width ct_s
                                   #   assembly pass, 2.04 ms at 100k).
                                   #   Requires B == 1, NA % T == 0 and F a
                                   #   lane multiple (manual-DMA minor
                                   #   alignment); callers fall back to the
                                   #   out-of-kernel add otherwise.
    epilogue_sw: jax.Array | None = None,  # [1, R*T, 128] with lane 0 =
                                   #   per-row scale, lane 1 = self_w:
                                   #   emit scale*(A@x) + self_w*x_row
                                   #   in-kernel (the forward _ShardedAdj
                                   #   epilogue — x IS s on the A@S leg,
                                   #   re-read at the output row offset).
                                   #   Mutually exclusive with ``acc``.
) -> jax.Array:
    """A @ x with G_BAND row tiles per grid step sharing one manually
    double-buffered column-tile window of x — the slide-scale variant of
    :func:`bsr_matmul` (that kernel's per-block x DMA is the measured
    bottleneck at F=1140: M x-tile reads per row tile).

    F is lane-padded to a 128 multiple internally: Mosaic's manual-DMA
    ``memref_slice`` requires the minor dim aligned to the (8,128) tiling
    in EVERY memory space ("Slice shape along dimension 2 must be aligned
    to tiling (128)") — only BlockSpec-pipelined operands tolerate
    unaligned minors. The pad is one extra HBM round trip of x per call
    (~1% bytes at F=1140→1152), which is why the dispatch in
    ops/ell.py:bsr_local_matmul only routes F >= BAND_MIN_F legs here —
    narrow-F legs are vals-DMA-bound and the window buys them nothing."""
    from jax.experimental.pallas import tpu as pltpu

    b, r, m = blk_cols.shape
    n, f = x.shape[1], x.shape[2]
    t = TILE
    assert r % G_BAND == 0 and ns_rows % t == 0 and n % t == 0
    s_count = r // G_BAND
    ns_tiles = ns_rows // t
    f_pad = -(-f // 128) * 128
    if f_pad != f:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, f_pad - f)))
        if halo is not None:
            halo = jnp.pad(halo, ((0, 0), (0, 0), (0, f_pad - f)))
    itemsize_ = jnp.dtype(x.dtype).itemsize
    acc_tiles = 0
    if acc is not None:
        assert b == 1 and f % 128 == 0 and acc.shape[2] == f, (
            acc.shape, b, f,
        )
        assert acc.shape[1] % (G_BAND * t) == 0
        acc_tiles = acc.shape[1] // t
        acc_spec = [pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)]
        acc_ops = [acc]
        acc_scratch = [pltpu.VMEM((2, G_BAND * t, f), acc.dtype)]
        acc_sem = [pltpu.SemaphoreType.DMA((2,))]
        acc_bytes = acc.shape[1] * f * jnp.dtype(acc.dtype).itemsize
        acc_params = pltpu.CompilerParams(
            # the double-buffered [G*T, F] acc window (~2.4 MB at F=1152)
            # tips the kernels past the default 16 MB scoped budget;
            # probed on hardware — the chip accepts the raised stack
            vmem_limit_bytes=24 * 1024 * 1024,
        )
    else:
        acc_spec, acc_ops, acc_scratch, acc_sem = [], [], [], []
        acc_bytes = 0
        acc_params = None
    epi = epilogue_sw is not None
    if epi:
        assert acc is None, "acc and epilogue_sw are mutually exclusive"
        assert b == 1 and epilogue_sw.shape[1] == r * t \
            and epilogue_sw.shape[2] == 128, (epilogue_sw.shape, r)
        acc_spec = [pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)]
        acc_ops = [epilogue_sw]
        acc_scratch = [
            pltpu.VMEM((2, G_BAND * t, 128), epilogue_sw.dtype),
            pltpu.VMEM((2, G_BAND * t, f_pad), x.dtype),
        ]
        acc_sem = [pltpu.SemaphoreType.DMA((2, 2))]
        acc_bytes = (
            r * t * (128 * jnp.dtype(epilogue_sw.dtype).itemsize
                     + f_pad * itemsize_)
        )
        acc_params = pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024,
        )
    if halo_win is not None:
        # halo-WINDOWED variant: requires the separate halo array (the mega
        # path always passes one) with at least H_BAND_MAX tiles
        if acc is not None:
            # this variant's blocks cover exactly the local rows (hybrid
            # transpose) — acc must span the whole output
            assert acc.shape[1] == r * t, (acc.shape, r)
        assert halo is not None and n == ns_rows
        assert halo.shape[1] % t == 0
        h_total = halo.shape[1] // t
        assert h_total >= H_BAND_MAX, h_total
        assert halo_win.size == b * s_count * 2, (halo_win.shape, b, s_count)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(b, s_count),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                *acc_spec,
                pl.BlockSpec(
                    (1, G_BAND, m, t, t),
                    lambda bi, si, bc, wn, hw: (bi, si, 0, 0, 0),
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, G_BAND * t, f), lambda bi, si, bc, wn, hw: (bi, si, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((2, (W_BAND + 2 * H_SUB) * t, f_pad), x.dtype),
                *acc_scratch,
                pltpu.SemaphoreType.DMA((3, 2)),
                *acc_sem,
            ],
        )
        return pl.pallas_call(
            functools.partial(
                _banded_halo_kernel, r=r, m_cap=m, ns_tiles=ns_tiles,
                acc_tiles=acc_tiles, epilogue=epi,
            ),
            out_shape=jax.ShapeDtypeStruct((b, r * t, f), x.dtype),
            grid_spec=grid_spec,
            interpret=_INTERPRET,
            compiler_params=acc_params,
            cost_estimate=pl.CostEstimate(
                flops=2 * b * r * m * t * t * f_pad,
                bytes_accessed=(
                    b * r * m * t * t * jnp.dtype(vals.dtype).itemsize
                    + b * s_count * (W_BAND + H_BAND_MAX) * t * f_pad
                    * itemsize_
                    + b * r * t * f * itemsize_
                    + acc_bytes
                ),
                transcendentals=0,
            ),
        )(
            blk_cols.reshape(-1), win_base.reshape(-1),
            halo_win.reshape(-1), x, halo, *acc_ops, vals,
        )
    if halo is None:
        h_tiles = n // t - ns_tiles
        xh, halo_off = x, ns_tiles * t
    else:
        assert n == ns_rows and halo.shape[1] % t == 0
        h_tiles = halo.shape[1] // t
        xh, halo_off = halo, 0
    assert 0 <= h_tiles <= H_BAND_MAX, h_tiles
    if acc_tiles and acc_tiles < r:
        # dual outputs (acc rows | tail rows); both out windows rely on
        # the revisit pipeline — inactive steps clamp to the nearest real
        # block and leave its resident content untouched until the single
        # final flush
        acc_supers = acc_tiles // G_BAND
        out_specs = [
            pl.BlockSpec(
                (1, G_BAND * t, f),
                lambda bi, si, bc, wn: (bi, jnp.minimum(si, acc_supers - 1),
                                        0),
            ),
            pl.BlockSpec(
                (1, G_BAND * t, f),
                lambda bi, si, bc, wn: (bi, jnp.maximum(si - acc_supers, 0),
                                        0),
            ),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((b, acc_tiles * t, f), x.dtype),
            jax.ShapeDtypeStruct((b, (r - acc_tiles) * t, f), x.dtype),
        ]
    else:
        out_specs = pl.BlockSpec(
            (1, G_BAND * t, f), lambda bi, si, bc, wn: (bi, si, 0)
        )
        out_shape = jax.ShapeDtypeStruct((b, r * t, f), x.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, s_count),
        in_specs=[
            # HBM, not ANY: the kernel's manual band/halo DMAs assume HBM
            # sources (an ANY-spaced small operand can be promoted to VMEM,
            # changing the copy's legality constraints); validated on
            # hardware with the lane-padded operands above.
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            *acc_spec,
            pl.BlockSpec(
                (1, G_BAND, m, t, t),
                lambda bi, si, bc, wn: (bi, si, 0, 0, 0),
            ),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((2, (W_BAND + h_tiles) * t, f_pad), x.dtype),
            *acc_scratch,
            pltpu.SemaphoreType.DMA((2,)),
            *acc_sem,
        ],
    )
    itemsize = jnp.dtype(x.dtype).itemsize
    return pl.pallas_call(
        functools.partial(
            _banded_kernel, r=r, m_cap=m, ns_tiles=ns_tiles,
            h_tiles=h_tiles, halo_off=halo_off, acc_tiles=acc_tiles,
            epilogue=epi,
        ),
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=_INTERPRET,
        compiler_params=acc_params,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * r * m * t * t * f_pad,
            bytes_accessed=(
                b * r * m * t * t * jnp.dtype(vals.dtype).itemsize
                + b * s_count * (W_BAND + h_tiles) * t * f_pad * itemsize
                + b * r * t * f * itemsize
                + acc_bytes
            ),
            transcendentals=0,
        ),
    )(blk_cols.reshape(-1), win_base.reshape(-1), x, xh, *acc_ops, vals)


def bsr_gather_sum(
    nbr: jax.Array,        # i32[B, N, K]
    w: jax.Array,          # f32[B, N, K] (mask folded in)
    blk_cols: jax.Array,   # i32[B, R, M]
    blk_mask: jax.Array,   # i32/f32[B, R, M]
    x: jax.Array,          # [B, N, F]
) -> jax.Array:
    """out[b,i] = sum_k w[b,i,k] * x[b, nbr[b,i,k]] via block-sparse MXU.

    Equivalent to ops.ell.ell_gather_sum given correct block metadata
    (every edge's column tile listed in ``blk_cols`` for its row tile).
    """
    b, n, k = nbr.shape
    f = x.shape[-1]
    itemsize = jnp.dtype(x.dtype).itemsize
    # lane-padded width, like bsr_matmul's residency gate above
    if n * (-(-f // 128) * 128) * itemsize <= _RESIDENT_LIMIT:
        return _bsr_resident_call(nbr, w, blk_cols, blk_mask, x)
    r = n // TILE
    m = blk_cols.shape[-1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, r, m),
        in_specs=[
            pl.BlockSpec(
                (1, TILE, k), lambda bi, ri, mi, bc, bm: (bi, ri, 0)
            ),
            pl.BlockSpec(
                (1, TILE, k), lambda bi, ri, mi, bc, bm: (bi, ri, 0)
            ),
            pl.BlockSpec(
                (1, TILE, f),
                lambda bi, ri, mi, bc, bm: (
                    bi, bc[(bi * r + ri) * m + mi], 0
                ),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, TILE, f), lambda bi, ri, mi, bc, bm: (bi, ri, 0)
        ),
    )
    return pl.pallas_call(
        functools.partial(_bsr_kernel, r=r, m_cap=m),
        out_shape=jax.ShapeDtypeStruct((b, n, f), x.dtype),
        grid_spec=grid_spec,
        interpret=_INTERPRET,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * r * m * TILE * TILE * f,
            bytes_accessed=b * n * (2 * k * 4 + 2 * f * 4),
            transcendentals=0,
        ),
    )(
        blk_cols.reshape(-1),
        blk_mask.astype(jnp.int32).reshape(-1),
        nbr, w.astype(jnp.float32), x,
    )
