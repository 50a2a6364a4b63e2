"""Banded x-window BSR kernel (bsr_matmul_banded) vs the streamed kernel.

The streamed large-F kernel re-DMAs each x column tile once per (row tile,
block slot) — the measured 2.8 ms/leg A@S bottleneck at slide scale
(benchmarks/roofline_r3.md §4, r4 profile). The banded kernel shares one
contiguous column-tile window across G_BAND row tiles; these tests pin its
numerics to the streamed kernel on synthetic band-limited operators.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cgcnet_tpu.ops.pallas import bsr_kernel as bk

T = bk.TILE


@pytest.fixture(autouse=True)
def _interp():
    bk.set_interpret(True)
    yield
    bk.set_interpret(False)


def make_banded(rng, r=16, m=4, ns_tiles=16, halo_every=5):
    """Random band-limited block structure with occasional halo columns."""
    blk_cols = np.zeros((1, r, m), np.int32)
    blk_mask = np.zeros((1, r, m), np.float32)
    for ri in range(r):
        lo, hi = max(0, ri - 2), min(ns_tiles - 1, ri + 1)
        cand = list(range(lo, hi + 1))
        nreal = int(rng.integers(1, min(m, len(cand)) + 1))
        cols = sorted(rng.choice(cand, size=nreal, replace=False).tolist())
        if halo_every and ri % halo_every == 0 and nreal < m:
            cols, nreal = cols + [ns_tiles], nreal + 1
        blk_cols[0, ri, :nreal] = cols
        blk_mask[0, ri, :nreal] = 1.0
    vals = (
        rng.normal(size=(1, r, m, T, T)).astype(np.float32)
        * blk_mask[..., None, None]
    )
    return blk_cols, blk_mask, vals


@pytest.mark.parametrize("dtype", [np.float32, np.int8])
def test_banded_matches_streamed(rng, dtype):
    blk_cols, blk_mask, vals = make_banded(rng)
    ns_tiles, h_tiles, f = 16, 1, 70
    if dtype == np.int8:
        vals = (vals > 0.5).astype(np.int8)
    x = rng.normal(size=(1, (ns_tiles + h_tiles) * T, f)).astype(np.float32)
    win = bk.band_window_table(blk_cols[0], blk_mask[0], ns_tiles)
    assert win is not None
    ref = bk.bsr_matmul(jnp.asarray(vals), jnp.asarray(blk_cols),
                        jnp.asarray(x))
    out = bk.bsr_matmul_banded(
        jnp.asarray(vals), jnp.asarray(blk_cols), jnp.asarray(win)[None],
        jnp.asarray(x), ns_rows=ns_tiles * T,
    )
    # atol: the banded kernel is bit-exact vs a numpy per-block oracle; the
    # STREAMED reference carries ~4e-5 f32 reassociation drift (its dot
    # shapes differ from the banded kernel's lane-padded ones, so XLA
    # accumulates in a different order). |out| ~ 35 here.
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_banded_separate_halo_matches_concat(rng):
    """halo= as its own array == the same rows concatenated into x."""
    blk_cols, blk_mask, vals = make_banded(rng)
    ns_tiles, h_tiles, f = 16, 1, 36
    x = rng.normal(size=(1, ns_tiles * T, f)).astype(np.float32)
    halo = rng.normal(size=(1, h_tiles * T, f)).astype(np.float32)
    win = bk.band_window_table(blk_cols[0], blk_mask[0], ns_tiles)
    xx = np.concatenate([x, halo], axis=1)
    ref = bk.bsr_matmul_banded(
        jnp.asarray(vals), jnp.asarray(blk_cols), jnp.asarray(win)[None],
        jnp.asarray(xx), ns_rows=ns_tiles * T,
    )
    out = bk.bsr_matmul_banded(
        jnp.asarray(vals), jnp.asarray(blk_cols), jnp.asarray(win)[None],
        jnp.asarray(x), ns_rows=ns_tiles * T, halo=jnp.asarray(halo),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0)


def make_banded_big_halo(rng, r=16, m=4, ns_tiles=16, h_total=12):
    """Band structure whose halo columns span MANY tiles (> H_BAND_MAX) but
    stay locally narrow per super tile — the multi-shard deployment shape:
    each super tile's remote neighbours are spatially near, so they land in
    a drifting narrow strip of the (globally sorted) halo array."""
    blk_cols = np.zeros((1, r, m), np.int32)
    blk_mask = np.zeros((1, r, m), np.float32)
    s_count = r // bk.G_BAND
    for ri in range(r):
        lo, hi = max(0, ri - 2), min(ns_tiles - 1, ri + 1)
        cols = sorted(
            rng.choice(range(lo, hi + 1), size=2, replace=False).tolist()
        )
        # one halo column per row, drifting through the halo space with the
        # super-tile index (span per super tile <= 2 < H_BAND_MAX)
        si = ri // bk.G_BAND
        drift = (si * (h_total - 2)) // max(s_count - 1, 1)
        hcol = ns_tiles + min(drift + (ri % 2), h_total - 1)
        blk_cols[0, ri, :3] = cols + [hcol]
        blk_mask[0, ri, :3] = 1.0
    vals = (
        rng.normal(size=(1, r, m, T, T)).astype(np.float32)
        * blk_mask[..., None, None]
    )
    return blk_cols, blk_mask, vals


def test_banded_halo_window_matches_streamed(rng):
    """Halo-WINDOWED banded kernel (round 5) == streamed kernel when the
    halo exceeds the resident-tail cap: the multi-shard capacity path.
    Checks the resident-form table correctly refuses this shape and the
    halo-window table accepts it."""
    ns_tiles, h_total, f = 16, 12, 70
    blk_cols, blk_mask, vals = make_banded_big_halo(
        rng, ns_tiles=ns_tiles, h_total=h_total
    )
    x = rng.normal(size=(1, ns_tiles * T, f)).astype(np.float32)
    halo = rng.normal(size=(1, h_total * T, f)).astype(np.float32)
    tabs = bk.band_window_table_halo(
        blk_cols[0], blk_mask[0], ns_tiles, h_total
    )
    assert tabs is not None
    win, hwin = tabs
    xx = np.concatenate([x, halo], axis=1)
    ref = bk.bsr_matmul(jnp.asarray(vals), jnp.asarray(blk_cols),
                        jnp.asarray(xx))
    out = bk.bsr_matmul_banded(
        jnp.asarray(vals), jnp.asarray(blk_cols), jnp.asarray(win)[None],
        jnp.asarray(x), ns_rows=ns_tiles * T, halo=jnp.asarray(halo),
        halo_win=jnp.asarray(hwin)[None],
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_banded_two_cluster_halo_matches_streamed(rng):
    """A group touching TWO distant halo clusters (the band-edge-straddling
    case: both adjacent stripes' segments at once) routes each through its
    own sub-window."""
    ns_tiles, h_total, f = 16, 12, 70
    blk_cols, blk_mask, vals = make_banded_big_halo(
        rng, ns_tiles=ns_tiles, h_total=h_total
    )
    # group 0 rows touch halo tiles 0 and 11 — clusters 11 tiles apart
    blk_cols[0, 0, 3] = ns_tiles
    blk_cols[0, 1, 3] = ns_tiles + h_total - 1
    blk_mask[0, :2, 3] = 1.0
    vals = (
        rng.normal(size=vals.shape).astype(np.float32)
        * blk_mask[..., None, None]
    )
    x = rng.normal(size=(1, ns_tiles * T, f)).astype(np.float32)
    halo = rng.normal(size=(1, h_total * T, f)).astype(np.float32)
    tabs = bk.band_window_table_halo(
        blk_cols[0], blk_mask[0], ns_tiles, h_total
    )
    assert tabs is not None
    win, hwin = tabs
    assert hwin.shape == (ns_tiles // bk.G_BAND, 2)
    assert hwin[0, 1] - hwin[0, 0] > bk.H_SUB  # genuinely two clusters
    xx = np.concatenate([x, halo], axis=1)
    ref = bk.bsr_matmul(jnp.asarray(vals), jnp.asarray(blk_cols),
                        jnp.asarray(xx))
    out = bk.bsr_matmul_banded(
        jnp.asarray(vals), jnp.asarray(blk_cols), jnp.asarray(win)[None],
        jnp.asarray(x), ns_rows=ns_tiles * T, halo=jnp.asarray(halo),
        halo_win=jnp.asarray(hwin)[None],
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_halo_window_table_rejects_wide_halo_band(rng):
    """A super tile whose halo tiles need more than two H_SUB sub-windows
    must reject (fallback to streamed), and a resident-size halo defers to
    the resident-tail form."""
    ns_tiles, h_total = 16, 12
    blk_cols, blk_mask, _ = make_banded_big_halo(
        rng, ns_tiles=ns_tiles, h_total=h_total
    )
    # three spread clusters in one group: {0}, {5}, {11} — after the
    # largest-gap split, cluster A = {0, 5} spans > H_SUB -> reject
    blk_cols[0, 0, 3] = ns_tiles
    blk_cols[0, 1, 3] = ns_tiles + 5
    blk_cols[0, 2, 3] = ns_tiles + h_total - 1
    blk_mask[0, :3, 3] = 1.0
    assert bk.band_window_table_halo(
        blk_cols[0], blk_mask[0], ns_tiles, h_total
    ) is None
    # halo small enough for the resident tail -> use band_window_table
    assert bk.band_window_table_halo(
        blk_cols[0], blk_mask[0], ns_tiles, bk.H_BAND_MAX - 1
    ) is None


def test_window_table_rejects_wide_band(rng):
    """A row-tile group whose columns span more than W_BAND tiles must
    return None (caller falls back to the streamed kernel)."""
    blk_cols, blk_mask, _ = make_banded(rng, r=16, ns_tiles=32)
    blk_cols[0, 0, 0], blk_cols[0, 0, 1] = 0, 31  # span 32 > W_BAND
    blk_mask[0, 0, :2] = 1.0
    assert bk.band_window_table(blk_cols[0], blk_mask[0], 32) is None
    # non-G_BAND-divisible row counts are also rejected
    assert bk.band_window_table(blk_cols[0, :15], blk_mask[0, :15], 32) is None


def test_banded_acc_matches_post_add(rng):
    """acc= (in-kernel row accumulator, round 5) == kernel + out-of-kernel
    add on the acc-covered rows; rows past acc (halo row tiles of a
    transpose leg) must be untouched by the accumulator."""
    blk_cols, blk_mask, vals = make_banded(rng)
    ns_tiles, h_tiles, f = 16, 1, 128  # acc needs a lane-multiple F
    x = rng.normal(size=(1, (ns_tiles + h_tiles) * T, f)).astype(np.float32)
    win = bk.band_window_table(blk_cols[0], blk_mask[0], ns_tiles)
    # acc covers 3 of the 4 super tiles (12 of 16 row tiles); the kernel
    # then emits (acc rows, tail rows) as separate outputs
    na = 12 * T
    acc = rng.normal(size=(1, na, f)).astype(np.float32)
    base = bk.bsr_matmul_banded(
        jnp.asarray(vals), jnp.asarray(blk_cols), jnp.asarray(win)[None],
        jnp.asarray(x), ns_rows=ns_tiles * T,
    )
    loc, tail = bk.bsr_matmul_banded(
        jnp.asarray(vals), jnp.asarray(blk_cols), jnp.asarray(win)[None],
        jnp.asarray(x), ns_rows=ns_tiles * T, acc=jnp.asarray(acc),
    )
    ref = np.array(base)
    ref[:, :na] += acc[0]
    np.testing.assert_allclose(np.asarray(loc), ref[:, :na], atol=1e-5)
    np.testing.assert_allclose(np.asarray(tail), ref[:, na:], atol=1e-5)


def test_banded_halo_window_acc_matches_post_add(rng):
    """acc= on the halo-WINDOWED variant (the multi-shard transpose leg)."""
    ns_tiles, h_total, f = 16, 12, 128
    blk_cols, blk_mask, vals = make_banded_big_halo(
        rng, ns_tiles=ns_tiles, h_total=h_total
    )
    x = rng.normal(size=(1, ns_tiles * T, f)).astype(np.float32)
    halo = rng.normal(size=(1, h_total * T, f)).astype(np.float32)
    win, hwin = bk.band_window_table_halo(
        blk_cols[0], blk_mask[0], ns_tiles, h_total
    )
    acc = rng.normal(size=(1, ns_tiles * T, f)).astype(np.float32)
    args = (jnp.asarray(vals), jnp.asarray(blk_cols), jnp.asarray(win)[None])
    kw = dict(ns_rows=ns_tiles * T, halo=jnp.asarray(halo),
              halo_win=jnp.asarray(hwin)[None])
    base = bk.bsr_matmul_banded(*args, jnp.asarray(x), **kw)
    out = bk.bsr_matmul_banded(
        *args, jnp.asarray(x), acc=jnp.asarray(acc), **kw
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(base) + acc[0], atol=1e-5
    )


def test_banded_epilogue_matches_post_scale(rng):
    """epilogue_sw= (in-kernel forward _ShardedAdj epilogue) ==
    scale*(A@x) + self_w*x_rows applied outside."""
    blk_cols, blk_mask, vals = make_banded(rng)
    ns_tiles, h_tiles, f = 16, 1, 128
    x = rng.normal(size=(1, (ns_tiles + h_tiles) * T, f)).astype(np.float32)
    win = bk.band_window_table(blk_cols[0], blk_mask[0], ns_tiles)
    scale = rng.normal(size=(16 * T,)).astype(np.float32)
    self_w = rng.normal(size=(16 * T,)).astype(np.float32)
    sw = np.zeros((1, 16 * T, 128), np.float32)
    sw[0, :, 0], sw[0, :, 1] = scale, self_w
    base = bk.bsr_matmul_banded(
        jnp.asarray(vals), jnp.asarray(blk_cols), jnp.asarray(win)[None],
        jnp.asarray(x), ns_rows=ns_tiles * T,
    )
    out = bk.bsr_matmul_banded(
        jnp.asarray(vals), jnp.asarray(blk_cols), jnp.asarray(win)[None],
        jnp.asarray(x), ns_rows=ns_tiles * T, epilogue_sw=jnp.asarray(sw),
    )
    ref = (scale[:, None] * np.asarray(base)[0]
           + self_w[:, None] * x[0, : 16 * T])
    np.testing.assert_allclose(np.asarray(out)[0], ref, atol=2e-4)


def test_banded_halo_window_epilogue_matches_post_scale(rng):
    ns_tiles, h_total, f = 16, 12, 128
    blk_cols, blk_mask, vals = make_banded_big_halo(
        rng, ns_tiles=ns_tiles, h_total=h_total
    )
    x = rng.normal(size=(1, ns_tiles * T, f)).astype(np.float32)
    halo = rng.normal(size=(1, h_total * T, f)).astype(np.float32)
    win, hwin = bk.band_window_table_halo(
        blk_cols[0], blk_mask[0], ns_tiles, h_total
    )
    scale = rng.normal(size=(ns_tiles * T,)).astype(np.float32)
    self_w = rng.normal(size=(ns_tiles * T,)).astype(np.float32)
    sw = np.zeros((1, ns_tiles * T, 128), np.float32)
    sw[0, :, 0], sw[0, :, 1] = scale, self_w
    args = (jnp.asarray(vals), jnp.asarray(blk_cols), jnp.asarray(win)[None])
    kw = dict(ns_rows=ns_tiles * T, halo=jnp.asarray(halo),
              halo_win=jnp.asarray(hwin)[None])
    base = bk.bsr_matmul_banded(*args, jnp.asarray(x), **kw)
    out = bk.bsr_matmul_banded(
        *args, jnp.asarray(x), epilogue_sw=jnp.asarray(sw), **kw
    )
    ref = (scale[:, None] * np.asarray(base)[0]
           + self_w[:, None] * x[0])
    np.testing.assert_allclose(np.asarray(out)[0], ref, atol=2e-4)
