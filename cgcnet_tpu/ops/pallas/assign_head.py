"""Fused assign-head tail: folded-lin matmul + softmax + dual-layout S.

Profiling the canonical train step (benchmarks/profile_step.py) shows the
DiffPool assignment chain dominating the serial timeline even after the BN
affine is folded into the lin kernel (nn/blocks.py::finish_folded): the
[B, 5760, 1140] logits tensor is materialized, the f32 softmax makes
several more passes, and XLA keeps S in TWO layouts — {2,1,0} for the
Pallas A@S matvec and a transposed {1,0,2} for the S^T contractions —
paying ~450 us/step of pure relayout copies.

This kernel computes, per row tile, entirely in VMEM:

    logits = x12 @ K12 + h3a @ K3f + const     (f32 accumulation)
    s      = softmax(logits, axis=-1) * mask   (f32, cast to out dtype)

so the logits tensor never exists in HBM and the softmax is single-pass.
The transposed consumer layout ``s_t`` [B, C, N] (for S^T x / S^T(A S)) is
produced by ONE XLA relayout copy of ``s`` — measured ~600 us/step cheaper
at the canonical shape than emitting S^T from the kernel, because Mosaic's
in-register (tile, C) transpose serializes the whole kernel.

Backward is plain jnp (custom VJP): the softmax/mask cotangent fold is one
fused elementwise pass and the four matmuls are XLA dots that already ran
near peak in the unfused graph.

Reference op order being replaced: model/network.py:194-208 (softmax of the
assignment logits) with the GNN_Module lin epilogue model/network.py:78-82.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

TILE = 128

_INTERPRET = False


def set_interpret(value: bool) -> None:
    global _INTERPRET
    _INTERPRET = value


def _pick_tile(n: int) -> int:
    """Row-tile size: 384 halves per-step grid overhead at the canonical
    capacities (measured ~10% faster than 128 on v5e) while staying under
    the 16 MiB scoped-VMEM budget; capacities are multiples of 128 so fall
    back when 384 doesn't divide."""
    return 384 if n % 384 == 0 else TILE


def _kernel(nn_ref, x12_ref, h3a_ref, k12_ref, k3f_ref, const_ref,
            s_ref, *, tile: int):
    bi = pl.program_id(0)
    ri = pl.program_id(1)
    acc = jnp.dot(
        x12_ref[0], k12_ref[...], preferred_element_type=jnp.float32
    )
    acc = acc + jnp.dot(
        h3a_ref[0], k3f_ref[...], preferred_element_type=jnp.float32
    )
    logits = acc + const_ref[0][None, :]
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    s = e / jnp.sum(e, axis=-1, keepdims=True)
    # prefix row mask from the scalar-prefetched per-batch node count
    # (a [B, N] mask operand would need an un-tileable (1, 128) block)
    rows = ri * tile + jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
    s = s * (rows < nn_ref[bi]).astype(jnp.float32)
    s_ref[0] = s.astype(s_ref.dtype)


def _interpret() -> bool:
    # follow the BSR kernel's interpret toggle: CPU tests that turn on the
    # Pallas stage-1 path expect the whole pallas tier to run interpreted
    from cgcnet_tpu.ops.pallas import bsr_kernel

    return _INTERPRET or bsr_kernel._INTERPRET


def _fwd_call(x12, h3a, k12, k3f, const, mask):
    from jax.experimental.pallas import tpu as pltpu

    b, n, c = h3a.shape
    f12 = x12.shape[-1]
    tile = _pick_tile(n)
    assert n % tile == 0, n
    dt = h3a.dtype
    # the model's mask is always the prefix `row < n_nodes` (CellGraph.mask)
    nn = jnp.sum(mask.astype(jnp.float32), axis=1).astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n // tile),
        in_specs=[
            pl.BlockSpec((1, tile, f12), lambda bi, ri, nn: (bi, ri, 0)),
            pl.BlockSpec((1, tile, c), lambda bi, ri, nn: (bi, ri, 0)),
            pl.BlockSpec((f12, c), lambda bi, ri, nn: (0, 0)),
            pl.BlockSpec((c, c), lambda bi, ri, nn: (0, 0)),
            pl.BlockSpec((1, c), lambda bi, ri, nn: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile, c), lambda bi, ri, nn: (bi, ri, 0)),
    )
    s = pl.pallas_call(
        functools.partial(_kernel, tile=tile),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n, c), dt),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * c * (f12 + c),
            bytes_accessed=b * n * (f12 + 2 * c) * jnp.dtype(dt).itemsize,
            transcendentals=b * n * c,
        ),
    )(nn, x12, h3a, k12.astype(dt), k3f.astype(dt), const[None, :])
    # the transposed consumer layout is a single XLA relayout copy — CHEAPER
    # than emitting S^T from the kernel: Mosaic's in-register (tile, C)
    # transpose serializes the whole kernel (~600 us/step measured loss at
    # the canonical shape)
    return s, jnp.swapaxes(s, 1, 2)


@jax.custom_vjp
def assign_head_softmax(
    x12: jax.Array,    # [B, N, F12] layers 1-2 concat (masked)
    h3a: jax.Array,    # [B, N, C]   layer-3 pre-BN activation (masked)
    k12: jax.Array,    # [F12, C]    lin kernel rows for x12
    k3f: jax.Array,    # [C, C]      BN-folded lin kernel rows for h3a
    const: jax.Array,  # [C] f32     folded bias: (beta - mu*inv) @ K3 + b
    mask: jax.Array,   # [B, N]      0/1 valid-row mask
) -> tuple[jax.Array, jax.Array]:
    """(S [B,N,C], S^T [B,C,N]) = masked softmax of the folded assign logits.

    Matches ``GNNBlock.finish_folded`` + ``jax.nn.softmax`` + row-mask
    bit-for-bit up to the f32/bf16 rounding of a single fused pass.

    Contract: ``mask`` must be a 0/1 PREFIX mask (rows < n_nodes, which is
    what ``CellGraph.mask`` produces) — the kernel reconstructs the per-batch
    count and rebuilds the mask from a scalar-prefetched i32[B].
    """
    return _fwd_call(x12, h3a, k12, k3f, const, mask)


def _ah_fwd(x12, h3a, k12, k3f, const, mask):
    s, s_t = _fwd_call(x12, h3a, k12, k3f, const, mask)
    return (s, s_t), (x12, h3a, k12, k3f, s, mask)


def _rnorm_h(pt: jax.Array) -> tuple[jax.Array, jax.Array]:
    """L2 row norm + relu fold: relu(l2norm(p)) == rnorm * relu(p) because
    the norm scale is positive. ``pt`` is f32 [..., C]; returns (rnorm
    [..., 1], h [..., C] f32) matching F.normalize(eps=1e-12) + relu."""
    ss = jnp.sum(pt * pt, axis=-1, keepdims=True)
    rnorm = 1.0 / jnp.maximum(jnp.sqrt(ss), 1e-12)
    return rnorm, jnp.maximum(pt, 0.0) * rnorm


def _stats_kernel(nn_ref, p_ref, sum_ref, sq_ref, *, tile: int):
    bi = pl.program_id(0)
    ri = pl.program_id(1)

    @pl.when((bi == 0) & (ri == 0))
    def _init():
        sum_ref[...] = jnp.zeros_like(sum_ref)
        sq_ref[...] = jnp.zeros_like(sq_ref)

    pt = p_ref[0].astype(jnp.float32)
    _, h = _rnorm_h(pt)
    rows = ri * tile + jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
    h = h * (rows < nn_ref[bi]).astype(jnp.float32)
    # round through the compute dtype: the unfused path materializes h3a in
    # bf16 before BN reads it, so the statistics see rounded values
    h = h.astype(p_ref.dtype).astype(jnp.float32)
    sum_ref[...] += jnp.sum(h, axis=0)[None, :]
    sq_ref[...] += jnp.sum(h * h, axis=0)[None, :]


def _stats_call(p, mask):
    from jax.experimental.pallas import tpu as pltpu

    b, n, c = p.shape
    tile = _pick_tile(n)
    assert n % tile == 0, n
    nn = jnp.sum(mask.astype(jnp.float32), axis=1).astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n // tile),
        in_specs=[
            pl.BlockSpec((1, tile, c), lambda bi, ri, nn: (bi, ri, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, c), lambda bi, ri, nn: (0, 0)),
            pl.BlockSpec((1, c), lambda bi, ri, nn: (0, 0)),
        ),
    )
    ssum, ssq = pl.pallas_call(
        functools.partial(_stats_kernel, tile=tile),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=6 * b * n * c,
            bytes_accessed=b * n * c * jnp.dtype(p.dtype).itemsize,
            transcendentals=b * n,
        ),
    )(nn, p)
    return ssum[0], ssq[0]


@jax.custom_vjp
def l2relu_stats(p: jax.Array, mask: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(sum[C], sumsq[C]) f32 of h = rowmask * relu(l2norm(p)) in ONE pass.

    h is conv3's post-normalize post-relu activation (SAGEConv semantics,
    reference model/network.py:95 + PyG DenseSAGEConv normalize=True) — the
    BN batch statistics' input. The [B, N, C] h tensor never reaches HBM.
    ``mask`` must be a 0/1 prefix row mask (CellGraph.mask contract).
    """
    return _stats_call(p, mask)


def _stats_fwd(p, mask):
    return _stats_call(p, mask), (p, mask)


def _stats_bwd(res, cts):
    p, mask = res
    du, dw = cts
    pf = p.astype(jnp.float32)
    rnorm, h = _rnorm_h(pf)
    h = h * mask[..., None].astype(jnp.float32)
    dh = du[None, None, :] + 2.0 * h * dw[None, None, :]
    # dp = mask*relu'(p)*rnorm*dh - rnorm^2 * p * sum_c(dh * h)
    # (the sum term is already row-masked through h)
    rd = jnp.sum(dh * h, axis=-1, keepdims=True)
    dp = (
        mask[..., None].astype(jnp.float32) * (pf > 0) * rnorm * dh
        - rnorm * rnorm * pf * rd
    )
    return dp.astype(p.dtype), jnp.zeros_like(mask)


l2relu_stats.defvjp(_stats_fwd, _stats_bwd)


def _kernel_pre(nn_ref, x12_ref, p_ref, k12_ref, k3f_ref, const_ref,
                s_ref, *, tile: int):
    bi = pl.program_id(0)
    ri = pl.program_id(1)
    pt = p_ref[0].astype(jnp.float32)
    _, h = _rnorm_h(pt)
    # h feeds the MXU in the compute dtype, same rounding as the unfused
    # path's materialized h3a; padded rows need no mask here — their junk
    # logits are killed by the final row mask exactly like _kernel
    acc = jnp.dot(
        x12_ref[0], k12_ref[...], preferred_element_type=jnp.float32
    )
    acc = acc + jnp.dot(
        h.astype(p_ref.dtype), k3f_ref[...],
        preferred_element_type=jnp.float32,
    )
    logits = acc + const_ref[0][None, :]
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    s = e / jnp.sum(e, axis=-1, keepdims=True)
    rows = ri * tile + jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
    s = s * (rows < nn_ref[bi]).astype(jnp.float32)
    c_out = s_ref.shape[-1]
    if c_out != s.shape[-1]:
        # lane-padded emission (c_out = next 128 multiple): EXACT-zero pad
        # columns, so downstream matmuls/softmax-VJP algebra see the same
        # values and the [N, C]->[N, c_out] jnp.pad that fed the banded
        # kernel's aligned-minor manual DMA (2 x 0.69 ms at 100k nuclei,
        # roofline_r4 §4) disappears — S is born aligned
        s = jnp.concatenate(
            [s, jnp.zeros((tile, c_out - s.shape[-1]), s.dtype)], axis=-1
        )
    s_ref[0] = s.astype(s_ref.dtype)


def _fwd_call_pre(x12, p, k12, k3f, const, mask, tile: int | None = None,
                  c_out: int | None = None):
    from jax.experimental.pallas import tpu as pltpu

    b, n, c = p.shape
    co = c if c_out is None else c_out
    assert co >= c, (co, c)
    f12 = x12.shape[-1]
    tile = _pick_tile(n) if tile is None else tile
    assert n % tile == 0, (n, tile)
    dt = p.dtype
    nn = jnp.sum(mask.astype(jnp.float32), axis=1).astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n // tile),
        in_specs=[
            pl.BlockSpec((1, tile, f12), lambda bi, ri, nn: (bi, ri, 0)),
            pl.BlockSpec((1, tile, c), lambda bi, ri, nn: (bi, ri, 0)),
            pl.BlockSpec((f12, c), lambda bi, ri, nn: (0, 0)),
            pl.BlockSpec((c, c), lambda bi, ri, nn: (0, 0)),
            pl.BlockSpec((1, c), lambda bi, ri, nn: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile, co), lambda bi, ri, nn: (bi, ri, 0)),
    )
    s = pl.pallas_call(
        functools.partial(_kernel_pre, tile=tile),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n, co), dt),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * c * (f12 + c),
            bytes_accessed=b * n * (f12 + c + co) * jnp.dtype(dt).itemsize,
            transcendentals=b * n * (c + 1),
        ),
    )(nn, x12, p, k12.astype(dt), k3f.astype(dt), const[None, :])
    # one XLA relayout instead of an in-kernel transpose (see _fwd_call)
    return s, jnp.swapaxes(s, 1, 2)


@jax.custom_vjp
def assign_head_softmax_pre(
    x12: jax.Array,    # [B, N, F12] layers 1-2 concat (masked)
    p: jax.Array,      # [B, N, C]   conv3 raw lin output (pre-normalize)
    k12: jax.Array,    # [F12, C]    lin kernel rows for x12
    k3f: jax.Array,    # [C, C]      BN-folded lin kernel rows for h3a
    const: jax.Array,  # [C] f32     folded bias: (beta - mu*inv) @ K3 + b
    mask: jax.Array,   # [B, N]      0/1 prefix valid-row mask
) -> tuple[jax.Array, jax.Array]:
    """Deeper-fused assign head: L2-normalize + relu recomputed per tile in
    VMEM from the raw conv3 lin output, then the folded logits + masked
    softmax of :func:`assign_head_softmax` — neither the normalized
    activation nor the logits ever reach HBM, forward or backward.

    Replaces the reference chain DenseSAGEConv.normalize (PyG 1.2.1) -> relu
    (model/network.py:84-91) -> BN affine fold -> lin epilogue
    (model/network.py:78-82) -> assignment softmax (model/network.py:194-208).
    """
    return _fwd_call_pre(x12, p, k12, k3f, const, mask)


def _ahp_fwd(x12, p, k12, k3f, const, mask):
    s, s_t = _fwd_call_pre(x12, p, k12, k3f, const, mask)
    return (s, s_t), (x12, p, k12, k3f, s, mask)


def _ahp_bwd(res, cts):
    x12, p, k12, k3f, s, mask = res
    ds, ds_t = cts
    g = ds + jnp.swapaxes(ds_t, 1, 2)
    gf = g.astype(jnp.float32)
    sf = s.astype(jnp.float32)
    dl32 = sf * (gf - jnp.sum(gf * sf, axis=-1, keepdims=True))
    dl = dl32.astype(s.dtype)
    dx12 = dl @ k12.astype(dl.dtype).T
    dk12 = jnp.einsum(
        "bnf,bnc->fc", x12, dl, preferred_element_type=jnp.float32
    ).astype(k12.dtype)
    dconst = jnp.sum(dl32, axis=(0, 1))
    # recompute h (one fused pass over p) for the kernel grad and the
    # normalize backward; dl is zero on padded rows (s carries the mask), so
    # everything downstream is row-masked for free
    pf = p.astype(jnp.float32)
    rnorm, h32 = _rnorm_h(pf)
    h = h32.astype(p.dtype)
    dk3f = jnp.einsum(
        "bnc,bnd->cd", h, dl, preferred_element_type=jnp.float32
    ).astype(k3f.dtype)
    dh = (dl @ k3f.astype(dl.dtype).T).astype(jnp.float32)
    rd = jnp.sum(dh * h32, axis=-1, keepdims=True)
    dp = (pf > 0) * rnorm * dh - rnorm * rnorm * pf * rd
    return (
        dx12, dp.astype(p.dtype), dk12, dk3f, dconst,
        jnp.zeros_like(mask),
    )


assign_head_softmax_pre.defvjp(_ahp_fwd, _ahp_bwd)


# ---------------------------------------------------------------------------
# Full training tail: stats + BN-fold algebra + softmax under ONE custom VJP
# so the backward collapses to { dl fusion, two inherent MXU matmuls, one
# h-materializing pass, one Pallas dp kernel } — XLA autodiff of the same
# chain emits ~5 extra full passes over [B, N, C].
# ---------------------------------------------------------------------------

def _tail_algebra(ssum, ssq, k3, lin_bias, bn_scale, bn_bias, n, eps):
    """Small-tensor algebra between the stats kernel and the softmax kernel:
    single-pass BN moments -> folded affine -> folded lin kernel/bias.
    Differentiated by jax.vjp in the backward (all [C]-sized)."""
    n = jnp.maximum(n, 1.0)
    mean = ssum / n
    var = jnp.maximum(ssq / n - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps) * bn_scale
    shift = bn_bias - mean * inv
    k3f = inv[:, None] * k3
    const = shift @ k3 + lin_bias
    return k3f, const, mean, var


def _bwd_kernel(nn_ref, p_ref, dh_ref, u_ref, w_ref, dp_ref, *, tile):
    bi = pl.program_id(0)
    ri = pl.program_id(1)
    pt = p_ref[0].astype(jnp.float32)
    rnorm, h = _rnorm_h(pt)
    rows = ri * tile + jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
    rmask = (rows < nn_ref[bi]).astype(jnp.float32)
    hs = h * rmask
    # dh from the softmax path is already row-masked (dl is 0 on padded
    # rows); the stats-path cotangent (u = d ssum, w = d ssq) is not
    dhf = dh_ref[0].astype(jnp.float32)
    dh_tot = dhf + rmask * (u_ref[0][None, :] + 2.0 * hs * w_ref[0][None, :])
    rd = jnp.sum(dh_tot * hs, axis=-1, keepdims=True)
    dp = rmask * (pt > 0) * rnorm * dh_tot - rnorm * rnorm * pt * rd
    dp_ref[0] = dp.astype(dp_ref.dtype)


def _bwd_call(p, dh, u, w, mask, tile: int | None = None):
    from jax.experimental.pallas import tpu as pltpu

    b, n, c = p.shape
    tile = _pick_tile(n) if tile is None else tile
    assert n % tile == 0, (n, tile)
    nn = jnp.sum(mask.astype(jnp.float32), axis=1).astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n // tile),
        in_specs=[
            pl.BlockSpec((1, tile, c), lambda bi, ri, nn: (bi, ri, 0)),
            pl.BlockSpec((1, tile, c), lambda bi, ri, nn: (bi, ri, 0)),
            pl.BlockSpec((1, c), lambda bi, ri, nn: (0, 0)),
            pl.BlockSpec((1, c), lambda bi, ri, nn: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile, c), lambda bi, ri, nn: (bi, ri, 0)),
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, tile=tile),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n, c), p.dtype),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * n * c,
            bytes_accessed=3 * b * n * c * jnp.dtype(p.dtype).itemsize,
            transcendentals=b * n,
        ),
    )(nn, p, dh, u[None, :], w[None, :])


@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def assign_tail_train(
    x12: jax.Array,      # [B, N, F12] layers 1-2 concat (masked)
    p: jax.Array,        # [B, N, C]   conv3 raw lin output (pre-normalize)
    k12: jax.Array,      # [F12, C]    lin kernel rows for x12
    k3: jax.Array,       # [C, C]      lin kernel rows for the conv3 stream
    lin_bias: jax.Array, # [C] f32     lin bias (zeros when bias-free)
    bn_scale: jax.Array, # [C] f32     bn3 scale
    bn_bias: jax.Array,  # [C] f32     bn3 bias
    mask: jax.Array,     # [B, N]      0/1 prefix valid-row mask
    n: jax.Array,        # scalar f32  BN divisor (masked count or B*N)
    eps: float = 1e-5,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Training-mode assign tail under one custom VJP: L2-normalize + relu +
    BN batch statistics + BN-affine fold + folded lin + masked softmax.

    Returns (S, S^T, batch_mean, batch_var); the caller feeds mean/var into
    the running-stat update (their cotangents are zero — running stats are
    not differentiated). Matches the unfused reference chain
    (model/network.py:78-107,194-208 with PyG DenseSAGEConv normalize) up to
    single-pass-variance rounding.
    """
    ssum, ssq = _stats_call(p, mask)
    k3f, const, mean, var = _tail_algebra(
        ssum, ssq, k3, lin_bias, bn_scale, bn_bias, n, eps
    )
    s, s_t = _fwd_call_pre(x12, p, k12, k3f, const, mask)
    return s, s_t, mean, var


def _atf_fwd(x12, p, k12, k3, lin_bias, bn_scale, bn_bias, mask, n, eps):
    ssum, ssq = _stats_call(p, mask)
    k3f, const, mean, var = _tail_algebra(
        ssum, ssq, k3, lin_bias, bn_scale, bn_bias, n, eps
    )
    s, s_t = _fwd_call_pre(x12, p, k12, k3f, const, mask)
    res = (x12, p, k12, k3f, s, mask, ssum, ssq, k3, lin_bias,
           bn_scale, bn_bias, n)
    return (s, s_t, mean, var), res


def _atf_bwd(eps, res, cts):
    (x12, p, k12, k3f, s, mask, ssum, ssq, k3, lin_bias,
     bn_scale, bn_bias, n) = res
    ds, ds_t, dmean, dvar = cts
    g = ds + jnp.swapaxes(ds_t, 1, 2)
    gf = g.astype(jnp.float32)
    sf = s.astype(jnp.float32)
    dl32 = sf * (gf - jnp.sum(gf * sf, axis=-1, keepdims=True))
    dl = dl32.astype(s.dtype)
    dx12 = dl @ k12.astype(dl.dtype).T
    dk12 = jnp.einsum(
        "bnf,bnc->fc", x12, dl, preferred_element_type=jnp.float32
    ).astype(k12.dtype)
    dconst = jnp.sum(dl32, axis=(0, 1))
    dh = dl @ k3f.astype(dl.dtype).T
    # h materialized once, for the folded-kernel grad only (MXU einsum)
    pf = p.astype(jnp.float32)
    _, h32 = _rnorm_h(pf)
    h = (h32 * mask[..., None].astype(jnp.float32)).astype(p.dtype)
    dk3f = jnp.einsum(
        "bnc,bnd->cd", h, dl, preferred_element_type=jnp.float32
    )
    # small-tensor algebra backward (all [C]-sized; jax.vjp re-linearizes)
    _, alg_vjp = jax.vjp(
        lambda su, sq, kk, lb, bs, bb: _tail_algebra(
            su, sq, kk, lb, bs, bb, n, eps
        ),
        ssum, ssq, k3, lin_bias, bn_scale, bn_bias,
    )
    dssum, dssq, dk3, dlin_bias, dbn_scale, dbn_bias = alg_vjp(
        (dk3f, dconst, dmean, dvar)
    )
    dp = _bwd_call(p, dh, dssum, dssq, mask)
    return (
        dx12, dp, dk12, dk3, dlin_bias, dbn_scale, dbn_bias,
        jnp.zeros_like(mask), jnp.zeros_like(n),
    )


assign_tail_train.defvjp(_atf_fwd, _atf_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def assign_tail_train_psum(
    x12, p, k12, k3, lin_bias, bn_scale, bn_bias, mask, n, eps, axis,
    c_out=None,
):
    """``assign_tail_train`` with cross-shard BN statistics: the one-pass
    (sum, sumsq) from the stats kernel are psum'd over ``axis`` between the
    two Pallas passes, so every shard folds the GLOBAL batch moments — the
    mega path's SyncBatchNorm semantics (parallel/mega_model._bn_moments)
    inside the fused tail. ``n`` must be the psum'd global row count.

    ``c_out`` (static, >= C or None): emit S lane-PADDED to ``c_out``
    columns with exact-zero pads (round 5). The mega path passes the next
    128 multiple so the banded A@S kernel's aligned-minor manual DMA needs
    no [N, C] -> [N, c_out] pad pass, forward or backward (2 x 0.69 ms at
    100k nuclei, roofline_r4 §4). Zero pads are invisible to the
    softmax-VJP algebra: dl's pad columns are s*(...) = 0, so every
    contraction against them vanishes — the backward runs at the padded
    width with zero-padded kernels and trims the [C]-class grads.

    The backward is ``_atf_bwd`` with psum routing: the cotangent of a
    psum'd sum w.r.t. each shard's local rows is the (replicated) global
    cotangent, and every other residual is shard-local. Runs under
    shard_map.
    """
    ssum, ssq = _stats_call(p, mask)
    ssum = jax.lax.psum(ssum, axis)
    ssq = jax.lax.psum(ssq, axis)
    k3f, const, mean, var = _tail_algebra(
        ssum, ssq, k3, lin_bias, bn_scale, bn_bias, n, eps
    )
    s, s_t = _fwd_call_pre(x12, p, k12, k3f, const, mask, c_out=c_out)
    return s, s_t, mean, var


def _atfp_fwd(x12, p, k12, k3, lin_bias, bn_scale, bn_bias, mask, n, eps,
              axis, c_out=None):
    ssum, ssq = _stats_call(p, mask)
    ssum = jax.lax.psum(ssum, axis)
    ssq = jax.lax.psum(ssq, axis)
    k3f, const, mean, var = _tail_algebra(
        ssum, ssq, k3, lin_bias, bn_scale, bn_bias, n, eps
    )
    s, s_t = _fwd_call_pre(x12, p, k12, k3f, const, mask, c_out=c_out)
    res = (x12, p, k12, k3f, s, mask, ssum, ssq, k3, lin_bias,
           bn_scale, bn_bias, n)
    return (s, s_t, mean, var), res


def _atfp_bwd(eps, axis, c_out, res, cts):
    """Backward under shard_map. Cotangent routing differs from _atf_bwd in
    WHERE the cross-shard sums go:

    - the sharded-row gradients (dp, and dh inside it) must see the GLOBAL
      cotangents of the psum'd statistics — k3f/const were computed from
      global sums and consumed by every shard's rows, so
      d ssum = J^T psum(d k3f_local), psum'd HERE;
    - the replicated-parameter gradients (dk3, dlin_bias, dbn_*) must stay
      LOCAL per-shard contributions — shard_map's transpose psums replicated
      operands' cotangents itself, so psum'ing here would double-count.

    With ``c_out`` set, s/ds carry exact-zero pad columns: the N-sized
    chains (dl, dx12, dh) run at the padded width against zero-padded
    kernels — slicing dl itself would reintroduce the relayout pass the
    padding exists to kill — and only the [C]-class reductions
    (dk12, dk3f, dconst) trim, which is exact because dl's pad columns are
    identically zero.

    mean/var cotangents are assumed zero (running stats are not
    differentiated — same contract as assign_tail_train's docstring).
    """
    (x12, p, k12, k3f, s, mask, ssum, ssq, k3, lin_bias,
     bn_scale, bn_bias, n) = res
    ds, ds_t, dmean, dvar = cts
    c = k3f.shape[0]
    pad = (s.shape[-1] - c) if c_out is not None else 0
    g = ds + jnp.swapaxes(ds_t, 1, 2)
    gf = g.astype(jnp.float32)
    sf = s.astype(jnp.float32)
    dl32 = sf * (gf - jnp.sum(gf * sf, axis=-1, keepdims=True))
    dl = dl32.astype(s.dtype)
    k12e = jnp.pad(k12, ((0, 0), (0, pad))) if pad else k12
    k3fe = jnp.pad(k3f, ((0, 0), (0, pad))) if pad else k3f
    dx12 = dl @ k12e.astype(dl.dtype).T
    dk12 = jnp.einsum(
        "bnf,bnc->fc", x12, dl, preferred_element_type=jnp.float32
    )[:, :c].astype(k12.dtype)
    dconst = jnp.sum(dl32, axis=(0, 1))[:c]
    dh = dl @ k3fe.astype(dl.dtype).T
    pf = p.astype(jnp.float32)
    _, h32 = _rnorm_h(pf)
    h = (h32 * mask[..., None].astype(jnp.float32)).astype(p.dtype)
    dk3f = jnp.einsum(
        "bnc,bnd->cd", h, dl, preferred_element_type=jnp.float32
    )[:, :c]
    _, alg_vjp = jax.vjp(
        lambda su, sq, kk, lb, bs, bb: _tail_algebra(
            su, sq, kk, lb, bs, bb, n, eps
        ),
        ssum, ssq, k3, lin_bias, bn_scale, bn_bias,
    )
    # sharded-row path: global stats cotangents
    dk3f_g = jax.lax.psum(dk3f, axis)
    dconst_g = jax.lax.psum(dconst, axis)
    dssum_g, dssq_g, _, _, _, _ = alg_vjp((dk3f_g, dconst_g, dmean, dvar))
    dp = _bwd_call(p, dh, dssum_g, dssq_g, mask)
    # replicated-parameter path: local contributions only
    _, _, dk3, dlin_bias, dbn_scale, dbn_bias = alg_vjp(
        (dk3f, dconst, jnp.zeros_like(dmean), jnp.zeros_like(dvar))
    )
    return (
        dx12, dp, dk12, dk3, dlin_bias, dbn_scale, dbn_bias,
        jnp.zeros_like(mask), jnp.zeros_like(n),
    )


assign_tail_train_psum.defvjp(_atfp_fwd, _atfp_bwd)


# ---------------------------------------------------------------------------
# Chunked-row recompute backward — the slide-capacity path.
#
# The plain tail backward materializes several [B, N, C]-class temporaries at
# once (g, gf/sf/dl32 in f32, dh, h, dp): at N=1M, C=1140 that is ~7 S-class
# tensors live concurrently — the measured 19.94 GB single-chip OOM
# (benchmarks/slide_scale_r3.json). This variant (a) does NOT save S as a
# residual (recomputed per chunk from the same Pallas kernel — bit-identical,
# the kernel is deterministic), and (b) runs the backward as two fori_loop
# sweeps over row chunks, so only chunk-sized temporaries exist:
#   phase A accumulates the [C]-class reductions (dk12, dk3f, dconst);
#   phase B, with the global stats cotangents known, emits dp/dx12 per chunk.
# Cost: the fused forward kernel re-runs twice (once per phase) — ~2 extra
# MXU passes, paid only on the capacity path where HBM is the binding
# constraint. Cross-shard semantics identical to assign_tail_train_psum
# (axis=None degrades to the single-device assign_tail_train contract).
# ---------------------------------------------------------------------------


def pick_chunk(nrows: int, target: int) -> int:
    """Snap the config's TARGET chunk size to a legal value: a multiple of
    128, capped at nrows (0 = chunking unusable). The backward handles a
    non-dividing chunk with one remainder chunk, so no divisor search is
    needed — capacities are arbitrary 128-multiples (1M nuclei pads to
    128*7813 with 7813 = 13*601; 500k to 128*3907 with 3907 prime)."""
    if nrows % TILE or target < TILE:
        return 0
    return min(nrows, target // TILE * TILE)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def assign_tail_train_chunked(
    x12, p, k12, k3, lin_bias, bn_scale, bn_bias, mask, n,
    eps: float = 1e-5, axis: str | None = None, chunk_rows: int = 65536,
):
    """``assign_tail_train``/``assign_tail_train_psum`` with a row-chunked
    recompute backward bounding the working set to O(chunk_rows * C).

    ``chunk_rows`` must be a multiple of 128 (N // chunk full chunks plus
    one remainder chunk). ``axis=None`` gives single-device statistics; an
    axis name psums them (SyncBatchNorm), with the same cotangent routing
    as ``assign_tail_train_psum``.
    """
    ssum, ssq = _stats_call(p, mask)
    if axis is not None:
        ssum = jax.lax.psum(ssum, axis)
        ssq = jax.lax.psum(ssq, axis)
    k3f, const, mean, var = _tail_algebra(
        ssum, ssq, k3, lin_bias, bn_scale, bn_bias, n, eps
    )
    s, s_t = _fwd_call_pre(x12, p, k12, k3f, const, mask)
    return s, s_t, mean, var


def _atc_fwd(x12, p, k12, k3, lin_bias, bn_scale, bn_bias, mask, n,
             eps, axis, chunk_rows):
    ssum, ssq = _stats_call(p, mask)
    if axis is not None:
        ssum = jax.lax.psum(ssum, axis)
        ssq = jax.lax.psum(ssq, axis)
    k3f, const, mean, var = _tail_algebra(
        ssum, ssq, k3, lin_bias, bn_scale, bn_bias, n, eps
    )
    s, s_t = _fwd_call_pre(x12, p, k12, k3f, const, mask)
    # NO s in the residuals — phase A/B recompute it chunk-locally
    res = (x12, p, k12, k3f, const, mask, ssum, ssq, k3, lin_bias,
           bn_scale, bn_bias, n)
    return (s, s_t, mean, var), res


def _atc_bwd(eps, axis, chunk_rows, res, cts):
    (x12, p, k12, k3f, const, mask, ssum, ssq, k3, lin_bias,
     bn_scale, bn_bias, n) = res
    ds, ds_t, dmean, dvar = cts
    b, nrows, c = p.shape
    f12 = x12.shape[-1]
    ch = min(chunk_rows, nrows)
    assert ch % TILE == 0 and nrows % TILE == 0, (nrows, ch)
    nfull = nrows // ch
    rem = nrows - nfull * ch  # multiple of TILE (both operands are)

    def dl_of(lo, size):
        """Chunk-local recompute: S (same kernel → bit-identical), then the
        masked-softmax cotangent fold. The full prefix mask sliced at a
        chunk is still a prefix within the chunk, so the kernel's
        count-from-mask contract holds. ``size`` is static (full chunks come
        from a fori_loop with static ch; the remainder is its own call)."""
        xc = jax.lax.dynamic_slice_in_dim(x12, lo, size, 1)
        pc = jax.lax.dynamic_slice_in_dim(p, lo, size, 1)
        mc = jax.lax.dynamic_slice_in_dim(mask, lo, size, 1)
        dsc = jax.lax.dynamic_slice_in_dim(ds, lo, size, 1)
        dstc = jax.lax.dynamic_slice_in_dim(ds_t, lo, size, 2)
        sc, _ = _fwd_call_pre(xc, pc, k12, k3f, const, mc)
        g = dsc + jnp.swapaxes(dstc, 1, 2)
        gf = g.astype(jnp.float32)
        sf = sc.astype(jnp.float32)
        dl32 = sf * (gf - jnp.sum(gf * sf, axis=-1, keepdims=True))
        return xc, pc, mc, dl32, dl32.astype(sc.dtype)

    # ---- phase A: [C]-class reductions ----
    def acc_a(carry, lo, size):
        dk12a, dk3fa, dconsta = carry
        xc, pc, mc, dl32, dl = dl_of(lo, size)
        dk12a = dk12a + jnp.einsum(
            "bnf,bnc->fc", xc, dl, preferred_element_type=jnp.float32
        )
        pf = pc.astype(jnp.float32)
        _, h32 = _rnorm_h(pf)
        hc = (h32 * mc[..., None].astype(jnp.float32)).astype(p.dtype)
        dk3fa = dk3fa + jnp.einsum(
            "bnc,bnd->cd", hc, dl, preferred_element_type=jnp.float32
        )
        dconsta = dconsta + jnp.sum(dl32, axis=(0, 1))
        return dk12a, dk3fa, dconsta

    carry_a = (
        jnp.zeros((f12, c), jnp.float32),
        jnp.zeros((c, c), jnp.float32),
        jnp.zeros((c,), jnp.float32),
    )
    carry_a = jax.lax.fori_loop(
        0, nfull, lambda ci, cr: acc_a(cr, ci * ch, ch), carry_a
    )
    if rem:
        carry_a = acc_a(carry_a, nfull * ch, rem)
    dk12, dk3f, dconst = carry_a

    _, alg_vjp = jax.vjp(
        lambda su, sq, kk, lb, bs, bb: _tail_algebra(
            su, sq, kk, lb, bs, bb, n, eps
        ),
        ssum, ssq, k3, lin_bias, bn_scale, bn_bias,
    )
    if axis is not None:
        # same routing as _atfp_bwd: sharded-row path needs GLOBAL stats
        # cotangents; replicated-param grads stay local (shard_map's
        # transpose psums them)
        dk3f_g = jax.lax.psum(dk3f, axis)
        dconst_g = jax.lax.psum(dconst, axis)
        dssum_g, dssq_g, _, _, _, _ = alg_vjp(
            (dk3f_g, dconst_g, dmean, dvar)
        )
        _, _, dk3, dlin_bias, dbn_scale, dbn_bias = alg_vjp(
            (dk3f, dconst, jnp.zeros_like(dmean), jnp.zeros_like(dvar))
        )
    else:
        dssum_g, dssq_g, dk3, dlin_bias, dbn_scale, dbn_bias = alg_vjp(
            (dk3f, dconst, dmean, dvar)
        )

    # ---- phase B: row-sharded grads, chunk by chunk in place ----
    def upd_b(carry, lo, size):
        dx12a, dpa = carry
        xc, pc, mc, dl32, dl = dl_of(lo, size)
        dh = dl @ k3f.astype(dl.dtype).T
        dpc = _bwd_call(pc, dh, dssum_g, dssq_g, mc)
        dxc = (dl @ k12.astype(dl.dtype).T).astype(dx12a.dtype)
        dx12a = jax.lax.dynamic_update_slice_in_dim(dx12a, dxc, lo, 1)
        dpa = jax.lax.dynamic_update_slice_in_dim(dpa, dpc, lo, 1)
        return dx12a, dpa

    carry_b = (jnp.zeros_like(x12), jnp.zeros_like(p))
    carry_b = jax.lax.fori_loop(
        0, nfull, lambda ci, cr: upd_b(cr, ci * ch, ch), carry_b
    )
    if rem:
        carry_b = upd_b(carry_b, nfull * ch, rem)
    dx12, dp = carry_b
    dk12 = dk12.astype(k12.dtype)
    return (
        dx12, dp, dk12, dk3, dlin_bias, dbn_scale, dbn_bias,
        jnp.zeros_like(mask), jnp.zeros_like(n),
    )


assign_tail_train_chunked.defvjp(_atc_fwd, _atc_bwd)


# ---------------------------------------------------------------------------
# Pre-lin chunked tail — the conv3 lin absorbed into the chunk loops.
#
# The chunked tail above still takes p = x3 @ kc3 (+ b3) as a MATERIALIZED
# [B, N, C] operand: at 1M nuclei that is a 2.15 GB forward residual, its
# remat-compressed copy, and a 2.15 GB dp output assembled in the backward —
# three of the seven S-class allocations in the measured 18.71 GB OOM
# (slide_1m r4, benchmarks/slide_step_r4.json). This variant takes the lin
# INPUT x3 [B, N, F3] (F3 = 3*hidden = 60 — 19x narrower) plus the lin
# parameters, and computes p chunk-wise inside every loop that needs it, so
# no [N, C]-class tensor for the conv3 stream ever materializes, forward or
# backward; dp exists only per chunk, immediately contracted to
# dx3 = dp @ kc3^T, dkc3 += x3^T dp, db3 += rowsum(dp).
#
# Cost: the p matmul re-runs once per pass (stats, S, phase A, phase B) —
# k=F3 dots are MXU pass-granularity-bound, ~9.6 ms/pass at 1M — paid only
# on the capacity path where HBM is the binding constraint. Numerics: the
# chunk lin is the same bf16 dot XLA runs unfused (f32 accumulation,
# bf16 round at the output); parity pinned by tests/test_assign_head.py.
# ---------------------------------------------------------------------------


def _kernel_pre_lin(nn_ref, x12_ref, x3_ref, kc3_ref, b3_ref, k12_ref,
                    k3f_ref, const_ref, s_ref, *, tile: int):
    """_kernel_pre with conv3's lin computed in-VMEM: p = x3 @ kc3 + b3 per
    tile (k=F3 dot, one extra MXU pass per lane tile), rounded through the
    compute dtype exactly like the unfused XLA matmul (+bias at bf16)."""
    bi = pl.program_id(0)
    ri = pl.program_id(1)
    dt = s_ref.dtype
    p = jnp.dot(
        x3_ref[0], kc3_ref[...], preferred_element_type=jnp.float32
    ).astype(dt) + b3_ref[0][None, :]
    _, h = _rnorm_h(p.astype(jnp.float32))
    acc = jnp.dot(
        x12_ref[0], k12_ref[...], preferred_element_type=jnp.float32
    )
    acc = acc + jnp.dot(
        h.astype(dt), k3f_ref[...], preferred_element_type=jnp.float32
    )
    logits = acc + const_ref[0][None, :]
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    s = e / jnp.sum(e, axis=-1, keepdims=True)
    rows = ri * tile + jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
    s_ref[0] = (s * (rows < nn_ref[bi]).astype(jnp.float32)).astype(dt)


def _fwd_call_pre_lin(x12, x3, kc3, b3, k12, k3f, const, mask,
                      tile: int | None = None):
    from jax.experimental.pallas import tpu as pltpu

    b, n, f3 = x3.shape
    c = kc3.shape[1]
    f12 = x12.shape[-1]
    tile = _pick_tile(n) if tile is None else tile
    assert n % tile == 0, (n, tile)
    dt = x3.dtype
    nn = jnp.sum(mask.astype(jnp.float32), axis=1).astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n // tile),
        in_specs=[
            pl.BlockSpec((1, tile, f12), lambda bi, ri, nn: (bi, ri, 0)),
            pl.BlockSpec((1, tile, f3), lambda bi, ri, nn: (bi, ri, 0)),
            pl.BlockSpec((f3, c), lambda bi, ri, nn: (0, 0)),
            pl.BlockSpec((1, c), lambda bi, ri, nn: (0, 0)),
            pl.BlockSpec((f12, c), lambda bi, ri, nn: (0, 0)),
            pl.BlockSpec((c, c), lambda bi, ri, nn: (0, 0)),
            pl.BlockSpec((1, c), lambda bi, ri, nn: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile, c), lambda bi, ri, nn: (bi, ri, 0)),
    )
    return pl.pallas_call(
        functools.partial(_kernel_pre_lin, tile=tile),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n, c), dt),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * c * (f3 + f12 + c),
            bytes_accessed=b * n * (f3 + f12 + c) * jnp.dtype(dt).itemsize,
            transcendentals=b * n * (c + 1),
        ),
    )(nn, x12, x3, kc3.astype(dt), b3.astype(dt)[None, :], k12.astype(dt),
      k3f.astype(dt), const[None, :])


def _stats_kernel_lin(nn_ref, x3_ref, kc3_ref, b3_ref, sum_ref, sq_ref,
                      *, tile: int):
    bi = pl.program_id(0)
    ri = pl.program_id(1)

    @pl.when((bi == 0) & (ri == 0))
    def _init():
        sum_ref[...] = jnp.zeros_like(sum_ref)
        sq_ref[...] = jnp.zeros_like(sq_ref)

    dt = x3_ref.dtype
    p = jnp.dot(
        x3_ref[0], kc3_ref[...], preferred_element_type=jnp.float32
    ).astype(dt) + b3_ref[0][None, :]
    _, h = _rnorm_h(p.astype(jnp.float32))
    rows = ri * tile + jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
    h = h * (rows < nn_ref[bi]).astype(jnp.float32)
    h = h.astype(dt).astype(jnp.float32)
    sum_ref[...] += jnp.sum(h, axis=0)[None, :]
    sq_ref[...] += jnp.sum(h * h, axis=0)[None, :]


def _stats_call_lin(x3, kc3, b3, mask):
    from jax.experimental.pallas import tpu as pltpu

    b, n, f3 = x3.shape
    c = kc3.shape[1]
    tile = _pick_tile(n)
    assert n % tile == 0, n
    dt = x3.dtype
    nn = jnp.sum(mask.astype(jnp.float32), axis=1).astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n // tile),
        in_specs=[
            pl.BlockSpec((1, tile, f3), lambda bi, ri, nn: (bi, ri, 0)),
            pl.BlockSpec((f3, c), lambda bi, ri, nn: (0, 0)),
            pl.BlockSpec((1, c), lambda bi, ri, nn: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, c), lambda bi, ri, nn: (0, 0)),
            pl.BlockSpec((1, c), lambda bi, ri, nn: (0, 0)),
        ),
    )
    ssum, ssq = pl.pallas_call(
        functools.partial(_stats_kernel_lin, tile=tile),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * c * f3 + 6 * b * n * c,
            bytes_accessed=b * n * f3 * jnp.dtype(dt).itemsize,
            transcendentals=b * n,
        ),
    )(nn, x3, kc3.astype(dt), b3.astype(dt)[None, :])
    return ssum[0], ssq[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13))
def assign_tail_train_chunked_lin(
    x12, x3, kc3, b3, k12, k3, lin_bias, bn_scale, bn_bias, mask, n,
    eps: float = 1e-5, axis: str | None = None, chunk_rows: int = 65536,
):
    """``assign_tail_train_chunked`` with conv3's lin fused into the chunk
    loops: ``p`` is computed per chunk from ``x3`` [B, N, F3] and the lin
    parameters ``kc3`` [F3, C] / ``b3`` [C] and never materializes at
    [B, N, C]. Returns the same (S, S^T, mean, var)."""
    s, _, mean, var, _, _ = _atcl_fwd_impl(
        x12, x3, kc3, b3, k12, k3, lin_bias, bn_scale, bn_bias, mask, n,
        eps, axis, chunk_rows,
    )
    return s, jnp.swapaxes(s, 1, 2), mean, var


def _chunk_plan(nrows: int, chunk_rows: int):
    ch = min(chunk_rows, nrows)
    assert ch % TILE == 0 and nrows % TILE == 0, (nrows, ch)
    nfull = nrows // ch
    return ch, nfull, nrows - nfull * ch


def _atcl_fwd_impl(x12, x3, kc3, b3, k12, k3, lin_bias, bn_scale, bn_bias,
                   mask, n, eps, axis, chunk_rows):
    # forward: ONE Pallas call per pass with p computed in-VMEM per tile —
    # a chunked dus-assembly loop here left a 2.15 GB loop-exit copy plus a
    # compressed accumulator copy live at the 1M backward peak
    del chunk_rows
    ssum, ssq = _stats_call_lin(x3, kc3, b3, mask)
    if axis is not None:
        ssum = jax.lax.psum(ssum, axis)
        ssq = jax.lax.psum(ssq, axis)
    k3f, const, mean, var = _tail_algebra(
        ssum, ssq, k3, lin_bias, bn_scale, bn_bias, n, eps
    )
    s = _fwd_call_pre_lin(x12, x3, kc3, b3, k12, k3f, const, mask)
    return s, None, mean, var, (k3f, const), (ssum, ssq)


def _atcl_fwd(x12, x3, kc3, b3, k12, k3, lin_bias, bn_scale, bn_bias,
              mask, n, eps, axis, chunk_rows):
    s, _, mean, var, (k3f, const), (ssum, ssq) = _atcl_fwd_impl(
        x12, x3, kc3, b3, k12, k3, lin_bias, bn_scale, bn_bias, mask, n,
        eps, axis, chunk_rows,
    )
    # NO p and NO s in the residuals — both recomputed chunk-locally
    res = (x12, x3, kc3, b3, k12, k3f, const, mask, ssum, ssq, k3,
           lin_bias, bn_scale, bn_bias, n)
    return (s, jnp.swapaxes(s, 1, 2), mean, var), res


def _atcl_bwd(eps, axis, chunk_rows, res, cts):
    (x12, x3, kc3, b3, k12, k3f, const, mask, ssum, ssq, k3,
     lin_bias, bn_scale, bn_bias, n) = res
    ds, ds_t, dmean, dvar = cts
    b, nrows, f3 = x3.shape
    c = kc3.shape[1]
    f12 = x12.shape[-1]
    ch, nfull, rem = _chunk_plan(nrows, chunk_rows)
    dt = x3.dtype

    def dl_of(lo, size):
        """Chunk-local recompute: S from the same lin-fused kernel as the
        forward (bit-identical), p via the chunk-sized XLA lin (feeds the
        h/dp recomputes), then the masked-softmax cotangent fold."""
        x3c = jax.lax.dynamic_slice_in_dim(x3, lo, size, 1)
        pc = x3c @ kc3.astype(dt) + b3.astype(dt)[None, None, :]
        xc = jax.lax.dynamic_slice_in_dim(x12, lo, size, 1)
        mc = jax.lax.dynamic_slice_in_dim(mask, lo, size, 1)
        dsc = jax.lax.dynamic_slice_in_dim(ds, lo, size, 1)
        dstc = jax.lax.dynamic_slice_in_dim(ds_t, lo, size, 2)
        sc = _fwd_call_pre_lin(xc, x3c, kc3, b3, k12, k3f, const, mc)
        g = dsc + jnp.swapaxes(dstc, 1, 2)
        gf = g.astype(jnp.float32)
        sf = sc.astype(jnp.float32)
        dl32 = sf * (gf - jnp.sum(gf * sf, axis=-1, keepdims=True))
        return xc, x3c, pc, mc, dl32, dl32.astype(sc.dtype)

    # ---- phase A: [C]-class reductions ----
    def acc_a(carry, lo, size):
        dk12a, dk3fa, dconsta = carry
        xc, x3c, pc, mc, dl32, dl = dl_of(lo, size)
        dk12a = dk12a + jnp.einsum(
            "bnf,bnc->fc", xc, dl, preferred_element_type=jnp.float32
        )
        pf = pc.astype(jnp.float32)
        _, h32 = _rnorm_h(pf)
        hc = (h32 * mc[..., None].astype(jnp.float32)).astype(dt)
        dk3fa = dk3fa + jnp.einsum(
            "bnc,bnd->cd", hc, dl, preferred_element_type=jnp.float32
        )
        dconsta = dconsta + jnp.sum(dl32, axis=(0, 1))
        return dk12a, dk3fa, dconsta

    carry_a = (
        jnp.zeros((f12, c), jnp.float32),
        jnp.zeros((c, c), jnp.float32),
        jnp.zeros((c,), jnp.float32),
    )
    carry_a = jax.lax.fori_loop(
        0, nfull, lambda ci, cr: acc_a(cr, ci * ch, ch), carry_a
    )
    if rem:
        carry_a = acc_a(carry_a, nfull * ch, rem)
    dk12, dk3f, dconst = carry_a

    _, alg_vjp = jax.vjp(
        lambda su, sq, kk, lb, bs, bb: _tail_algebra(
            su, sq, kk, lb, bs, bb, n, eps
        ),
        ssum, ssq, k3, lin_bias, bn_scale, bn_bias,
    )
    if axis is not None:
        dk3f_g = jax.lax.psum(dk3f, axis)
        dconst_g = jax.lax.psum(dconst, axis)
        dssum_g, dssq_g, _, _, _, _ = alg_vjp(
            (dk3f_g, dconst_g, dmean, dvar)
        )
        _, _, dk3, dlin_bias, dbn_scale, dbn_bias = alg_vjp(
            (dk3f, dconst, jnp.zeros_like(dmean), jnp.zeros_like(dvar))
        )
    else:
        dssum_g, dssq_g, dk3, dlin_bias, dbn_scale, dbn_bias = alg_vjp(
            (dk3f, dconst, dmean, dvar)
        )

    # ---- phase B: row grads; dp exists only per chunk ----
    def upd_b(carry, lo, size):
        dx12a, dx3a, dkc3a, db3a = carry
        xc, x3c, pc, mc, dl32, dl = dl_of(lo, size)
        dh = dl @ k3f.astype(dl.dtype).T
        dpc = _bwd_call(pc, dh, dssum_g, dssq_g, mc)
        dxc = (dl @ k12.astype(dl.dtype).T).astype(dx12a.dtype)
        dx3c = (dpc @ kc3.astype(dpc.dtype).T).astype(dx3a.dtype)
        dkc3a = dkc3a + jnp.einsum(
            "bnf,bnc->fc", x3c, dpc, preferred_element_type=jnp.float32
        )
        db3a = db3a + jnp.sum(dpc.astype(jnp.float32), axis=(0, 1))
        dx12a = jax.lax.dynamic_update_slice_in_dim(dx12a, dxc, lo, 1)
        dx3a = jax.lax.dynamic_update_slice_in_dim(dx3a, dx3c, lo, 1)
        return dx12a, dx3a, dkc3a, db3a

    carry_b = (
        jnp.zeros_like(x12), jnp.zeros_like(x3),
        jnp.zeros((f3, c), jnp.float32), jnp.zeros((c,), jnp.float32),
    )
    carry_b = jax.lax.fori_loop(
        0, nfull, lambda ci, cr: upd_b(cr, ci * ch, ch), carry_b
    )
    if rem:
        carry_b = upd_b(carry_b, nfull * ch, rem)
    dx12, dx3, dkc3, db3 = carry_b
    return (
        dx12, dx3, dkc3.astype(kc3.dtype), db3.astype(b3.dtype),
        dk12.astype(k12.dtype), dk3, dlin_bias, dbn_scale, dbn_bias,
        jnp.zeros_like(mask), jnp.zeros_like(n),
    )


assign_tail_train_chunked_lin.defvjp(_atcl_fwd, _atcl_bwd)


def _ah_bwd(res, cts):
    x12, h3a, k12, k3f, s, mask = res
    ds, ds_t = cts
    g = ds + jnp.swapaxes(ds_t, 1, 2)
    # s already carries the row mask (0 on padded rows), so the masked
    # softmax VJP is: dl = s * (g - rowsum(g * s))
    gf = g.astype(jnp.float32)
    sf = s.astype(jnp.float32)
    dl32 = sf * (gf - jnp.sum(gf * sf, axis=-1, keepdims=True))
    dl = dl32.astype(s.dtype)
    dx12 = dl @ k12.astype(dl.dtype).T
    dh3a = dl @ k3f.astype(dl.dtype).T
    dk12 = jnp.einsum(
        "bnf,bnc->fc", x12, dl, preferred_element_type=jnp.float32
    ).astype(k12.dtype)
    dk3f = jnp.einsum(
        "bnc,bnd->cd", h3a, dl, preferred_element_type=jnp.float32
    ).astype(k3f.dtype)
    dconst = jnp.sum(dl32, axis=(0, 1))
    return dx12, dh3a, dk12, dk3f, dconst, jnp.zeros_like(mask)


assign_head_softmax.defvjp(_ah_fwd, _ah_bwd)
