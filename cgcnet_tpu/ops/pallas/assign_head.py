"""Fused assign-head tail: folded-lin matmul + softmax + dual-layout S.

Profiling the canonical train step (benchmarks/profile_step.py) shows the
DiffPool assignment chain dominating the serial timeline even after the BN
affine is folded into the lin kernel (nn/blocks.py::finish_folded): the
[B, 5760, 1140] logits tensor is materialized, the f32 softmax makes
several more passes, and XLA keeps S in TWO layouts — {2,1,0} for the
Pallas A@S matvec and a transposed {1,0,2} for the S^T contractions —
paying ~450 us/step of pure relayout copies.

This kernel computes, per 128-row tile, entirely in VMEM:

    logits = x12 @ K12 + h3a @ K3f + const     (f32 accumulation)
    s      = softmax(logits, axis=-1) * mask   (f32, cast to out dtype)

and writes BOTH consumer layouts in one pass: ``s`` [B, N, C] (for A @ S)
and ``s_t`` [B, C, N] (for S^T x / S^T(A S)) — the logits tensor never
exists in HBM, the softmax is single-pass, and no relayout copies remain.

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


def _kernel(nn_ref, x12_ref, h3a_ref, k12_ref, k3f_ref, const_ref,
            s_ref, st_ref):
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
    rows = ri * TILE + jax.lax.broadcasted_iota(jnp.int32, (TILE, 1), 0)
    s = s * (rows < nn_ref[bi]).astype(jnp.float32)
    sb = s.astype(s_ref.dtype)
    s_ref[0] = sb
    st_ref[0] = sb.T


def _interpret() -> bool:
    # follow the BSR kernel's interpret toggle: CPU tests that turn on the
    # Pallas stage-1 path expect the whole pallas tier to run interpreted
    from cgcnet_tpu.ops.pallas import bsr_kernel

    return _INTERPRET or bsr_kernel._INTERPRET


def _fwd_call(x12, h3a, k12, k3f, const, mask):
    from jax.experimental.pallas import tpu as pltpu

    b, n, c = h3a.shape
    f12 = x12.shape[-1]
    assert n % TILE == 0, n
    dt = h3a.dtype
    # the model's mask is always the prefix `row < n_nodes` (CellGraph.mask)
    nn = jnp.sum(mask.astype(jnp.float32), axis=1).astype(jnp.int32)
    out_shape = (
        jax.ShapeDtypeStruct((b, n, c), dt),
        jax.ShapeDtypeStruct((b, c, n), dt),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n // TILE),
        in_specs=[
            pl.BlockSpec((1, TILE, f12), lambda bi, ri, nn: (bi, ri, 0)),
            pl.BlockSpec((1, TILE, c), lambda bi, ri, nn: (bi, ri, 0)),
            pl.BlockSpec((f12, c), lambda bi, ri, nn: (0, 0)),
            pl.BlockSpec((c, c), lambda bi, ri, nn: (0, 0)),
            pl.BlockSpec((1, c), lambda bi, ri, nn: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, TILE, c), lambda bi, ri, nn: (bi, ri, 0)),
            pl.BlockSpec((1, c, TILE), lambda bi, ri, nn: (bi, 0, ri)),
        ),
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * c * (f12 + c),
            bytes_accessed=b * n * (f12 + 3 * c) * jnp.dtype(dt).itemsize,
            transcendentals=b * n * c,
        ),
    )(nn, x12, h3a, k12.astype(dt), k3f.astype(dt), const[None, :])


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
