"""Pallas TPU kernel for padded-ELL neighbourhood aggregation.

The hot contraction of the framework (SURVEY.md §2.3 P1 — the reference's
``adj @ x`` at model/network.py:206 and inside DenseSAGEConv):

    out[b, i, :] = sum_k w[b, i, k] * x[b, nbr[b, i, k], :]

Strategy: per batch element, the node-feature table ``x[b]`` ([N, F], ~1.4 MB
at the canonical N=5760, F<=60) lives wholly in VMEM; the kernel performs K
lane-batched ``dynamic_gather`` ops (Mosaic's take_along_axis lowering — one
full-column row-gather per neighbour slot) and a weighted accumulate on the
VPU. Total data movement is proportional to the *edge count* (N*K*F), i.e.
the ~700x sparsity win over the reference's dense [N, N] matmul is captured
exactly (BASELINE.md workload constants).

The op is linear in x; its VJP w.r.t. x is aggregation over the transposed
graph, which the loader provides as a second ELL table — so forward and
backward use the same kernel (see ``ell_spmm_factored``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False  # flipped by tests on CPU


def set_interpret(value: bool) -> None:
    global _INTERPRET
    _INTERPRET = value


def _gather_kernel(nbr_ref, w_ref, x_ref, out_ref):
    _, n, f = x_ref.shape
    k = nbr_ref.shape[-1]
    x = x_ref[0]
    acc = jnp.zeros((n, f), jnp.float32)
    for ki in range(k):
        idx = jax.lax.broadcast_in_dim(nbr_ref[0, :, ki], (n, f), (0,))
        g = jnp.take_along_axis(x, idx, axis=0)
        acc = acc + g * w_ref[0, :, ki][:, None]
    out_ref[0] = acc.astype(out_ref.dtype)


def ell_gather_sum_pallas(
    nbr: jax.Array, w: jax.Array, x: jax.Array
) -> jax.Array:
    """Pallas implementation of ops.ell.ell_gather_sum (same contract).

    nbr i32[B, N, K], w f32[B, N, K], x f32[B, N, F] -> f32[B, N, F].
    Requires the whole per-graph feature table to fit VMEM (true for cell
    graphs; mega-graphs go through the sharded path in cgcnet_tpu.parallel).
    """
    b, n, k = nbr.shape
    f = x.shape[-1]
    kernel = pl.pallas_call(
        _gather_kernel,
        out_shape=jax.ShapeDtypeStruct((b, n, f), x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, f), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, n, f), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=_INTERPRET,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * k * f,
            bytes_accessed=b * (2 * n * k * 4 + 2 * n * f * 4),
            transcendentals=0,
        ),
    )
    return kernel(nbr, w.astype(jnp.float32), x)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def ell_spmm_factored(
    nbr: jax.Array,
    mask: jax.Array,
    nbr_t: jax.Array,
    mask_t: jax.Array,
    scale: jax.Array,
    self_w: jax.Array,
    x: jax.Array,
) -> jax.Array:
    """A @ x for A = diag(scale) * B + self_w * I, B the binary off-diagonal
    ELL adjacency (``nbr``/``mask``), with ``nbr_t``/``mask_t`` its transpose.

    This factorization covers both reference adjacency modes:
      - adaptive renorm (``--norm_adj``, model/network.py:183-191):
        scale = (1-p)/deg, self_w = p;
      - raw binary with self-loops: scale = node_valid, self_w = 1.

    Being linear in x with data-derived (constant) weights, the VJP is exactly
    aggregation over the transposed graph:  dx = B^T (scale * g) + self_w * g
    — the same Pallas kernel, fed the transpose table.
    """
    gathered = ell_gather_sum_pallas(nbr, mask, x)
    return scale[..., None] * gathered + self_w * x


def _fwd(nbr, mask, nbr_t, mask_t, scale, self_w, x):
    out = ell_spmm_factored(nbr, mask, nbr_t, mask_t, scale, self_w, x)
    return out, (nbr, mask, nbr_t, mask_t, scale, self_w)


def _bwd(res, g):
    nbr, mask, nbr_t, mask_t, scale, self_w = res
    sg = scale[..., None] * g
    dx = ell_gather_sum_pallas(nbr_t, mask_t, sg) + self_w * g
    zeros = lambda a: jnp.zeros_like(a)
    return (
        zeros(nbr),
        zeros(mask),
        zeros(nbr_t),
        zeros(mask_t),
        zeros(scale),
        jnp.zeros_like(self_w),
        dx,
    )


ell_spmm_factored.defvjp(_fwd, _bwd)
