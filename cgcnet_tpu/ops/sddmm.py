"""SDDMM — sampled dense-dense matmul over padded ELL structure.

Computes per-edge scores from node embeddings: for each ELL slot (i, k),
``out[b, i, k] = <a[b, i, :], c[b, nbr[b, i, k], :]>`` — the sparse dual of
ops.ell.ell_gather_sum (SURVEY.md §4.1 kernel inventory). Used by
edge-weighted / attention-style message passing (dot-product edge logits,
optionally softmax-normalized per row) — a capability extension over the
reference's binary adjacencies.

The model-level attention consumer is ``nn.layers.GATConv`` (gcn_name='GAT'),
which fuses the same score/softmax/aggregate pattern inline over all heads
from one k/v gather; these standalone ops remain the building blocks for
custom single-head / precomputed-score message passing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ell_sddmm(
    nbr: jax.Array, mask: jax.Array, a: jax.Array, c: jax.Array
) -> jax.Array:
    """[B,N,K] scores: dot(a_i, c_j) per edge slot; 0 on padding."""

    def one(nbr_, mask_, a_, c_):
        gathered = c_[nbr_]                       # [N, K, F]
        return jnp.einsum("nf,nkf->nk", a_, gathered) * mask_

    return jax.vmap(one)(nbr, mask, a, c)


def ell_edge_softmax(scores: jax.Array, mask: jax.Array) -> jax.Array:
    """Row-wise masked softmax over the K neighbour slots (attention
    weights): padding slots get 0 and rows renormalize over real slots."""
    neg = jnp.finfo(scores.dtype).min
    masked = jnp.where(mask > 0, scores, neg)
    m = jnp.max(masked, axis=-1, keepdims=True)
    e = jnp.exp(masked - jax.lax.stop_gradient(m)) * (mask > 0)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    return e / jnp.maximum(denom, 1e-16)
