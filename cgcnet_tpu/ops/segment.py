"""Segment ops — COO-side equivalents of torch-scatter (SURVEY.md §2.3 P3).

The ELL path (ops/ell.py) is the hot path; these are the generic COO utilities
used by converters, tests, and the edge-partitioned mega-graph tools
(reference used torch-scatter ``scatter_('add', ...)`` at model/utils.py:19).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(data: jax.Array, segment_ids: jax.Array, num_segments: int) -> jax.Array:
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_max(data: jax.Array, segment_ids: jax.Array, num_segments: int) -> jax.Array:
    return jax.ops.segment_max(data, segment_ids, num_segments=num_segments)


def segment_softmax(
    logits: jax.Array, segment_ids: jax.Array, num_segments: int
) -> jax.Array:
    """Numerically-stable softmax within segments (edge-wise attention etc.)."""
    maxes = segment_max(logits, segment_ids, num_segments)
    shifted = logits - maxes[segment_ids]
    exp = jnp.exp(shifted)
    denom = segment_sum(exp, segment_ids, num_segments)
    return exp / (denom[segment_ids] + 1e-16)


def coo_spmm(
    src: jax.Array,
    dst: jax.Array,
    w: jax.Array,
    x: jax.Array,
    num_nodes: int,
) -> jax.Array:
    """COO aggregation: out[d] += w_e * x[s] for each edge e=(s, d)."""
    msgs = x[src] * w[:, None]
    return segment_sum(msgs, dst, num_nodes)
