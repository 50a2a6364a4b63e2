"""Layout converters: COO edge lists <-> padded ELL <-> dense adjacency.

Replaces the reference's torch-sparse densification utilities
(``sparse_to_dense``/``to_dense_adj``, dataflow/data.py:247 and
model/utils.py:3-37) with static-shape converters. The NumPy variants run
host-side in the input pipeline; the jnp variants are jit-safe and used in
tests and the in-graph dynamic path.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from cgcnet_tpu.core.graph import CellGraph


# ---------------------------------------------------------------------------
# Host-side (NumPy) converters — used by the loader.
# ---------------------------------------------------------------------------

def coo_to_ell_np(
    src: np.ndarray,
    dst: np.ndarray,
    num_nodes: int,
    width: int,
    capacity: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """COO edge list -> padded ELL.

    Edge (dst, src) means "dst aggregates from src" (row=dst, col=src of the
    implied adjacency). Each row keeps at most ``width`` entries in arrival
    order; overflow edges are dropped (the radius-kNN builder already caps
    degree, so overflow indicates a builder bug).

    Returns (nbr i32[capacity, width], nbr_mask f32[capacity, width]).
    """
    capacity = num_nodes if capacity is None else capacity
    nbr = np.tile(np.arange(capacity, dtype=np.int32)[:, None], (1, width))
    mask = np.zeros((capacity, width), dtype=np.float32)
    fill = np.zeros(capacity, dtype=np.int32)
    for s, d in zip(src, dst):
        k = fill[d]
        if k < width:
            nbr[d, k] = s
            mask[d, k] = 1.0
            fill[d] = k + 1
    return nbr, mask


def dense_to_ell_np(
    adj: np.ndarray, width: int, capacity: int | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Binary dense adjacency [N, N] -> padded ELL (column order)."""
    n = adj.shape[0]
    capacity = n if capacity is None else capacity
    nbr = np.tile(np.arange(capacity, dtype=np.int32)[:, None], (1, width))
    mask = np.zeros((capacity, width), dtype=np.float32)
    for i in range(n):
        (cols,) = np.nonzero(adj[i])
        cols = cols[:width]
        nbr[i, : len(cols)] = cols.astype(np.int32)
        mask[i, : len(cols)] = 1.0
    return nbr, mask


def transpose_ell_np(
    nbr: np.ndarray, mask: np.ndarray, width_t: int
) -> tuple[np.ndarray, np.ndarray, int]:
    """Transpose a padded-ELL adjacency: rows of the output list in-edges.

    For edge i -> j (slot (i, k) with nbr[i,k]=j), the transpose places i in
    row j. Used by the training path: the VJP of aggregation is aggregation
    over the transposed graph (ops.ell.ell_spmm_factored).

    Returns (nbr_t i32[N, width_t], mask_t f32[N, width_t], max_indegree).
    Raises if any in-degree exceeds ``width_t`` (pick a larger bucket).
    """
    n, k = nbr.shape
    rows = np.repeat(np.arange(n, dtype=np.int64), k)
    flat_dst = nbr.reshape(-1).astype(np.int64)
    flat_ok = mask.reshape(-1) > 0
    src, dst = rows[flat_ok], flat_dst[flat_ok]
    order = np.argsort(dst, kind="stable")
    src, dst = src[order], dst[order]
    counts = np.bincount(dst, minlength=n)
    max_indeg = int(counts.max()) if len(counts) else 0
    if max_indeg > width_t:
        raise ValueError(
            f"max in-degree {max_indeg} exceeds transpose ELL width {width_t}"
        )
    nbr_t = np.tile(np.arange(n, dtype=np.int32)[:, None], (1, width_t))
    mask_t = np.zeros((n, width_t), dtype=np.float32)
    starts = np.concatenate([[0], np.cumsum(counts)])
    slot = np.arange(len(src)) - starts[dst]
    nbr_t[dst, slot] = src.astype(np.int32)
    mask_t[dst, slot] = 1.0
    return nbr_t, mask_t, max_indeg


# ---------------------------------------------------------------------------
# jit-safe (jnp) converters.
# ---------------------------------------------------------------------------

def ell_to_dense(graph: CellGraph) -> jax.Array:
    """ELL -> dense batched adjacency f32[B, N, N] (for tests / oracles).

    Duplicate (i, j) slots collapse to the max weight, mirroring the
    reference's binarization ``adj[adj > 0] = 1`` (dataflow/data.py:250).
    """
    b, n, k = graph.nbr.shape
    w = graph.weights()
    adj = jnp.zeros((b, n, n), dtype=w.dtype)
    rows = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :, None], (b, n, k))
    adj = adj.at[
        jnp.arange(b, dtype=jnp.int32)[:, None, None],
        rows,
        graph.nbr,
    ].max(w)
    return adj


def dense_to_ell(adj: jax.Array, width: int) -> tuple[jax.Array, jax.Array]:
    """Dense [B, N, N] (binary) -> ELL via top-k on column index order.

    jit-safe; used by the in-graph dynamic-graph path and tests.
    """
    b, n, _ = adj.shape
    # Prefer present edges; among them, smaller column index first (stable
    # tie-break matching the host-side builders).
    col = jnp.arange(n, dtype=jnp.float32)[None, None, :]
    score = jnp.where(adj > 0, -col, -jnp.inf)
    vals, idx = jax.lax.top_k(score, width)
    mask = jnp.isfinite(vals).astype(jnp.float32)
    own = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :, None], (b, n, width))
    nbr = jnp.where(mask > 0, idx.astype(jnp.int32), own)
    # Restore ascending column order within each row.
    order = jnp.argsort(jnp.where(mask > 0, nbr, n + 1), axis=-1)
    nbr = jnp.take_along_axis(nbr, order, axis=-1)
    mask = jnp.take_along_axis(mask, order, axis=-1)
    return nbr, mask
