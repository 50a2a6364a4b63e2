"""Radius-bounded kNN graph construction.

Replaces torch-cluster's native ``radius_graph`` (reference call sites
dataflow/data.py:246,255,297,348 — radius 100px, loop=True, max 8 neighbours).

Semantics note: torch-cluster's radius search returns the *first* K points
within the radius in index order, not the nearest. The TPU build's default is
the strictly-better deterministic variant — the K *nearest* within the radius,
ties broken by lower index, self always included first (loop=True) — with a
``scan_order=True`` compat mode reproducing the reference's first-K-found
behaviour. Both are exactly reproducible across hosts.

Host path: NumPy (with a C++ grid-hash fast path via cgcnet_tpu.dataflow.native
for whole-slide graphs). In-graph path: jnp, jit-safe, static shapes.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def radius_knn_np(
    pos: np.ndarray,
    radius: float,
    k: int,
    *,
    loop: bool = True,
    scan_order: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """Build an ELL neighbour list from 2-D points.

    Args:
      pos: f32[N, 2] coordinates.
      radius: max edge length.
      k: max neighbours per node (ELL width).
      loop: include the self edge (always slot 0 in nearest mode).
      scan_order: reference-compat "first k within radius in index order".

    Returns (nbr i32[N, k], mask f32[N, k]).
    """
    n = pos.shape[0]
    nbr = np.tile(np.arange(n, dtype=np.int32)[:, None], (1, k))
    mask = np.zeros((n, k), dtype=np.float32)
    if n == 0:
        return nbr, mask
    d2 = np.sum((pos[:, None, :] - pos[None, :, :]) ** 2, axis=-1)
    r2 = float(radius) ** 2
    within = d2 <= r2
    if not loop:
        np.fill_diagonal(within, False)
    else:
        # self sorts strictly first even among coincident points (distance-0
        # ties would otherwise displace it by index order) — the BSR path
        # folds the self weight into ELL slot 0 and relies on this contract
        np.fill_diagonal(d2, -1.0)
    for i in range(n):
        (cand,) = np.nonzero(within[i])
        if scan_order:
            sel = cand[:k]
        else:
            order = np.lexsort((cand, d2[i, cand]))  # distance, then index
            sel = cand[order][:k]
        nbr[i, : len(sel)] = sel.astype(np.int32)
        mask[i, : len(sel)] = 1.0
    return nbr, mask


def radius_knn_dense_oracle(
    pos: np.ndarray, radius: float, k: int, *, loop: bool = True
) -> np.ndarray:
    """O(N^2) dense-adjacency oracle for tests: adj[i, j] = 1 iff j is among
    the k nearest points to i within ``radius`` (ties by lower index)."""
    n = pos.shape[0]
    nbr, mask = radius_knn_np(pos, radius, k, loop=loop)
    adj = np.zeros((n, n), dtype=np.float32)
    for i in range(n):
        adj[i, nbr[i, mask[i] > 0]] = 1.0
    return adj


def radius_knn_jnp(
    pos: jax.Array,
    n_nodes: jax.Array,
    radius: float,
    k: int,
) -> tuple[jax.Array, jax.Array]:
    """jit-safe nearest-k-within-radius over padded points.

    Args:
      pos: f32[N, 2]; rows >= n_nodes are padding.
      n_nodes: scalar i32 real point count.

    Returns (nbr i32[N, k], mask f32[N, k]) with self always at slot 0.
    """
    n = pos.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    valid = idx < n_nodes
    d2 = jnp.sum((pos[:, None, :] - pos[None, :, :]) ** 2, axis=-1)
    ok = (d2 <= float(radius) ** 2) & valid[None, :] & valid[:, None]

    # Exact two-key lexicographic order (distance, then index) — matches
    # radius_knn_np's lexsort bit-for-bit; a fractional score bias would
    # mis-order near-equal f32 distances at large n.
    d2_key = jnp.where(ok, d2, jnp.inf)
    # self sorts strictly first even among coincident points (slot-0 self
    # contract, same as radius_knn_np's -1 diagonal)
    d2_key = d2_key.at[idx, idx].set(jnp.where(valid, -1.0, jnp.inf))
    idx_b = jnp.broadcast_to(idx[None, :], (n, n))
    d2_sorted, nbr_sorted = jax.lax.sort((d2_key, idx_b), num_keys=2)
    vals, nbr = d2_sorted[:, :k], nbr_sorted[:, :k]
    mask = jnp.isfinite(vals).astype(jnp.float32)
    nbr = jnp.where(mask > 0, nbr.astype(jnp.int32), idx[:, None])
    return nbr, mask
