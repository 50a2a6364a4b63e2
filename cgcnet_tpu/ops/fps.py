"""Farthest-point and fused node subsampling.

Replaces the reference samplers (``FarthestSampler`` common/utils.py:187-197,
fuse split dataflow/data.py:210-219): greedy max-min FPS over a precomputed
distance table, plus the 'fuse' scheme = 70% FPS + 30% uniform from the
complement.

Determinism: the reference seeds global NumPy RNG ad hoc (dataflow/data.py:
137-140), which cannot be reproduced across workers/hosts. Here every sampling
decision is drawn from an explicit ``np.random.Generator`` derived from
(seed, patch_id, epoch) — see cgcnet_tpu.dataflow.rng.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def farthest_point_sample_np(
    dist: np.ndarray, k: int, rng: np.random.Generator
) -> np.ndarray:
    """Greedy max-min FPS over a dense [N, N] distance table.

    Matches the reference ``FarthestSampler.__call__`` (common/utils.py:190-197):
    random start, then argmax (first-on-ties) of the running min distance.
    """
    n = dist.shape[0]
    k = min(k, n)
    out = np.zeros(k, dtype=np.int32)
    out[0] = rng.integers(n)
    running = dist[out[0]].copy()
    for i in range(1, k):
        out[i] = int(np.argmax(running))
        running = np.minimum(running, dist[out[i]])
    return out


def farthest_point_sample_coords_np(
    pos: np.ndarray, k: int, rng: np.random.Generator
) -> np.ndarray:
    """FPS directly over coordinates (no N^2 table) — O(N*k) memory-light
    variant for whole-slide graphs (analog of FarthestSampler2,
    common/utils.py:169-184, but returning indices)."""
    n = pos.shape[0]
    k = min(k, n)
    out = np.zeros(k, dtype=np.int32)
    out[0] = rng.integers(n)
    d = np.sum((pos - pos[out[0]]) ** 2, axis=-1)
    for i in range(1, k):
        out[i] = int(np.argmax(d))
        d = np.minimum(d, np.sum((pos - pos[out[i]]) ** 2, axis=-1))
    return out


def fuse_sample_np(
    dist: np.ndarray,
    num_subsample: int,
    rng: np.random.Generator,
    far_fraction: float = 0.7,
) -> np.ndarray:
    """'fuse' sampling: ``far_fraction`` FPS + the rest uniform from the
    complement (reference dataflow/data.py:210-219)."""
    n = dist.shape[0]
    num_subsample = min(num_subsample, n)
    far_num = int(far_fraction * num_subsample)
    rand_num = num_subsample - far_num
    far_idx = farthest_point_sample_np(dist, far_num, rng) if far_num > 0 else np.zeros(0, np.int32)
    remain = np.setdiff1d(np.arange(n), far_idx, assume_unique=False)
    rand_idx = rng.choice(remain, size=min(rand_num, len(remain)), replace=False).astype(np.int32)
    return np.concatenate([far_idx, rand_idx], axis=0)


def farthest_point_sample_jnp(
    pos: jax.Array, n_nodes: jax.Array, k: int, key: jax.Array
) -> jax.Array:
    """jit-safe coordinate-space FPS over padded points.

    Args:
      pos: f32[N, D]; rows >= n_nodes are padding.
      n_nodes: scalar i32.
      k: static sample count (indices past real capacity repeat the argmax —
         callers should mask with ``k <= n_nodes`` semantics).

    Returns i32[k] selected indices.
    """
    n = pos.shape[0]
    valid = jnp.arange(n) < n_nodes
    start = jax.random.randint(key, (), 0, jnp.maximum(n_nodes, 1))

    def dist_to(i):
        d = jnp.sum((pos - pos[i]) ** 2, axis=-1)
        return jnp.where(valid, d, -jnp.inf)

    def step(carry, _):
        running = carry
        nxt = jnp.argmax(running).astype(jnp.int32)
        running = jnp.minimum(running, dist_to(nxt))
        return running, nxt

    running0 = dist_to(start)
    _, rest = jax.lax.scan(step, running0, None, length=k - 1)
    return jnp.concatenate([start[None].astype(jnp.int32), rest])
