import numpy as np

import jax
import jax.numpy as jnp

from cgcnet_tpu.ops.ell import ell_gather_sum
from cgcnet_tpu.ops.sddmm import ell_edge_softmax, ell_sddmm


def test_sddmm_matches_dense(rng):
    b, n, k, f = 2, 12, 4, 6
    nbr = jnp.asarray(rng.integers(0, n, (b, n, k)).astype(np.int32))
    mask = jnp.asarray((rng.uniform(size=(b, n, k)) < 0.7).astype(np.float32))
    a = jnp.asarray(rng.normal(size=(b, n, f)).astype(np.float32))
    c = jnp.asarray(rng.normal(size=(b, n, f)).astype(np.float32))
    out = np.asarray(ell_sddmm(nbr, mask, a, c))
    for bi in range(b):
        for i in range(n):
            for kk in range(k):
                want = float(mask[bi, i, kk]) * float(
                    np.dot(np.asarray(a)[bi, i], np.asarray(c)[bi, int(nbr[bi, i, kk])])
                )
                np.testing.assert_allclose(out[bi, i, kk], want, atol=1e-5)


def test_edge_softmax_rows_normalize(rng):
    b, n, k = 2, 8, 5
    scores = jnp.asarray(rng.normal(size=(b, n, k)).astype(np.float32))
    mask = jnp.asarray((rng.uniform(size=(b, n, k)) < 0.6).astype(np.float32))
    w = np.asarray(ell_edge_softmax(scores, mask))
    assert (w[np.asarray(mask) == 0] == 0).all()
    sums = w.sum(-1)
    has = np.asarray(mask).sum(-1) > 0
    np.testing.assert_allclose(sums[has], 1.0, atol=1e-5)
    assert (sums[~has] == 0).all()


def test_attention_aggregation_composes(rng):
    """SDDMM -> softmax -> gather_sum = one attention head over the graph."""
    b, n, k, f = 1, 10, 3, 4
    nbr = jnp.asarray(rng.integers(0, n, (b, n, k)).astype(np.int32))
    mask = jnp.ones((b, n, k), jnp.float32)
    x = jnp.asarray(rng.normal(size=(b, n, f)).astype(np.float32))

    def attn(x_):
        s = ell_sddmm(nbr, mask, x_, x_)
        w = ell_edge_softmax(s / np.sqrt(f), mask)
        return ell_gather_sum(nbr, w, x_)

    out = attn(x)
    assert np.isfinite(np.asarray(out)).all()
    g = jax.grad(lambda x_: jnp.sum(attn(x_) ** 2))(x)
    assert np.isfinite(np.asarray(g)).all()
