"""Dual-stream paired tails (nn/blocks.py::_dual_tail) vs solo blocks.

`paired_blocks` runs the (embed, pool) conv tails of layers 1-2 as single
concatenated-stream kernels when widths/settings match. The math contract:
bit-compatible with running the two GNNBlocks independently (same l2norm,
mask, activation, BN statistics and running-stat updates).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as fnn

from cgcnet_tpu.nn.adjacency import DenseAdj
from cgcnet_tpu.nn.blocks import GNNBlock, paired_blocks


def _mk_block(name, lin, gcn="SAGE", hidden=12, emb=12, input_dim=None):
    return GNNBlock(
        hidden_dim=hidden,
        embedding_dim=emb,
        use_lin=lin,
        gcn_name=gcn,
        masked_bn=True,
        input_dim=input_dim,
        name=name,
    )


class Paired(fnn.Module):
    gcn: str = "SAGE"
    input_dim: int | None = None  # set -> exercises the merged-lin path

    @fnn.compact
    def __call__(self, x, adj, mask, *, train=False):
        e = _mk_block("e", lin=False, gcn=self.gcn, input_dim=self.input_dim)
        p = _mk_block("p", lin=True, gcn=self.gcn, input_dim=self.input_dim)
        return paired_blocks(e, p, x, adj, mask, train=train)


class Solo(fnn.Module):
    gcn: str = "SAGE"
    input_dim: int | None = None

    @fnn.compact
    def __call__(self, x, adj, mask, *, train=False):
        e = _mk_block("e", lin=False, gcn=self.gcn, input_dim=self.input_dim)
        p = _mk_block("p", lin=True, gcn=self.gcn, input_dim=self.input_dim)
        return e(x, adj, mask, train=train), p(x, adj, mask, train=train)


def _inputs(rng, b=2, n=40, feat=10):
    x = rng.normal(size=(b, n, feat)).astype(np.float32)
    a = (rng.uniform(size=(b, n, n)) < 0.15).astype(np.float32)
    a = np.maximum(a, np.swapaxes(a, 1, 2))
    mask = np.zeros((b, n), np.float32)
    for bi, nn_ in enumerate(rng.integers(n // 2, n, size=b)):
        mask[bi, :nn_] = 1.0
    a = a * mask[:, :, None] * mask[:, None, :]
    x = x * mask[..., None]
    return (
        jnp.asarray(x),
        DenseAdj(jnp.asarray(a)),
        jnp.asarray(mask),
    )


@pytest.mark.parametrize("merged", [False, True])
@pytest.mark.parametrize("train", [False, True])
@pytest.mark.parametrize("use_mask", [True, False])
def test_dual_matches_solo(rng, train, use_mask, merged):
    x, adj, mask = _inputs(rng)
    if not use_mask:
        mask = None
    input_dim = x.shape[-1] if merged else None
    paired = Paired(input_dim=input_dim)
    solo = Solo(input_dim=input_dim)
    v = paired.init(jax.random.key(0), x, adj, mask)
    kw = dict(mutable=["batch_stats"]) if train else {}
    out_p = paired.apply(v, x, adj, mask, train=train, **kw)
    out_s = solo.apply(v, x, adj, mask, train=train, **kw)
    if train:
        (e_p, p_p), bs_p = out_p
        (e_s, p_s), bs_s = out_s
    else:
        e_p, p_p = out_p
        e_s, p_s = out_s
    np.testing.assert_allclose(
        np.asarray(e_p), np.asarray(e_s), atol=3e-6, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(p_p), np.asarray(p_s), atol=3e-6, rtol=1e-5
    )
    if train:
        for (kp, lp), (ks, ls) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(bs_p), key=lambda t: str(t[0])),
            sorted(jax.tree_util.tree_leaves_with_path(bs_s), key=lambda t: str(t[0])),
        ):
            assert str(kp) == str(ks)
            np.testing.assert_allclose(
                np.asarray(lp), np.asarray(ls), atol=3e-6, rtol=1e-5,
                err_msg=str(kp),
            )


@pytest.mark.parametrize("merged", [False, True])
def test_dual_grads_match_solo(rng, merged):
    x, adj, mask = _inputs(rng)
    input_dim = x.shape[-1] if merged else None
    paired = Paired(input_dim=input_dim)
    solo = Solo(input_dim=input_dim)
    v = paired.init(jax.random.key(0), x, adj, mask)

    def loss(params, model):
        (e, p), _ = model.apply(
            {**v, "params": params}, x, adj, mask, train=True,
            mutable=["batch_stats"],
        )
        return jnp.sum(e.astype(jnp.float32) ** 2) + jnp.sum(
            p.astype(jnp.float32) ** 2
        )

    g_p = jax.grad(loss)(v["params"], paired)
    g_s = jax.grad(loss)(v["params"], solo)
    for (kp, lp), (ks, ls) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(g_p), key=lambda t: str(t[0])),
        sorted(jax.tree_util.tree_leaves_with_path(g_s), key=lambda t: str(t[0])),
    ):
        assert str(kp) == str(ks)
        np.testing.assert_allclose(
            np.asarray(lp), np.asarray(ls), atol=1e-4, rtol=1e-4,
            err_msg=str(kp),
        )


def test_gin_falls_back(rng):
    """GIN pairs can't dual-fuse — the fallback path must still run."""
    x, adj, mask = _inputs(rng)
    paired = Paired(gcn="GIN")
    v = paired.init(jax.random.key(0), x, adj, mask)
    e, p = paired.apply(v, x, adj, mask)
    assert np.isfinite(np.asarray(e)).all()
    assert np.isfinite(np.asarray(p)).all()


def test_dual_l2norm_custom_vjp_matches_autodiff():
    """The hand-written dual_l2norm_2d backward == autodiff of the
    composable form (incl. zero rows and a near-zero row that probes the
    max(norm, eps) clamp guard)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from cgcnet_tpu.nn.blocks import dual_l2norm_2d

    f = 5
    rng = np.random.default_rng(0)
    cat = rng.normal(size=(8, 2 * f)).astype(np.float32)
    cat[3] = 0.0                    # pad row
    cat[5, :f] = 1e-13              # near-zero stream (clamped branch)
    cat = jnp.asarray(cat)

    def ref(c):
        c32 = c.astype(jnp.float32)
        a, b = c32[..., :f], c32[..., f:]
        na = jnp.maximum(jnp.sqrt(jnp.sum(a * a, -1, keepdims=True)), 1e-12)
        nb = jnp.maximum(jnp.sqrt(jnp.sum(b * b, -1, keepdims=True)), 1e-12)
        return jnp.concatenate([a / na, b / nb], -1).astype(c.dtype)

    g = jnp.asarray(rng.normal(size=(8, 2 * f)).astype(np.float32))
    out, vjp = jax.vjp(lambda c: dual_l2norm_2d(c, f), cat)
    out_r, vjp_r = jax.vjp(ref, cat)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_r), atol=1e-7)
    d, d_ref = np.asarray(vjp(g)[0]), np.asarray(vjp_r(g)[0])
    # the composable reference NaNs on an ALL-ZERO row (0/0 in the sqrt
    # VJP under the max clamp); the hand-written backward returns the
    # max-rule limit g/eps there — strictly better. Compare where the
    # reference is finite; require finiteness everywhere from ours.
    assert np.isfinite(d).all()
    ok = np.isfinite(d_ref)
    assert ok[~np.isclose(np.asarray(cat), 0).all(-1)].all()
    scale = np.abs(d_ref[ok]).max()
    np.testing.assert_allclose(
        d[ok], d_ref[ok], rtol=1e-5, atol=1e-6 * scale
    )
