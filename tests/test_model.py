"""Model-level behaviour tests: shapes, padding invariance, gradients."""

import numpy as np

import jax
import jax.numpy as jnp

from cgcnet_tpu.config import ModelConfig
from cgcnet_tpu.core.graph import CellGraph
from cgcnet_tpu.nn.model import CGCNet, cross_entropy_loss
from cgcnet_tpu.ops.knn import radius_knn_np


def build_graph(rng, batch, cap, feat=18, k=6, n_lo=15, n_hi=None):
    n_hi = n_hi or cap
    xs, nbrs, masks, nns = [], [], [], []
    for _ in range(batch):
        n = int(rng.integers(n_lo, n_hi + 1))
        pos = rng.uniform(0, 250, (n, 2)).astype(np.float32)
        nbr, m = radius_knn_np(pos, 100.0, k)
        nbrp = np.tile(np.arange(cap, dtype=np.int32)[:, None], (1, k))
        mp = np.zeros((cap, k), np.float32)
        nbrp[:n], mp[:n] = nbr, m
        x = np.zeros((cap, feat), np.float32)
        x[:n] = rng.normal(size=(n, feat)).astype(np.float32)
        xs.append(x); nbrs.append(nbrp); masks.append(mp); nns.append(n)
    return CellGraph(
        x=jnp.asarray(np.stack(xs)),
        nbr=jnp.asarray(np.stack(nbrs)),
        nbr_mask=jnp.asarray(np.stack(masks)),
        n_nodes=jnp.asarray(np.array(nns, np.int32)),
        y=jnp.asarray(rng.integers(0, 3, size=batch).astype(np.int32)),
    )


def repad(g: CellGraph, new_cap: int) -> CellGraph:
    """Same graphs, larger node capacity."""
    b, cap, feat = g.x.shape
    k = g.nbr.shape[2]
    x = np.zeros((b, new_cap, feat), np.float32)
    x[:, :cap] = np.asarray(g.x)
    nbr = np.tile(np.arange(new_cap, dtype=np.int32)[None, :, None], (b, 1, k))
    nbr[:, :cap] = np.asarray(g.nbr)
    mask = np.zeros((b, new_cap, k), np.float32)
    mask[:, :cap] = np.asarray(g.nbr_mask)
    return g.replace(
        x=jnp.asarray(x), nbr=jnp.asarray(nbr), nbr_mask=jnp.asarray(mask)
    )


CFG = ModelConfig(max_num_nodes=100, assign_ratio=0.2, use_pallas=False)


def test_padding_invariance(rng):
    """With masked BN + masked readout, logits must not depend on how much
    padding the batch carries (SURVEY.md §7 hard part 5)."""
    g = build_graph(rng, batch=2, cap=32)
    model = CGCNet(CFG)
    v = model.init(jax.random.key(0), g, train=False)
    base = model.apply(v, g, train=False)
    wide = model.apply(v, repad(g, 56), train=False)
    np.testing.assert_allclose(np.asarray(base), np.asarray(wide), atol=2e-5)

    # train-mode batch stats must also be padding-invariant
    out_a, mut_a = model.apply(v, g, train=True, mutable=["batch_stats"],
                               rngs={"dropout": jax.random.key(1)})
    out_b, mut_b = model.apply(v, repad(g, 56), train=True,
                               mutable=["batch_stats"],
                               rngs={"dropout": jax.random.key(1)})
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5
        ),
        mut_a["batch_stats"],
        mut_b["batch_stats"],
    )


def test_gradients_finite_and_nonzero(rng):
    g = build_graph(rng, batch=3, cap=30)
    model = CGCNet(CFG)
    v = model.init(jax.random.key(0), g, train=False)

    def loss_fn(params):
        logits, _ = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            g, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(2)},
        )
        return cross_entropy_loss(logits, g.y)

    grads = jax.grad(loss_fn)(v["params"])
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    total = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
    assert total > 0


def test_batch_independence(rng):
    """Each graph's logits must not depend on other graphs in the batch
    (masked BN excludes padding but still mixes batch stats in train mode —
    so check eval mode)."""
    g = build_graph(rng, batch=4, cap=24)
    model = CGCNet(CFG)
    v = model.init(jax.random.key(0), g, train=False)
    full = np.asarray(model.apply(v, g, train=False))
    for i in range(4):
        sub = jax.tree.map(lambda a: a[i : i + 1], g)
        one = np.asarray(model.apply(v, sub, train=False))
        np.testing.assert_allclose(one[0], full[i], atol=2e-5)


def test_jit_compiles_once(rng):
    g = build_graph(rng, batch=2, cap=24)
    model = CGCNet(CFG)
    v = model.init(jax.random.key(0), g, train=False)

    @jax.jit
    def fwd(vars_, graph):
        return model.apply(vars_, graph, train=False)

    a = fwd(v, g)
    g2 = build_graph(np.random.default_rng(42), batch=2, cap=24)
    b = fwd(v, g2)  # same shapes -> cache hit
    assert fwd._cache_size() == 1
    assert a.shape == b.shape == (2, 3)


def test_collect_assign(rng):
    g = build_graph(rng, batch=2, cap=24)
    model = CGCNet(CFG)
    v = model.init(jax.random.key(0), g, train=False)
    logits, assigns = model.apply(v, g, train=False, collect_assign=True)
    d1, d2 = CFG.assign_dims
    assert assigns[0].shape == (2, 24, d1)
    assert assigns[1].shape == (2, d1, d2)
    # soft assignments: rows of real nodes sum to 1
    s0 = np.asarray(assigns[0])
    nn0 = int(g.n_nodes[0])
    np.testing.assert_allclose(s0[0, :nn0].sum(-1), 1.0, atol=1e-5)


def test_fold_assign_tail_equivalence(rng):
    """finish_folded (BN affine folded into the lin kernel) must match the
    literal bn3 -> concat -> lin op order: same param tree, same logits
    (train + eval), same batch-stat updates, same grads — for masked and
    reference-quirk BN."""
    import dataclasses

    g = build_graph(rng, batch=2, cap=32)
    for masked_bn in (True, False):
        cfg_on = dataclasses.replace(
            CFG, masked_bn=masked_bn, fold_assign_tail=True
        )
        cfg_off = dataclasses.replace(
            CFG, masked_bn=masked_bn, fold_assign_tail=False
        )
        m_on, m_off = CGCNet(cfg_on), CGCNet(cfg_off)
        v_on = m_on.init(jax.random.key(0), g, train=False)
        v_off = m_off.init(jax.random.key(0), g, train=False)
        # identical param trees (fold is an algebra change, not a layout one)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)
            ),
            v_on["params"],
            v_off["params"],
        )
        np.testing.assert_allclose(
            np.asarray(m_on.apply(v_on, g, train=False)),
            np.asarray(m_off.apply(v_off, g, train=False)),
            atol=2e-5,
        )

        def loss(params, model, variables):
            out, mut = model.apply(
                {**variables, "params": params}, g, train=True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.key(1)},
            )
            return cross_entropy_loss(out, g.y), mut["batch_stats"]

        (l_on, bs_on), g_on = jax.value_and_grad(loss, has_aux=True)(
            v_on["params"], m_on, v_on
        )
        (l_off, bs_off), g_off = jax.value_and_grad(loss, has_aux=True)(
            v_off["params"], m_off, v_off
        )
        np.testing.assert_allclose(float(l_on), float(l_off), atol=2e-5)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4
            ),
            bs_on,
            bs_off,
        )
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-4
            ),
            g_on,
            g_off,
        )
