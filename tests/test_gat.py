"""GAT attention convolution (capability extension; gcn_name='GAT')."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cgcnet_tpu.config import ModelConfig
from cgcnet_tpu.core.graph import CellGraph
from cgcnet_tpu.nn.model import CGCNet, cross_entropy_loss

from tests.test_model import build_graph


def test_gat_ell_matches_dense(rng):
    """Attention over the ELL layout must equal attention over the dense
    adjacency with the same support set."""
    from cgcnet_tpu.core.convert import ell_to_dense
    from cgcnet_tpu.nn.adjacency import DenseAdj, EllAdj
    from cgcnet_tpu.nn.layers import GATConv

    g = build_graph(rng, batch=2, cap=32)
    x = jnp.asarray(rng.normal(size=(2, 32, 10)).astype(np.float32))
    ell = EllAdj(nbr=g.nbr, w=g.weights(), impl="xla")
    dense = DenseAdj(ell_to_dense(g))
    conv = GATConv(12)
    v = conv.init(jax.random.key(0), x, ell)
    out_ell = np.asarray(conv.apply(v, x, ell))
    out_dense = np.asarray(conv.apply(v, x, dense))
    # compare real rows only (padded rows differ: ELL attends to self)
    for b in range(2):
        n = int(g.n_nodes[b])
        np.testing.assert_allclose(
            out_ell[b, :n], out_dense[b, :n], atol=2e-5, rtol=1e-4
        )


def test_gat_model_runs_and_learns(rng):
    cfg = ModelConfig(
        max_num_nodes=100, assign_ratio=0.2, gcn_name="GAT",
        drop_out=0.0, use_pallas=False,
    )
    g = build_graph(rng, batch=3, cap=32)
    model = CGCNet(cfg)
    v = model.init(jax.random.key(0), g, train=False)
    logits = np.asarray(model.apply(v, g, train=False))
    assert np.isfinite(logits).all() and logits.shape == (3, 3)

    import optax

    tx = optax.adam(1e-2)
    params = v["params"]
    opt = tx.init(params)

    def loss_fn(p):
        out, mut = model.apply(
            {"params": p, "batch_stats": v["batch_stats"]},
            g, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(1)},
        )
        return cross_entropy_loss(out, g.y)

    losses = []
    for step in range(25):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(grads, opt, params)
        params = jax.tree.map(lambda a, u: a + u, params, upd)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, losses[::6]


def test_gat_multihead_ell_matches_dense(rng):
    from cgcnet_tpu.core.convert import ell_to_dense
    from cgcnet_tpu.nn.adjacency import DenseAdj, EllAdj
    from cgcnet_tpu.nn.layers import GATConv

    g = build_graph(rng, batch=2, cap=32)
    x = jnp.asarray(rng.normal(size=(2, 32, 10)).astype(np.float32))
    ell = EllAdj(nbr=g.nbr, w=g.weights(), impl="xla")
    dense = DenseAdj(ell_to_dense(g))
    conv = GATConv(12, heads=3)
    v = conv.init(jax.random.key(2), x, ell)
    out_ell = np.asarray(conv.apply(v, x, ell))
    out_dense = np.asarray(conv.apply(v, x, dense))
    for b in range(2):
        n = int(g.n_nodes[b])
        np.testing.assert_allclose(
            out_ell[b, :n], out_dense[b, :n], atol=2e-5, rtol=1e-4
        )
    # heads change the function (not just a reshape of heads=1)
    conv1 = GATConv(12, heads=1)
    out1 = np.asarray(conv1.apply(v, x, ell))
    assert not np.allclose(out1, out_ell, atol=1e-3)


def test_gat_model_multihead_runs(rng):
    cfg = ModelConfig(
        max_num_nodes=100, assign_ratio=0.2, gcn_name="GAT", gat_heads=4,
        drop_out=0.0, use_pallas=False,
    )
    g = build_graph(rng, batch=2, cap=32)
    model = CGCNet(cfg)
    v = model.init(jax.random.key(1), g, train=False)
    logits = np.asarray(model.apply(v, g, train=False))
    assert np.isfinite(logits).all()
