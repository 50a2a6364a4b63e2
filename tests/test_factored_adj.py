"""Factored stage-1 adjacency (scatter-free backward) vs generic path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cgcnet_tpu.config import ModelConfig
from cgcnet_tpu.nn.model import CGCNet, cross_entropy_loss

from tests.test_model import build_graph


def attach_transpose(g, width=24):
    from cgcnet_tpu.core.convert import transpose_ell_np

    b = g.x.shape[0]
    nts, mts = [], []
    for i in range(b):
        nt, mt, _ = transpose_ell_np(
            np.asarray(g.nbr[i]), np.asarray(g.nbr_mask[i]), width
        )
        nts.append(nt)
        mts.append(mt)
    return g.replace(
        nbr_t=jnp.asarray(np.stack(nts)), nbr_t_mask=jnp.asarray(np.stack(mts))
    )


@pytest.mark.parametrize("norm_adj", [True, False])
def test_factored_matches_generic(rng, norm_adj):
    cfg = ModelConfig(
        max_num_nodes=100, assign_ratio=0.2, use_pallas=False,
        drop_out=0.0, norm_adj=norm_adj,
    )
    g = build_graph(rng, batch=3, cap=32)
    gt = attach_transpose(g)
    model = CGCNet(cfg)
    v = model.init(jax.random.key(0), g, train=False)

    out_gen = np.asarray(model.apply(v, g, train=False))
    out_fac = np.asarray(model.apply(v, gt, train=False))
    np.testing.assert_allclose(out_fac, out_gen, atol=2e-5)

    # gradients: generic autodiff (scatter) vs factored custom VJP (gather)
    def loss(params, graph):
        logits, _ = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            graph, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(1)},
        )
        return cross_entropy_loss(logits, graph.y)

    g_gen = jax.grad(loss)(v["params"], g)
    g_fac = jax.grad(loss)(v["params"], gt)
    # factored form scales after the sum (a·x1 + a·x2 vs a·(x1+x2)) — grads
    # agree to accumulation-order noise only
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=2e-3
        ),
        g_gen,
        g_fac,
    )
