"""Golden-parity tests: CGCNet (JAX) vs the pure-torch reference oracle.

The strongest contract in the suite (SURVEY.md §4.2): with transplanted
weights, identical graphs, and compat flags (masked_bn=False,
masked_readout=False) the JAX model must match the reference forward
activation-for-activation in both train mode (batch BN stats, including the
reference's padded-row quirk) and eval mode (running stats).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from cgcnet_tpu.config import ModelConfig
from cgcnet_tpu.core.convert import ell_to_dense
from cgcnet_tpu.core.graph import CellGraph
from cgcnet_tpu.nn.model import CGCNet
from cgcnet_tpu.ops.knn import radius_knn_np

from tests.torch_oracle import SoftPoolingGcnEncoderRef
from tests.transplant import transplant

torch.manual_seed(0)


def make_graph(rng, batch=3, cap=40, feat=18, k=6):
    xs, nbrs, masks, nns = [], [], [], []
    for b in range(batch):
        n = int(rng.integers(cap - 15, cap + 1))
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


def compat_cfg(**kw) -> ModelConfig:
    base = dict(
        input_dim=18,
        max_num_nodes=80,   # assign dims: 8 -> 0? keep >= 10 so stage 2 nonempty
        assign_ratio=0.2,   # 16 clusters then 3
        drop_out=0.0,
        masked_bn=False,
        masked_readout=False,
        use_pallas=False,
        norm_adj=True,
        jk=True,
    )
    base.update(kw)
    return ModelConfig(**base)


def build_oracle(cfg: ModelConfig):
    return SoftPoolingGcnEncoderRef(
        max_num_nodes=cfg.max_num_nodes,
        input_dim=cfg.input_dim,
        hidden_dim=cfg.hidden_dim,
        embedding_dim=cfg.embedding_dim,
        bias=cfg.bias,
        bn=cfg.bn,
        assign_hidden_dim=cfg.assign_hidden_dim,
        label_dim=cfg.num_classes,
        assign_ratio=cfg.assign_ratio,
        pred_hidden_dims=list(cfg.pred_hidden_dims),
        concat=cfg.concat,
        gcn_name=cfg.gcn_name,
        norm_adj=cfg.norm_adj,
        activation=cfg.activation,
        drop_out=cfg.drop_out,
        jk=cfg.jk,
    )


@pytest.mark.parametrize(
    "kw",
    [
        dict(),                                  # canonical: SAGE + JK + norm_adj
        dict(jk=False),                          # concat path (input_dim=60 stages 2-3)
        dict(norm_adj=False),                    # raw binary adjacency, mean-agg
        dict(gcn_name="GIN"),                    # GIN convolutions
        dict(activation="elu"),
        dict(bn=False),
    ],
)
def test_forward_parity(rng, kw):
    cfg = compat_cfg(**kw)
    g = make_graph(rng)
    adj_dense = np.asarray(ell_to_dense(g.replace(nbr_w=None)))

    oracle = build_oracle(cfg)
    variables = transplant(oracle.state_dict(), cfg)
    if not cfg.bn:
        variables.pop("batch_stats", None)

    x_t = torch.from_numpy(np.asarray(g.x))
    adj_t = torch.from_numpy(adj_dense)
    nn_t = np.asarray(g.n_nodes)

    # --- train mode: batch statistics (incl. the padded-row quirk) ---
    oracle.train()
    with torch.no_grad():
        ref_logits = oracle(x_t, adj_t.clone(), nn_t).numpy()

    model = CGCNet(cfg)
    out, mutated = model.apply(
        variables, g, train=True, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(np.asarray(out), ref_logits, atol=2e-4, rtol=1e-3)

    # --- running stats updated identically ---
    if cfg.bn:
        post = transplant(oracle.state_dict(), cfg)["batch_stats"]
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3
            ),
            mutated["batch_stats"],
            post,
        )

    # --- eval mode: running statistics ---
    oracle.eval()
    with torch.no_grad():
        ref_eval = oracle(x_t, adj_t.clone(), nn_t).numpy()
    eval_vars = {"params": variables["params"]}
    if cfg.bn:
        eval_vars["batch_stats"] = mutated["batch_stats"]
    out_eval = model.apply(eval_vars, g, train=False)
    np.testing.assert_allclose(np.asarray(out_eval), ref_eval, atol=2e-4, rtol=1e-3)


def test_intermediate_activations(rng):
    """Per-stage embedding parity (BASELINE.md verification contract)."""
    cfg = compat_cfg()
    g = make_graph(rng, batch=2)
    adj_dense = np.asarray(ell_to_dense(g.replace(nbr_w=None)))
    oracle = build_oracle(cfg)
    variables = transplant(oracle.state_dict(), cfg)
    oracle.train()
    collect: dict = {}
    with torch.no_grad():
        oracle(
            torch.from_numpy(np.asarray(g.x)),
            torch.from_numpy(adj_dense),
            np.asarray(g.n_nodes),
            collect=collect,
        )

    # capture jax intermediates
    model = CGCNet(cfg)
    _, inter = model.apply(
        variables,
        g,
        train=True,
        mutable=["batch_stats", "intermediates"],
        capture_intermediates=lambda mdl, _: mdl.name in ("jk1", "jk2", "jk3"),
    )
    inters = inter["intermediates"]
    for stage, key in ((1, "embed1"), (2, "embed2"), (3, "embed3")):
        got = np.asarray(inters[f"jk{stage}"]["__call__"][0])
        np.testing.assert_allclose(
            got, collect[key].numpy(), atol=2e-4, rtol=1e-3,
            err_msg=f"stage {stage} embedding mismatch",
        )
