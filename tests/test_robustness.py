"""Edge-case robustness: empty graphs, worker-count invariance, tiny graphs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cgcnet_tpu.config import DataConfig, ModelConfig
from cgcnet_tpu.core.graph import CellGraph
from cgcnet_tpu.nn.model import CGCNet, cross_entropy_loss


def test_empty_graph_finite(rng):
    """A zero-node graph in the batch must not produce NaNs anywhere."""
    cap, k, f = 32, 6, 18
    g = CellGraph(
        x=jnp.zeros((2, cap, f)),
        nbr=jnp.tile(jnp.arange(cap, dtype=jnp.int32)[None, :, None], (2, 1, k)),
        nbr_mask=jnp.zeros((2, cap, k)),
        n_nodes=jnp.asarray([0, 0], jnp.int32),
        y=jnp.asarray([0, 1], jnp.int32),
    )
    cfg = ModelConfig(max_num_nodes=64, assign_ratio=0.2, use_pallas=False,
                      drop_out=0.0)
    model = CGCNet(cfg)
    v = model.init(jax.random.key(0), g, train=False)
    out = np.asarray(model.apply(v, g, train=False))
    assert np.isfinite(out).all()

    def loss(params):
        logits, _ = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            g, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(1)},
        )
        return cross_entropy_loss(logits, g.y)

    grads = jax.grad(loss)(v["params"])
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(grads))


def test_single_node_graph(rng):
    cap, k = 32, 6
    x = np.zeros((1, cap, 18), np.float32)
    x[0, 0] = rng.normal(size=18)
    g = CellGraph(
        x=jnp.asarray(x),
        nbr=jnp.tile(jnp.arange(cap, dtype=jnp.int32)[None, :, None], (1, 1, k)),
        nbr_mask=jnp.zeros((1, cap, k)).at[0, 0, 0].set(1.0),  # self edge only
        n_nodes=jnp.asarray([1], jnp.int32),
        y=jnp.asarray([2], jnp.int32),
    )
    cfg = ModelConfig(max_num_nodes=64, assign_ratio=0.2, use_pallas=False,
                      drop_out=0.0)
    model = CGCNet(cfg)
    v = model.init(jax.random.key(0), g, train=False)
    assert np.isfinite(np.asarray(model.apply(v, g, train=False))).all()


@pytest.mark.slow
def test_loader_worker_count_invariance(tmp_path):
    """Batches are identical regardless of worker parallelism."""
    from cgcnet_tpu.dataflow.dataset import NucleiGraphDataset
    from cgcnet_tpu.dataflow.loader import GraphLoader
    from cgcnet_tpu.dataflow.synthetic import generate_dataset

    generate_dataset(str(tmp_path), patches_per_image=2, images_per_grade=1,
                     n_nodes=(80, 150), seed=0)
    cfg = DataConfig(root=str(tmp_path), max_num_nodes=256, sample_ratio=0.5,
                     min_nodes_no_subsample=10, seed=3)
    ds = NucleiGraphDataset(cfg, "train")
    batches = {}
    for workers in (1, 4):
        loader = GraphLoader(ds, 3, shuffle=True, num_workers=workers, seed=9)
        batches[workers] = list(loader.epoch(2))
    for a, b in zip(batches[1], batches[4]):
        np.testing.assert_array_equal(np.asarray(a.x), np.asarray(b.x))
        np.testing.assert_array_equal(np.asarray(a.nbr), np.asarray(b.nbr))
        np.testing.assert_array_equal(
            np.asarray(a.patch_idx), np.asarray(b.patch_idx)
        )
