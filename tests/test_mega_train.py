"""Slide-level training reduces loss on a separable synthetic slide set."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cgcnet_tpu.config import ModelConfig
from cgcnet_tpu.core.graph import CellGraph
from cgcnet_tpu.nn.model import CGCNet
from cgcnet_tpu.parallel.mega_graph import partition_graph
from cgcnet_tpu.parallel.mega_model import prepare_mega_inputs
from cgcnet_tpu.parallel.mega_train import train_slides
from cgcnet_tpu.parallel.mesh import make_mesh

from tests.test_mega_model import build

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs virtual devices"
)


@pytest.mark.slow
def test_slide_training_reduces_loss(rng):
    d = 4
    mesh = make_mesh(1, d, devices=jax.devices()[:d])
    cfg = ModelConfig(
        input_dim=18, max_num_nodes=160, assign_ratio=0.2,
        hidden_dim=8, embedding_dim=8, assign_hidden_dim=8,
        drop_out=0.0, use_pallas="never",
    )
    slides = []
    for label in (0, 1, 2):
        x, nbr, mask = build(rng, 110, 128)
        x[:, :6] += 3.0 * label  # separable signal
        part = partition_graph(nbr, mask, d)
        slides.append((prepare_mega_inputs(x, part, mesh, n_real=110), label))

    g = CellGraph(
        x=jnp.zeros((1, 128, 18)),
        nbr=jnp.zeros((1, 128, 6), jnp.int32),
        nbr_mask=jnp.zeros((1, 128, 6)),
        n_nodes=jnp.asarray([128], jnp.int32),
    )
    variables = CGCNet(cfg).init({"params": jax.random.key(0)}, g, train=False)
    _, losses = train_slides(cfg, variables, slides, mesh, lr=1e-2, epochs=25)
    first = np.mean(losses[:3])
    last = np.mean(losses[-3:])
    assert np.isfinite(losses).all()
    assert last < first * 0.5, (first, last)
