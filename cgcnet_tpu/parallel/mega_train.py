"""Slide-level training: optimize CGCNet parameters on whole-slide graphs.

The reference can only train on subsampled patches; this trains the same
parameter tree directly on unsampled slides through MegaCGCNet — gradients
flow through the halo exchange and psum contractions (tested in
tests/test_mega_model.py), and parameter gradients are identical on every
shard (all cross-shard reductions happen inside the forward), so a plain
optax update keeps parameters replicated.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from cgcnet_tpu.config import ModelConfig
from cgcnet_tpu.parallel.mega_model import MegaInputs, mega_forward


def make_slide_train_step(cfg: ModelConfig, tx: optax.GradientTransformation, mesh):
    """Returns step(params, batch_stats, opt_state, inputs, label) ->
    (params, opt_state, loss). BN uses cross-shard batch statistics in-train
    (mega_model._bn psum path); running stats are not tracked on the slide
    path — evaluate with the patch-trained batch_stats or re-estimate."""

    def step(params, batch_stats, opt_state, inputs: MegaInputs, label):
        def loss_fn(p):
            logits = mega_forward(
                {"params": p, "batch_stats": batch_stats},
                cfg, inputs, mesh, train=True,
            )
            logp = jax.nn.log_softmax(logits)
            return -logp[label]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda a, u: a + u, params, updates)
        return params, opt_state, loss

    return step


def train_slides(
    cfg: ModelConfig,
    variables: dict,
    slides: list[tuple[MegaInputs, int]],
    mesh,
    *,
    lr: float = 1e-3,
    epochs: int = 1,
) -> tuple[dict, list[float]]:
    """Minimal slide-level fine-tuning loop. Returns (variables, losses)."""
    tx = optax.adam(lr)
    params = variables["params"]
    opt_state = tx.init(params)
    step = jax.jit(make_slide_train_step(cfg, tx, mesh))
    losses = []
    for _ in range(epochs):
        for inputs, label in slides:
            params, opt_state, loss = step(
                params, variables.get("batch_stats", {}), opt_state,
                inputs, jnp.asarray(label),
            )
            losses.append(float(loss))
    return {**variables, "params": params}, losses
