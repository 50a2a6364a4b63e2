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


def make_slide_train_step(
    cfg: ModelConfig,
    tx: optax.GradientTransformation,
    mesh,
    halo_overlap: bool = False,
    remat: bool = False,
    remat_stage1: bool = False,
):
    """Returns step(params, batch_stats, opt_state, inputs, label) ->
    (params, batch_stats, opt_state, loss). BN uses cross-shard batch
    statistics in-train (mega_model._bn psum path) AND tracks running stats
    with torch momentum 0.1, so slide-finetuned checkpoints evaluate with
    their own statistics."""

    def step(params, batch_stats, opt_state, inputs: MegaInputs, label,
             dropout_rng=None):
        def loss_fn(p):
            logits, new_stats = mega_forward(
                {"params": p, "batch_stats": batch_stats},
                cfg, inputs, mesh, train=True,
                halo_overlap=halo_overlap, remat=remat,
                remat_stage1=remat_stage1, return_stats=True,
                dropout_rng=dropout_rng,
            )
            logp = jax.nn.log_softmax(logits)
            return -logp[label], new_stats

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda a, u: a + u, params, updates)
        # merge: blocks without BN updates keep their old stats
        merged = dict(batch_stats)
        merged.update(new_stats)
        return params, merged, opt_state, loss

    return step


def train_slides(
    cfg: ModelConfig,
    variables: dict,
    slides: list[tuple[MegaInputs, int]],
    mesh,
    *,
    lr: float = 1e-3,
    epochs: int = 1,
    seed: int = 0,
    remat: bool = False,
    remat_stage1: bool = False,
) -> tuple[dict, list[float]]:
    """Minimal slide-level fine-tuning loop. Returns (variables, losses).
    Head dropout (cfg.drop_out, matching patch training) is driven by a
    per-step fold of ``seed``."""
    # flat update vector instead of ~100 per-leaf adam fusions — values
    # bit-identical (tests/test_train.py::test_flatten_opt_bit_identical),
    # and the per-leaf launches are pure latency-class tail at slide scale
    tx = optax.flatten(optax.adam(lr))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = tx.init(params)
    step = jax.jit(make_slide_train_step(
        cfg, tx, mesh, remat=remat, remat_stage1=remat_stage1))
    losses = []
    base = jax.random.key(seed)
    for epoch in range(epochs):
        for si, (inputs, label) in enumerate(slides):
            params, batch_stats, opt_state, loss = step(
                params, batch_stats, opt_state, inputs, jnp.asarray(label),
                jax.random.fold_in(base, epoch * len(slides) + si),
            )
            losses.append(float(loss))
    return {**variables, "params": params, "batch_stats": batch_stats}, losses
