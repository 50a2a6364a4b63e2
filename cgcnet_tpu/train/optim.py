"""Optimizers and LR schedule with torch-matching semantics.

The reference uses torch Adam/SGD/RMSprop with L2-into-gradient weight decay
(common/utils.py:119-127) and epoch-stepped StepLR decay (train.py:147).
optax building blocks are composed to match torch's update rules exactly
(decay added to the raw gradient *before* the moment updates — not AdamW).
"""

from __future__ import annotations

import optax

from cgcnet_tpu.config import TrainConfig


def step_lr_schedule(
    base_lr: float, step_size: int, gamma: float, steps_per_epoch: int
):
    """StepLR: lr = base * gamma^(epoch // step_size), epoch = step // spe."""

    def schedule(count):
        epoch = count // max(1, steps_per_epoch)
        return base_lr * (gamma ** (epoch // step_size)) if step_size > 0 else base_lr

    return schedule


def make_optimizer(
    cfg: TrainConfig, steps_per_epoch: int
) -> optax.GradientTransformation:
    sched = step_lr_schedule(cfg.lr, cfg.step_size, cfg.gamma, steps_per_epoch)
    parts = []
    if cfg.weight_decay > 0:
        # torch couples decay into the gradient before moment accumulation
        parts.append(optax.add_decayed_weights(cfg.weight_decay))
    if cfg.optim == "adam":
        parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    elif cfg.optim == "sgd":
        parts.append(optax.trace(decay=cfg.momentum, nesterov=False))
    elif cfg.optim == "rmsprop":
        # torch RMSprop: alpha=0.99, eps outside the sqrt, momentum buffer
        parts.append(optax.scale_by_rms(decay=0.99, eps=1e-8, eps_in_sqrt=False))
        parts.append(optax.trace(decay=cfg.momentum, nesterov=False))
    else:
        raise KeyError(f"Unsupported optim: {cfg.optim}")
    parts.append(optax.scale_by_schedule(lambda c: -sched(c)))
    tx = optax.chain(*parts)
    if getattr(cfg, "flatten_opt", False):
        # one flat update vector instead of ~100 tiny per-leaf fusions; all
        # transforms above are elementwise so values are bit-identical
        # (tests/test_train.py::test_flatten_opt_bit_identical)
        tx = optax.flatten(tx)
    return tx
