"""Train state pytree: params + BN stats + optimizer state + step/rng."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from cgcnet_tpu.config import Config
from cgcnet_tpu.core.graph import CellGraph
from cgcnet_tpu.nn.model import CGCNet


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array
    rng: jax.Array  # raw key data (uint32) — serializable; wrap on use


def create_train_state(
    cfg: Config,
    tx: optax.GradientTransformation,
    example: CellGraph,
    seed: int | None = None,
) -> tuple[CGCNet, TrainState]:
    model = CGCNet(cfg.model)
    seed = cfg.train.seed if seed is None else seed
    init_rng, run_rng = jax.random.split(jax.random.key(seed))
    variables = model.init({"params": init_rng}, example, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    state = TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
        rng=jax.random.key_data(run_rng),
    )
    return model, state
