"""Multi-chip dry run: compile + execute the full training step over an
n-device mesh on tiny shapes (driver contract — see __graft_entry__.py).

Exercises both parallelism modes the framework ships:
  1. data-parallel CGCNet training step: batch sharded over 'data',
     parameters replicated, gradient all-reduce inserted by XLA;
  2. graph-parallel mega-graph aggregation (the SP analog): nodes sharded
     over 'graph', halo exchange via all_to_all, forward + backward.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from cgcnet_tpu.config import Config
from cgcnet_tpu.parallel.mega_graph import (
    partition_graph,
    sharded_gather_sum,
)
from cgcnet_tpu.parallel.mesh import make_mesh
from cgcnet_tpu.train.loop import make_train_step
from cgcnet_tpu.train.optim import make_optimizer
from cgcnet_tpu.train.state import create_train_state


def _mesh_shape(n: int) -> tuple[int, int]:
    for g in (4, 2, 1):
        if n % g == 0 and n // g >= 1:
            return n // g, g
    return n, 1


def run_dryrun(n_devices: int) -> None:
    devices = jax.devices()[:n_devices]
    n_data, n_graph = _mesh_shape(n_devices)
    mesh = make_mesh(n_data, n_graph, devices=devices)

    # ---- 1. data-parallel full training step --------------------------------
    from __graft_entry__ import _example_graph

    cap, batch = 256, n_data * n_graph  # one graph per device
    cfg = Config()
    cfg = cfg.apply_overrides(
        [
            f"model.max_num_nodes={2 * cap}",
            "model.hidden_dim=8",
            "model.embedding_dim=8",
            "model.assign_hidden_dim=8",
            "model.use_pallas=false",
        ]
    )
    graph = _example_graph(batch=batch, cap=cap)
    # shard batch over BOTH mesh axes (pure DP view of the (data, graph) mesh)
    batch_spec = NamedSharding(mesh, P(("data", "graph")))
    graph = jax.tree.map(lambda a: jax.device_put(a, batch_spec), graph)

    tx = make_optimizer(cfg.train, steps_per_epoch=1)
    model, state = create_train_state(cfg, tx, graph)
    repl = NamedSharding(mesh, P())
    state = jax.tree.map(lambda a: jax.device_put(a, repl), state)

    step_fn = make_train_step(model)
    train_step = jax.jit(lambda s, g: step_fn(s, g, tx), donate_argnums=(0,))
    state, metrics = train_step(state, graph)
    loss = float(metrics["loss"])
    assert np.isfinite(loss), f"dp train step produced {loss}"

    # ---- 2. graph-parallel mega-graph aggregation with halo exchange --------
    if n_graph > 1:
        gmesh = make_mesh(1, n_graph, devices=devices[:n_graph])
        rng = np.random.default_rng(0)
        ns, k, f = 64, 4, 8
        n = ns * n_graph
        from cgcnet_tpu.ops.knn import radius_knn_np

        pos = np.sort(rng.uniform(0, 100 * n_graph, (n, 1)), axis=0)
        pos2 = np.concatenate([pos, rng.uniform(0, 50, (n, 1))], 1).astype(
            np.float32
        )
        nbr, mask = radius_knn_np(pos2, 60.0, k)
        part = partition_graph(nbr, mask, n_graph)
        x = rng.normal(size=(n, f)).astype(np.float32)

        gspec = NamedSharding(gmesh, P("graph"))
        put = lambda a: jax.device_put(jnp.asarray(a), gspec)
        xd = put(x)
        args = (
            put(part.nbr_remap.reshape(n, k)),
            put(part.nbr_mask.reshape(n, k)),
            put(part.nbr_mask.reshape(n, k)),
            put(part.req_idx.reshape(-1, part.halo_capacity)),
            put(part.req_mask.reshape(-1, part.halo_capacity)),
        )

        @jax.jit
        def fwd_bwd(x_):
            def loss(xx):
                out = sharded_gather_sum(xx, *args, mesh=gmesh)
                return jnp.sum(out**2)

            return jax.value_and_grad(loss)(x_)

        val, grad = fwd_bwd(xd)
        assert np.isfinite(float(val))
        assert np.isfinite(np.asarray(jax.device_get(grad)).sum())
