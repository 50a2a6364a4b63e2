"""Multi-chip dry run: compile + execute the full training step over an
n-device mesh on tiny shapes (driver contract — see __graft_entry__.py).

Exercises the FLAGSHIP parallelism paths the framework ships (the gate must
gate what cli/train.py and cli/slide.py actually run):
  1. data-parallel CGCNet training step: batch sharded over 'data',
     parameters replicated, gradient all-reduce inserted by XLA;
  2. graph-parallel MegaCGCNet slide TRAIN step (the SP analog): nodes
     sharded over 'graph', capacity-padded all_to_all halo exchange, psum
     BatchNorm, psum DiffPool contraction, head dropout, adam — fwd + bwd —
     with the Pallas BSR aggregation kernel running in interpret mode (the
     same kernel the TPU slide path compiles natively).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from cgcnet_tpu.config import Config
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

    # ---- 2. flagship graph-parallel path: MegaCGCNet slide train step -------
    # (halo all_to_all + psum BN + psum DiffPool + BSR kernel in interpret
    # mode + adam — what cli/slide.py compiles on TPU)
    if n_graph > 1:
        import optax

        from cgcnet_tpu.config import ModelConfig
        from cgcnet_tpu.core.graph import CellGraph
        from cgcnet_tpu.nn.model import CGCNet
        from cgcnet_tpu.ops.knn import radius_knn_np
        from cgcnet_tpu.ops.pallas import bsr_kernel
        from cgcnet_tpu.parallel.mega_graph import (
            build_bsr_tables,
            partition_graph,
        )
        from cgcnet_tpu.parallel.mega_model import prepare_mega_inputs
        from cgcnet_tpu.parallel.mega_train import make_slide_train_step

        gmesh = make_mesh(1, n_graph, devices=devices[:n_graph])
        rng = np.random.default_rng(0)
        ns, k = 128, 6  # 128 rows/shard: the BSR tile size — tables build
        n = ns * n_graph
        xs_coord = np.sort(rng.uniform(0, n * 3.0, n))
        pos = np.stack(
            [xs_coord, rng.uniform(0, 80, n)], -1
        ).astype(np.float32)
        nbr, mask = radius_knn_np(pos, 100.0, k)
        part = partition_graph(nbr, mask, n_graph)
        tables = build_bsr_tables(part)
        assert tables is not None, "BSR tables must build for the dryrun"
        x = rng.normal(size=(n, 18)).astype(np.float32)

        mcfg = ModelConfig(
            input_dim=18, max_num_nodes=2 * n, assign_ratio=0.05,
            hidden_dim=8, embedding_dim=8, assign_hidden_dim=8,
            drop_out=0.2, norm_adj=True, jk=True, use_pallas="always",
        )
        g0 = CellGraph(
            x=jnp.asarray(x)[None],
            nbr=jnp.asarray(nbr)[None],
            nbr_mask=jnp.asarray(mask)[None],
            n_nodes=jnp.asarray([n], jnp.int32),
        )
        variables = CGCNet(mcfg).init(
            {"params": jax.random.key(0)}, g0, train=False
        )
        inputs = prepare_mega_inputs(x, part, gmesh, n_real=n, bsr=tables)

        tx2 = optax.adam(1e-3)
        slide_step = jax.jit(make_slide_train_step(mcfg, tx2, gmesh))
        # capacity configuration: chunked-recompute assign tail with the
        # in-kernel conv3 lin + custom-VJP pool contraction + stage-1 remat
        # — the 1M-nuclei single-chip path (slide_scale_r4.json)
        mcfg_cap = ModelConfig(
            **{**mcfg.__dict__, "assign_tail_chunk": 128}
        )
        cap_step = jax.jit(make_slide_train_step(
            mcfg_cap, tx2, gmesh, remat_stage1=True,
        ))
        was_interp = bsr_kernel._INTERPRET
        bsr_kernel.set_interpret(jax.default_backend() != "tpu")
        try:
            for name, step_fn in (("slide", slide_step),
                                  ("slide-capacity", cap_step)):
                params, _stats, _opt_state, loss2 = step_fn(
                    variables["params"], variables.get("batch_stats", {}),
                    tx2.init(variables["params"]), inputs, jnp.asarray(1),
                    dropout_rng=jax.random.key(7),
                )
                assert np.isfinite(float(loss2)), (name, loss2)
                delta = sum(
                    float(jnp.abs(a - b).sum())
                    for a, b in zip(
                        jax.tree.leaves(params),
                        jax.tree.leaves(variables["params"]),
                    )
                )
                assert delta > 0, f"{name} step did not move parameters"
        finally:
            bsr_kernel.set_interpret(was_interp)
