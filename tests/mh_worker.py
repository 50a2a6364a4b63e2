"""Multi-process worker for tests/test_multihost.py (run as a subprocess).

Each process hosts 2 virtual CPU devices; the global (data,) mesh spans
processes, so the gradient psum of the DP train step rides the cross-process
(Gloo) collective path — the CPU stand-in for multi-host ICI/DCN
(SURVEY.md §4.4, mesh bootstrap cgcnet_tpu/parallel/mesh.py:multihost_init).
"""

import os
import sys


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.distributed.initialize(
        f"localhost:{port}", num_processes=nproc, process_id=pid
    )
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import _example_graph
    from cgcnet_tpu.config import Config
    from cgcnet_tpu.train.loop import make_train_step
    from cgcnet_tpu.train.optim import make_optimizer
    from cgcnet_tpu.train.state import create_train_state

    ndev = jax.device_count()
    mesh = jax.make_mesh(
        (ndev,), ("data",),
        axis_types=(jax.sharding.AxisType.Auto,),
    )
    cfg = Config().apply_overrides(
        ["model.max_num_nodes=128", "model.hidden_dim=8",
         "model.embedding_dim=8", "model.assign_hidden_dim=8",
         "model.drop_out=0.0", "model.use_pallas=never"]
    )
    graph = _example_graph(batch=ndev, cap=64, bsr_blocks=0)
    # each process contributes its local slice of the global batch
    bspec = NamedSharding(mesh, P("data"))
    per = ndev // nproc

    def to_global(a):
        a = np.asarray(a)
        return jax.make_array_from_process_local_data(
            bspec if a.ndim > 0 else NamedSharding(mesh, P()),
            a[pid * per : (pid + 1) * per],
        )

    graph_g = jax.tree.map(to_global, graph)
    tx = make_optimizer(cfg.train, steps_per_epoch=1)
    model, state = create_train_state(cfg, tx, graph)
    rspec = NamedSharding(mesh, P())
    state = jax.tree.map(lambda a: jax.device_put(a, rspec), state)
    step_fn = make_train_step(model)
    step = jax.jit(lambda s, g: step_fn(s, g, tx))
    new_state, metrics = step(state, graph_g)
    loss = float(jax.device_get(metrics["loss"]))
    # parameter psum consistency: norm of one updated kernel
    leaf = jax.tree.leaves(jax.device_get(new_state.params))[0]
    print(f"RESULT {pid} loss={loss:.6f} leafsum={float(np.sum(leaf)):.6f}", flush=True)


def loader_scenario(pid: int, nproc: int, port: str, root: str) -> None:
    """Process-sharded data loading: each process builds only its slice of
    every global batch; one DP step on the assembled global batch must agree
    across processes, and the checkpoint is written by process 0 only."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.distributed.initialize(
        f"localhost:{port}", num_processes=nproc, process_id=pid
    )
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    import os, sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from cgcnet_tpu.config import Config
    from cgcnet_tpu.dataflow.dataset import NucleiGraphDataset
    from cgcnet_tpu.dataflow.loader import GraphLoader
    from cgcnet_tpu.train.checkpoint import save_checkpoint
    from cgcnet_tpu.train.loop import make_train_step
    from cgcnet_tpu.train.optim import make_optimizer
    from cgcnet_tpu.train.state import create_train_state

    cfg = Config().apply_overrides([
        f"data.root={root}", "data.max_num_nodes=256", "data.sample_ratio=1.0",
        "data.num_workers=1", "model.max_num_nodes=256",
        "model.hidden_dim=8", "model.embedding_dim=8",
        "model.assign_hidden_dim=8", "model.drop_out=0.0",
        "model.use_pallas=never",
        # the folded assign tail's data-independent BN-stat all-reduces
        # reliably trip XLA:CPU's Gloo channel corruption here (identical
        # HLO across ranks; runtime-only collective-ordering hazard that
        # cannot occur on XLA:TPU's in-order collective execution) — this
        # test exercises process-sharded loading + single-writer
        # checkpoints, not the assign-head fold, so pin the unfolded graph
        "model.fold_assign_tail=false",
    ])
    mesh = jax.make_mesh(
        (jax.device_count(),), ("data",),
        axis_types=(jax.sharding.AxisType.Auto,),
    )
    bspec = NamedSharding(mesh, P("data"))
    ds = NucleiGraphDataset(cfg.data, "train")
    loader = GraphLoader(
        ds, 4, shuffle=True, num_workers=1, seed=7, drop_last=True,
        sharding=bspec, process_shard=True,
    )
    graph = next(iter(loader.epoch(0)))
    tx = make_optimizer(cfg.train, steps_per_epoch=1)
    model, state = create_train_state(cfg, tx, graph)
    rspec = NamedSharding(mesh, P())
    state = jax.tree.map(lambda a: jax.device_put(a, rspec), state)
    step_fn = make_train_step(model)
    new_state, metrics = jax.jit(lambda s, g: step_fn(s, g, tx))(state, graph)
    loss = float(jax.device_get(metrics["loss"]))
    # per-PROCESS dir: save_checkpoint's rank gate means only process 0's
    # dir gains a file. A shared dir raced here — process 1 polled
    # os.path.exists AFTER process 0 had already written and reported
    # wrote=1 (flake under host load).
    path = save_checkpoint(
        os.path.join(root, f"mh_ckpt_p{pid}"),
        jax.device_get(new_state.params), epoch=0,
    )
    wrote = os.path.exists(path)
    print(f"LOADER {pid} loss={loss:.6f} wrote={int(wrote)}", flush=True)


def mega_scenario(pid: int, nproc: int, port: str) -> None:
    """Graph-axis sharding ACROSS processes: one MegaCGCNet slide train step
    on a (1, 4) mesh whose 'graph' axis spans both processes — the halo
    all_to_all (and the psum BN/DiffPool reductions) ride the cross-process
    Gloo channel, the CPU stand-in for a real multi-host DCN hop. Loss and
    the parameter update must match the single-process virtual-mesh oracle
    (tests/test_multihost.py::test_two_process_graph_sharded_mega_step)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.distributed.initialize(
        f"localhost:{port}", num_processes=nproc, process_id=pid
    )
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import mega_recipe
    from cgcnet_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(1, mega_recipe.N_SHARDS, devices=jax.devices())
    shards_per_proc = mega_recipe.N_SHARDS // nproc

    def put_sharded(a, spec):
        # each process contributes only its addressable shards' rows
        a = np.asarray(a)
        rows_per_shard = a.shape[0] // mega_recipe.N_SHARDS
        lo = pid * shards_per_proc * rows_per_shard
        hi = (pid + 1) * shards_per_proc * rows_per_shard
        return jax.make_array_from_process_local_data(spec, a[lo:hi])

    def put_replicated(a):
        return jax.device_put(a, NamedSharding(mesh, P()))

    loss, delta = mega_recipe.run_mega_step(mesh, put_sharded, put_replicated)
    print(f"MEGA {pid} loss={loss:.6f} delta={delta:.6f}", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 4 and sys.argv[4] == "mega":
        mega_scenario(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3])
    elif len(sys.argv) > 4:
        loader_scenario(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3],
                        sys.argv[4])
    else:
        main()
