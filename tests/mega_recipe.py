"""Deterministic tiny whole-slide train-step recipe, shared by the
cross-process multihost test (tests/mh_worker.py ``mega`` scenario) and its
single-process virtual-mesh oracle (tests/test_multihost.py).

Both callers build the SAME case (pure function of fixed seeds) and run ONE
graph-sharded MegaCGCNet train step — halo all_to_all + psum BN + psum
DiffPool + interpret-mode BSR kernel + adam — differing only in how host
arrays become device arrays (``put_sharded``/``put_replicated`` hooks). In
the 2-process run the graph axis spans the process boundary, so the halo
all_to_all rides the cross-process (Gloo) channel — the CPU stand-in for the
DCN hop a real multi-host slide deployment would take (SURVEY.md §2.4).
"""

from __future__ import annotations

import numpy as np

N_SHARDS = 4
NS = 128  # rows per shard = the BSR tile size
K = 6


def build_mega_case():
    """Returns (mcfg, x, part, tables, n) — identical on every caller."""
    from cgcnet_tpu.config import ModelConfig
    from cgcnet_tpu.ops.knn import radius_knn_np
    from cgcnet_tpu.parallel.mega_graph import (
        build_bsr_tables,
        partition_graph,
    )

    rng = np.random.default_rng(0)
    n = NS * N_SHARDS
    xs = np.sort(rng.uniform(0, n * 3.0, n))
    pos = np.stack([xs, rng.uniform(0, 80, n)], -1).astype(np.float32)
    nbr, mask = radius_knn_np(pos, 100.0, K)
    part = partition_graph(nbr, mask, N_SHARDS)
    tables = build_bsr_tables(part)
    assert tables is not None, "BSR tables must build for the mega case"
    x = rng.normal(size=(n, 18)).astype(np.float32)
    mcfg = ModelConfig(
        input_dim=18, max_num_nodes=2 * n, assign_ratio=0.05,
        hidden_dim=8, embedding_dim=8, assign_hidden_dim=8,
        drop_out=0.2, norm_adj=True, jk=True, use_pallas="always",
        # the fused assign tail's data-independent all-reduces trip XLA:CPU's
        # Gloo collective-ordering corruption (see mh_worker.loader_scenario);
        # the halo all_to_all under test does not need the fold
        fold_assign_tail=False,
    )
    return mcfg, x, part, tables, n


def run_mega_step(mesh, put_sharded=None, put_replicated=None):
    """One slide train step on ``mesh``; returns (loss, param_l1_delta).

    put_sharded(host_array, sharding) / put_replicated(host_array) build the
    device arrays; defaults are plain single-process device_puts.
    """
    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cgcnet_tpu.core.graph import CellGraph
    from cgcnet_tpu.nn.model import CGCNet
    from cgcnet_tpu.ops.pallas import bsr_kernel
    from cgcnet_tpu.parallel.mega_model import prepare_mega_inputs
    from cgcnet_tpu.parallel.mega_train import make_slide_train_step

    mcfg, x, part, tables, n = build_mega_case()
    repl = NamedSharding(mesh, P())
    if put_sharded is None:
        put_sharded = lambda a, s: jax.device_put(jnp.asarray(a), s)
    if put_replicated is None:
        put_replicated = lambda a: jax.device_put(a, repl)

    inputs = prepare_mega_inputs(
        x, part, mesh, n_real=n, bsr=tables, put=put_sharded
    )

    # identical params on every caller: init is pure local compute from a
    # fixed key on the unsharded tiny graph
    g0 = CellGraph(
        x=jnp.asarray(x)[None],
        nbr=jnp.zeros((1, n, K), jnp.int32),
        nbr_mask=jnp.zeros((1, n, K)),
        n_nodes=jnp.asarray([n], jnp.int32),
    )
    variables = CGCNet(mcfg).init({"params": jax.random.key(0)}, g0, train=False)
    params0 = jax.device_get(variables["params"])
    params = jax.tree.map(put_replicated, params0)
    stats = jax.tree.map(put_replicated, jax.device_get(
        variables.get("batch_stats", {})
    ))

    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    step = jax.jit(make_slide_train_step(mcfg, tx, mesh))
    was_interp = bsr_kernel._INTERPRET
    bsr_kernel.set_interpret(jax.default_backend() != "tpu")
    try:
        new_params, _, _, loss = step(
            params, stats, opt_state, inputs, jnp.asarray(1),
            dropout_rng=jax.random.key(7),
        )
    finally:
        bsr_kernel.set_interpret(was_interp)
    delta = sum(
        float(np.abs(np.asarray(jax.device_get(a)) - b).sum())
        for a, b in zip(jax.tree.leaves(new_params), jax.tree.leaves(params0))
    )
    return float(jax.device_get(loss)), delta
