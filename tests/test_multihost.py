"""Multi-process (multi-host stand-in) training-step equivalence.

Spawns 2 coordinator-connected JAX processes (2 CPU devices each) running
one DP training step on a 4-graph batch sharded across all 4 global devices,
and checks both processes agree with the single-process result — the CPU
analog of the reference's missing multi-node story (SURVEY.md §2.4) and of
``jax.distributed.initialize`` multi-host bootstrap.
"""

import re
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import jax


# XLA:CPU's Gloo collectives are not safe under the concurrency-optimized
# scheduler: two data-independent all-reduces can be issued in different
# orders by different processes and corrupt the pairwise TCP channel
# ("op.preamble.length <= op.nbytes ... Received data size doesn't match").
# Both processes compile byte-identical HLO (verified by --xla_dump_to
# diffing), so this is a CPU-simulation runtime race, not a program bug —
# TPU executes collectives in program order. Serialize the CPU schedule,
# and retry the worker pair when the residual race still aborts a process
# (the flag narrows but does not close the window).
_XLA_CPU_FLAGS = "--xla_cpu_enable_concurrency_optimized_scheduler=false"


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_worker_pair(extra_args, pattern, attempts=3):
    """Run the 2-process worker, returning {rank: regex groups}. Retries on
    the documented Gloo channel-corruption abort; any other failure (or a
    result mismatch) raises immediately."""
    worker = Path(__file__).parent / "mh_worker.py"
    for attempt in range(attempts):
        port = _free_port()
        procs = [
            subprocess.Popen(
                [sys.executable, str(worker), str(i), "2", str(port)]
                + [str(a) for a in extra_args],
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
                     "HOME": "/root", "XLA_FLAGS": _XLA_CPU_FLAGS},
            )
            for i in range(2)
        ]
        try:
            outs = [p.communicate(timeout=300)[0].decode() for p in procs]
        except subprocess.TimeoutExpired:
            # host under load (another suite/TPU job hogging the 4 cores) or
            # a worker deadlocked on a half-corrupted Gloo channel — kill the
            # pair and retry on a fresh port
            for p in procs:
                p.kill()
            for p in procs:
                p.communicate()
            if attempt < attempts - 1:
                continue
            raise
        # Retry ANY nonzero exit before the final attempt: besides the
        # documented Gloo channel corruption, coordinator init under host
        # load shows transient connect/barrier failures. Deterministic
        # bugs fail all attempts and still surface on the strict last one.
        if any(p.returncode != 0 for p in procs) and attempt < attempts - 1:
            continue
        results = {}
        for p, text in zip(procs, outs):
            assert p.returncode == 0, text[-2000:]
            m = re.search(pattern, text)
            assert m, text[-2000:]
            results[int(m.group(1))] = m.groups()[1:]
        assert set(results) == {0, 1}
        return results
    raise AssertionError("unreachable")


@pytest.mark.slow
def test_two_process_dp_step_matches_single():
    raw = _run_worker_pair(
        [], r"RESULT (\d) loss=([-\d.]+) leafsum=([-\d.]+)"
    )
    results = {k: (float(v[0]), float(v[1])) for k, v in raw.items()}

    # both processes see identical global loss and updated params
    np.testing.assert_allclose(results[0][0], results[1][0], atol=1e-6)
    np.testing.assert_allclose(results[0][1], results[1][1], atol=1e-5)

    # single-process oracle on the same global batch
    sys.path.insert(0, str(Path(__file__).parent.parent))
    from __graft_entry__ import _example_graph
    from cgcnet_tpu.config import Config
    from cgcnet_tpu.train.loop import make_train_step
    from cgcnet_tpu.train.optim import make_optimizer
    from cgcnet_tpu.train.state import create_train_state

    cfg = Config().apply_overrides(
        ["model.max_num_nodes=128", "model.hidden_dim=8",
         "model.embedding_dim=8", "model.assign_hidden_dim=8",
         "model.drop_out=0.0", "model.use_pallas=never"]
    )
    graph = _example_graph(batch=4, cap=64, bsr_blocks=0)
    tx = make_optimizer(cfg.train, steps_per_epoch=1)
    model, state = create_train_state(cfg, tx, graph)
    step_fn = make_train_step(model)
    _, metrics = jax.jit(lambda s, g: step_fn(s, g, tx))(state, graph)
    np.testing.assert_allclose(
        results[0][0], float(metrics["loss"]), atol=1e-5
    )


@pytest.mark.slow
def test_two_process_graph_sharded_mega_step():
    """The graph axis spans the process boundary: a (1, 4) mesh over
    2 processes x 2 devices runs one MegaCGCNet slide train step, so the
    capacity-padded halo all_to_all — the one collective whose semantics
    could plausibly break at a process (DCN) boundary — crosses Gloo.
    Both ranks and the single-process 4-device oracle must agree on loss
    and on the parameter update (round-3 VERDICT Next #4)."""
    raw = _run_worker_pair(
        ["mega"], r"MEGA (\d) loss=([-\d.]+) delta=([-\d.]+)"
    )
    results = {k: (float(v[0]), float(v[1])) for k, v in raw.items()}
    np.testing.assert_allclose(results[0][0], results[1][0], atol=1e-6)
    np.testing.assert_allclose(results[0][1], results[1][1], rtol=1e-5)

    # single-process oracle: same case on a 4-device virtual mesh
    sys.path.insert(0, str(Path(__file__).parent))
    import mega_recipe
    from cgcnet_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(1, mega_recipe.N_SHARDS,
                     devices=jax.devices()[: mega_recipe.N_SHARDS])
    loss, delta = mega_recipe.run_mega_step(mesh)
    np.testing.assert_allclose(results[0][0], loss, atol=1e-5)
    np.testing.assert_allclose(results[0][1], delta, rtol=1e-4)


@pytest.mark.slow
def test_process_sharded_loader_and_checkpoint(tmp_path):
    """Each process loads only its slice of every global batch; the step
    agrees across processes and with a single-process loader over the same
    data; only process 0 writes the checkpoint."""
    from cgcnet_tpu.dataflow.synthetic import generate_dataset

    root = tmp_path / "mhdata"
    generate_dataset(
        str(root), patches_per_image=3, images_per_grade=1,
        n_nodes=(100, 200), seed=11,
    )
    raw = _run_worker_pair(
        [root], r"LOADER (\d) loss=([-\d.]+) wrote=(\d)"
    )
    results = {k: (float(v[0]), int(v[1])) for k, v in raw.items()}
    np.testing.assert_allclose(results[0][0], results[1][0], atol=1e-6)
    # only process 0 wrote the checkpoint file
    assert results[0][1] == 1 and results[1][1] == 0

    # single-process oracle: full loader over the same data, same batch
    sys.path.insert(0, str(Path(__file__).parent.parent))
    from cgcnet_tpu.config import Config
    from cgcnet_tpu.dataflow.dataset import NucleiGraphDataset
    from cgcnet_tpu.dataflow.loader import GraphLoader
    from cgcnet_tpu.train.loop import make_train_step
    from cgcnet_tpu.train.optim import make_optimizer
    from cgcnet_tpu.train.state import create_train_state

    cfg = Config().apply_overrides([
        f"data.root={root}", "data.max_num_nodes=256", "data.sample_ratio=1.0",
        "data.num_workers=1", "model.max_num_nodes=256",
        "model.hidden_dim=8", "model.embedding_dim=8",
        "model.assign_hidden_dim=8", "model.drop_out=0.0",
        "model.use_pallas=never",
    ])
    ds = NucleiGraphDataset(cfg.data, "train")
    loader = GraphLoader(ds, 4, shuffle=True, num_workers=1, seed=7,
                         drop_last=True)
    graph = next(iter(loader.epoch(0)))
    tx = make_optimizer(cfg.train, steps_per_epoch=1)
    model, state = create_train_state(cfg, tx, graph)
    step_fn = make_train_step(model)
    _, metrics = jax.jit(lambda s, g: step_fn(s, g, tx))(state, graph)
    np.testing.assert_allclose(
        results[0][0], float(metrics["loss"]), atol=1e-5
    )
