"""Aux-subsystem coverage: dataset analytics, profiling helpers, and the
bench harness' tunnel-probe give-up path."""

import numpy as np

from cgcnet_tpu.utils.analytics import dataset_feature_stats, max_nodes_in_dataset
from cgcnet_tpu.utils.profiling import StepTimer, trace_context


def test_analytics_over_synthetic_protos(tmp_path):
    from cgcnet_tpu.dataflow.synthetic import generate_dataset

    root = tmp_path / "d"
    generate_dataset(str(root), patches_per_image=2, images_per_grade=1,
                     n_nodes=(50, 90), seed=2)
    folds = ["fold_1", "fold_2", "fold_3"]
    counts, mx = max_nodes_in_dataset(str(root), folds)
    assert counts and mx == max(counts) and 50 <= mx <= 90

    mean, std = dataset_feature_stats(str(root), folds)
    assert mean.shape == std.shape and mean.ndim == 1
    assert np.isfinite(mean).all() and (std > 0).any()


def test_analytics_empty_tree(tmp_path):
    counts, mx = max_nodes_in_dataset(str(tmp_path), ["fold_1"])
    assert counts == [] and mx == 0


def test_step_timer_window_and_rates():
    t = StepTimer(window=3)
    t.start()
    for _ in range(5):
        t.update(edges=100)
    assert len(t._times) == 3          # rolling window holds
    assert t.mean_step_s >= 0.0
    assert t.edges_per_s > 0.0
    fresh = StepTimer()
    assert fresh.mean_step_s == 0.0 and fresh.edges_per_s == 0.0


def test_trace_context_noop_and_capture(tmp_path):
    with trace_context(None):          # disabled path: plain passthrough
        pass
    logdir = tmp_path / "trace"
    import jax.numpy as jnp

    with trace_context(str(logdir)):
        float(jnp.sum(jnp.ones((4, 4))))
    assert any(logdir.rglob("*"))      # a trace artifact was written


def test_profile_step_parser_on_cpu_trace(tmp_path):
    """The post-outage runbook's xplane parser must keep working: capture a
    real (CPU) trace and drive benchmarks/profile_step.summarize through the
    same glob -> ParseFromString -> aggregate path used on TPU traces."""
    import os
    import sys

    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: F401
    except Exception:
        import pytest

        pytest.skip("xplane protobuf unavailable")

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo/benchmarks")
    import profile_step

    @jax.jit
    def f(x):
        return jax.lax.fori_loop(0, 5, lambda i, a: a @ a / jnp.sum(a), x)

    x = jnp.ones((32, 32))
    jax.block_until_ready(f(x))
    logdir = str(tmp_path / "tr")
    with jax.profiler.trace(logdir):
        jax.block_until_ready(f(x))

    rows = profile_step.summarize(logdir, iters=5, top_n=10,
                                  plane_match="/host:CPU")
    assert rows, "parser returned no op rows from a real trace"
    assert all(
        isinstance(line, str) and isinstance(n, str) and ms >= 0
        for line, n, ms in rows
    )


def test_bench_wait_gives_up_quickly(monkeypatch):
    """wait_for_backend must exit(1) after the window — falling through to
    the real run would HANG (backend init blocks forever when the tunnel is
    down), and a silent return would let the driver wait on it."""
    import subprocess
    import sys
    import time

    import pytest

    sys.path.insert(0, "/root/repo")
    import bench

    calls = []

    def fake_run(*a, **k):
        calls.append(time.monotonic())
        raise subprocess.TimeoutExpired(cmd="probe", timeout=1)

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(time, "sleep", lambda s: None)
    t0 = time.monotonic()
    with pytest.raises(SystemExit) as ei:
        bench.wait_for_backend(max_wait_s=0.0, probe_timeout_s=1)
    assert ei.value.code == 1
    assert calls and time.monotonic() - t0 < 5.0


def test_halo_model_harness(tmp_path):
    """The analytical halo model must run over real partition tables and
    produce monotone comm growth + a sane overlap prediction."""
    import sys

    sys.path.insert(0, "/root/repo")
    from benchmarks.halo_model import main as halo_main

    out = tmp_path / "halo.json"
    art = halo_main([
        "--nuclei", "6000", "--shards", "2", "4", "--out", str(out),
    ])
    rows = art["rows"]
    assert [r["shards"] for r in rows] == [2, 4]
    assert rows[0]["t_comm_us"] <= rows[1]["t_comm_us"]
    for r in rows:
        # interior dominates under spatial bands; overlap never loses
        assert r["interior_frac"] > 0.5
        assert r["pred_overlap_speedup"] >= 1.0
    assert out.exists()
