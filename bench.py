"""Benchmark harness — prints ONE JSON line for the driver.

Primary metric (BASELINE.json north star): edges/s/chip for the stage-1
sparse aggregation (SpMM) forward+backward at the canonical CGC-Net workload
(padded N=5760 ≈ int(11404*0.5)+1 nodes, K=8 neighbours, F=20 features,
batch 4 — BASELINE.md workload constants).

``vs_baseline``: speedup over the reference's formulation of the same
contraction — a dense [B, N, N] batched adjacency matmul fwd+bwd (what
PyG-2019 DenseSAGEConv does on GPU, reference model/network.py:206) measured
on the same chip. The reference repo publishes no numbers of its own
(BASELINE.md), so the baseline is self-measured dense-vs-sparse on identical
hardware.

Extra context (full train-step throughput) goes to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def bench_fn(fn, args, iters=30, warmup=2):
    """Wall-clock per call (includes host dispatch — used for context only)."""
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def bench_device_loop(step, x0, iters=100, reps=3):
    """Device time per iteration: chain ``iters`` dependent applications of
    ``step`` inside ONE jitted call (lax.fori_loop), so host/tunnel dispatch
    latency is excluded. ``step`` must map x -> x-like. Best of ``reps``
    timed runs — the tunnel relay adds large run-to-run variance."""
    import jax

    @jax.jit
    def many(x):
        return jax.lax.fori_loop(0, iters, lambda i, xx: step(xx), x)

    jax.block_until_ready(many(x0))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(many(x0))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def enable_compile_cache() -> None:
    """Persistent compile cache — tunnel compiles are minutes each."""
    import os

    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def wait_for_backend(
    max_wait_s: float | None = None, probe_timeout_s: float = 420.0
) -> None:
    """Block until the TPU backend answers a tiny matmul, retrying.

    The axon tunnel flaps (backend init raises UNAVAILABLE or hangs for
    multi-hour stretches); a failed init is cached for the life of the
    process, so probe in a SUBPROCESS and only touch jax here once a probe
    succeeds. Window override: CGCNET_BENCH_WAIT_S."""
    import os
    import subprocess

    if max_wait_s is None:
        raw = os.environ.get("CGCNET_BENCH_WAIT_S", "1800")
        try:
            max_wait_s = float(raw)
        except ValueError:
            print(
                f"bench: ignoring malformed CGCNET_BENCH_WAIT_S={raw!r} "
                "(want seconds, e.g. 1800)", file=sys.stderr,
            )
            max_wait_s = 1800.0

    deadline = time.monotonic() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp;"
                 "print(float(jnp.sum(jnp.ones((8,8)) @ jnp.ones((8,8)))))"],
                timeout=probe_timeout_s, capture_output=True,
            )
            if r.returncode == 0:
                return
            err = r.stderr.decode(errors="replace")[-200:]
        except subprocess.TimeoutExpired:
            err = f"probe timed out after {probe_timeout_s:.0f}s"
        if time.monotonic() > deadline:
            # Do NOT fall through to the real run: when the tunnel is down,
            # backend init HANGS indefinitely rather than raising (observed
            # 2026-08-18), so a give-up must be terminal and loud.
            print(f"backend probe {attempt} failed; giving up: {err}",
                  file=sys.stderr)
            print("bench: TPU backend unreachable after "
                  f"{max_wait_s:.0f}s wait window — aborting without a "
                  "measurement (rerun via scripts/post_outage.sh)",
                  file=sys.stderr)
            sys.exit(1)
        print(f"backend probe {attempt} failed, retrying: {err}",
              file=sys.stderr)
        time.sleep(30)


def main() -> None:
    wait_for_backend()

    import jax
    import jax.numpy as jnp

    enable_compile_cache()


    B, N, K, F = 4, 5760, 8, 20
    rng = np.random.default_rng(0)
    # realistic spatially-banded radius-kNN graphs (BSR kernel's contract)
    import __graft_entry__ as ge

    graph = ge._example_graph(batch=B, cap=N, feat=F, kt=16)
    from cgcnet_tpu.config import ModelConfig
    from cgcnet_tpu.nn.model import make_stage1_adj

    # measured at the shipping training precision (bf16 storage, f32 MXU
    # accumulation) — the dense baseline below runs the same precision
    mcfg = ModelConfig(max_num_nodes=2 * N, use_pallas="auto")
    adj = make_stage1_adj(graph, mcfg, jnp.bfloat16)
    nbr, w = graph.nbr, graph.weights()
    x = jnp.asarray(rng.normal(size=(B, N, F)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    edges = int(np.asarray(graph.nbr_mask).sum())

    # --- ours: sparse aggregation fwd+bwd (factored adjacency; Pallas BSR
    # kernel on TPU, XLA gather elsewhere), device-looped ---
    # loss = ||A v||^2 so grad = 2 A^T (A v): BOTH directions depend on the
    # loop carry — nothing is loop-invariant-hoistable or dead-code-removable
    def sparse_step(xx):
        def loss(v):
            out = adj.matvec(v)
            return jnp.sum(out * out)

        val, grad = jax.value_and_grad(loss)(xx)
        return xx + 1e-12 * grad  # data dependency across iterations

    t_sparse = bench_device_loop(sparse_step, x, iters=100, reps=5)

    # --- baseline: dense [B,N,N] adjacency matmul fwd+bwd (reference style) ---
    # Honesty notes (measured, see CLAUDE.md):
    #  * a zeros-valued adjacency is constant-folded by XLA (dot(0,v) ->
    #    broadcast(0)), timing at ~0.7 ms for 265 MB of reads — fiction; the
    #    baseline must carry random values;
    #  * XLA hoists a one-time ~26 ms relayout of the 265 MB constant out of
    #    the device loop; at small iter counts that prologue dominates the
    #    per-iter quotient. iters=40 amortizes it, yielding the STEADY-STATE
    #    resident-adjacency cost (~1-1.6 ms/pair) — conservative in the
    #    baseline's favor: a real pipeline re-materializes the dense
    #    adjacency every batch (reference _re_norm_adj runs per forward,
    #    model/network.py:259-260) and would pay ~27 ms/step (the standalone
    #    single-call cost), while our sparse number already includes its own
    #    amortized per-step block build.
    adj = jnp.asarray(
        (rng.random((B, N, N), dtype=np.float32) < 8.0 / N).astype(np.float32)
    ).astype(jnp.bfloat16)

    def dense_step(xx):
        def loss(v):
            out = jnp.einsum("bij,bjf->bif", adj, v)
            return jnp.sum(out * out)

        val, grad = jax.value_and_grad(loss)(xx)
        return xx + 1e-12 * grad

    # reps=5: the dense leg is the most tunnel-variance-exposed field of the
    # output (CLAUDE.md: vs_baseline swung 1.8-15.5 across same-evening runs)
    t_dense = bench_device_loop(dense_step, x, iters=40, reps=5)

    edges_per_s = edges / t_sparse
    vs_baseline = t_dense / t_sparse

    # --- context: full model train step (f32 and bf16 compute) ---
    try:
        from cgcnet_tpu.config import Config
        from cgcnet_tpu.train.loop import make_train_step
        from cgcnet_tpu.train.optim import make_optimizer
        from cgcnet_tpu.train.state import create_train_state

        graph = ge._example_graph(batch=4, cap=N, kt=16)
        for dtype in ("float32", "bfloat16"):
            cfg = Config().apply_overrides(
                ["model.max_num_nodes=11404",
                 f"model.compute_dtype={dtype}"]
            )
            tx = make_optimizer(cfg.train, steps_per_epoch=100)
            model, state = create_train_state(cfg, tx, graph)
            step_fn = make_train_step(model)
            # 60 chained steps amortize the ~30-40 ms relay dispatch+sync
            # overhead per jitted call to <1 ms/step: at iters=20 the wall
            # quotient over-reported the 6.3-6.4 ms device step (xplane span,
            # benchmarks/profile_bf16_r3.txt) as 8.0-8.3 ms
            iters = 60

            @jax.jit
            def many_steps(s):
                return jax.lax.fori_loop(
                    0, iters, lambda i, ss: step_fn(ss, graph, tx)[0], s
                )

            out_state = jax.block_until_ready(many_steps(state))
            # fiction guard: a step whose params don't move (or a hoisted
            # loop) must not be reported as throughput. ONE jitted tree
            # reduction + ONE fetch — a per-leaf float() would pay ~100
            # sequential ~4 ms tunnel round trips
            delta = float(
                jax.jit(
                    lambda p, q: sum(
                        jnp.sum(jnp.abs(a.astype(jnp.float32)
                                        - b.astype(jnp.float32)))
                        for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(q))
                    )
                )(state.params, out_state.params)
            )
            t_step = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(many_steps(state))
                t_step = min(t_step, (time.perf_counter() - t0) / iters)
            suspect = t_step < 1e-3 or delta == 0.0
            print(
                f"train_step[{dtype}]: {t_step*1e3:.1f} ms/step  "
                f"({4/t_step:.1f} patches/s, B=4 N={N}, "
                f"param_l1_delta={delta:.3g})"
                + ("  [SUSPECT: tunnel timing artifact]" if suspect else ""),
                file=sys.stderr,
            )
    except Exception as e:  # pragma: no cover - context only
        print(f"train-step bench skipped: {e}", file=sys.stderr)

    print(
        f"sparse {t_sparse*1e6:.0f}us vs dense {t_dense*1e6:.0f}us "
        f"({edges} edges)",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "spmm_fwd_bwd_edges_per_s_per_chip",
                "value": round(edges_per_s, 1),
                "unit": "edges/s",
                "vs_baseline": round(vs_baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
