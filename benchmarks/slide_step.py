"""Whole-slide TRAIN-step benchmark (mega path).

BASELINE.md records a 54 ms steady-state *forward* for a 100k-nuclei slide
on one chip; this measures the full slide-level training step (forward +
backward through the halo exchange + adam update, mega_train.py) the same
way: device-side lax.fori_loop chaining, best-of-3, so the axon tunnel's
~4 ms per-call dispatch is excluded (CLAUDE.md environment gotchas).

Usage:
    python benchmarks/slide_step.py                 # real chip, 100k nuclei
    python benchmarks/slide_step.py --cpu --nuclei 20000 --shards 8
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--nuclei", type=int, default=100_000)
    p.add_argument("--shards", type=int, default=0, help="0 = all devices")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--cpu", action="store_true", help="force 8-dev CPU mesh")
    p.add_argument("overrides", nargs="*")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
    else:
        import bench

        bench.wait_for_backend()
        bench.enable_compile_cache()

    import jax.numpy as jnp
    import optax

    from cgcnet_tpu.config import Config
    from cgcnet_tpu.nn.model import CGCNet
    from cgcnet_tpu.core.graph import CellGraph
    from cgcnet_tpu.parallel.mega_train import make_slide_train_step
    from cgcnet_tpu.parallel.mesh import make_mesh
    from cgcnet_tpu.parallel.slide_setup import (
        build_slide_inputs,
        synthetic_slide,
    )

    cfg = Config().apply_overrides(args.overrides)
    shards = args.shards or len(jax.devices())
    mesh = make_mesh(1, shards)

    # ---- synthetic slide through the production pipeline ----
    feats, coords = synthetic_slide(args.nuclei)
    build = build_slide_inputs(cfg, feats, coords, shards, mesh)
    n, edges, inputs = build.n, build.edges, build.inputs

    mcfg = cfg.model.__class__(**{
        **cfg.model.__dict__,
        "input_dim": build.input_dim,
        "use_pallas": "never",  # mega path takes BSR via the input tables
        "compute_dtype": args.dtype,  # mega_forward runs at this dtype
    })
    model = CGCNet(mcfg)
    example = CellGraph(
        x=jnp.zeros((1, 256, build.input_dim)),
        nbr=jnp.zeros((1, 256, cfg.data.max_neighbours), jnp.int32),
        nbr_mask=jnp.zeros((1, 256, cfg.data.max_neighbours)),
        n_nodes=jnp.asarray([256], jnp.int32),
    )
    variables = model.init({"params": jax.random.key(0)}, example, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    tx = optax.flatten(optax.adam(1e-3))  # production slide config
    opt_state = tx.init(params)
    step = make_slide_train_step(
        mcfg, tx, mesh, halo_overlap=cfg.mesh.halo_overlap,
        remat=cfg.mesh.remat, remat_stage1=cfg.mesh.remat_stage1,
    )
    label = jnp.asarray(1)
    key = jax.random.key(0)
    iters = args.iters

    # inputs MUST be an argument, not a closure: closed-over device arrays
    # serialize as constants with the HLO, and the 1M-nuclei tables
    # (~300 MB) overflow the remote-compile relay's request limit (HTTP 413)
    @jax.jit
    def many(params, batch_stats, opt_state, inputs):
        def body(i, carry):
            p, s, o, _ = carry
            p, s, o, loss = step(p, s, o, inputs, label,
                                 jax.random.fold_in(key, i))
            return (p, s, o, loss)

        return jax.lax.fori_loop(
            0, iters, body, (params, batch_stats, opt_state, jnp.float32(0))
        )

    t0 = time.perf_counter()
    out = jax.block_until_ready(many(params, batch_stats, opt_state, inputs))
    t_compile = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(many(params, batch_stats, opt_state, inputs))
        best = min(best, time.perf_counter() - t0)
    t_step = best / iters

    # fiction guard (CLAUDE.md): parameters must actually move
    delta = float(
        jax.jit(lambda a, b: sum(
            jnp.sum(jnp.abs(x.astype(jnp.float32) - y.astype(jnp.float32)))
            for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
        ))(params, out[0])
    )
    print(json.dumps({
        "bench": "slide_train_step",
        "backend": jax.default_backend(),
        "nuclei": n,
        "edges": edges,
        "shards": shards,
        "dtype": args.dtype,
        "halo_overlap": bool(cfg.mesh.halo_overlap),
        "bsr_tables": build.bsr,
        "step_ms": round(t_step * 1e3, 2),
        "edges_per_s_fwd_bwd": round(edges / t_step, 1),
        "compile_s": round(t_compile, 1),
        "param_l1_delta": delta,
        "suspect": bool(t_step < 1e-4 or delta == 0.0),
    }))
    return t_step


if __name__ == "__main__":
    main()
