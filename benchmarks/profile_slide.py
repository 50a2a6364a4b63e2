"""Op-level device-time breakdown of the whole-slide TRAIN step.

Round-2 VERDICT weak #5: the 61 ms slide step (792k edges, fwd+bwd+adam,
benchmarks/slide_train_r2.json) had no profile. This captures the same
device-looped step benchmarks/slide_step.py times and prints the per-line
(per hardware queue) breakdown via benchmarks/profile_step.summarize.

Usage:  python benchmarks/profile_slide.py [nuclei] [top_n]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def capture(nuclei: int, iters: int = 10, trace_dir: str = "/tmp/prof_slide"):
    import bench

    bench.wait_for_backend()
    bench.enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import optax

    from cgcnet_tpu.config import Config
    from cgcnet_tpu.core.graph import CellGraph
    from cgcnet_tpu.nn.model import CGCNet
    from cgcnet_tpu.parallel.mega_train import make_slide_train_step
    from cgcnet_tpu.parallel.mesh import make_mesh
    from cgcnet_tpu.parallel.slide_setup import (
        build_slide_inputs,
        synthetic_slide,
    )

    cfg = Config()
    shards = len(jax.devices())
    mesh = make_mesh(1, shards)
    feats, coords = synthetic_slide(nuclei)
    build = build_slide_inputs(cfg, feats, coords, shards, mesh)
    inputs = build.inputs

    mcfg = cfg.model.__class__(**{
        **cfg.model.__dict__,
        "input_dim": build.input_dim,
        "use_pallas": "never",
        "compute_dtype": "bfloat16",
    })
    model = CGCNet(mcfg)
    example = CellGraph(
        x=jnp.zeros((1, 256, build.input_dim)),
        nbr=jnp.zeros((1, 256, cfg.data.max_neighbours), jnp.int32),
        nbr_mask=jnp.zeros((1, 256, cfg.data.max_neighbours)),
        n_nodes=jnp.asarray([256], jnp.int32),
    )
    variables = model.init({"params": jax.random.key(0)}, example,
                           train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = optax.flatten(optax.adam(1e-3))  # production slide config
    opt_state = tx.init(params)
    step = make_slide_train_step(
        mcfg, tx, mesh, halo_overlap=cfg.mesh.halo_overlap,
        remat=cfg.mesh.remat,
    )
    label = jnp.asarray(1)
    key = jax.random.key(0)

    # inputs as an argument, not a closure (closed-over tables serialize as
    # HLO constants and overflow the remote-compile relay at slide scale)
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

    jax.block_until_ready(many(params, batch_stats, opt_state, inputs))
    with jax.profiler.trace(trace_dir):
        jax.block_until_ready(many(params, batch_stats, opt_state, inputs))
    print(f"slide: {build.n} nuclei, {build.edges} edges, {shards} shard(s), "
          f"bsr={build.bsr}")
    return trace_dir, iters


def main():
    nuclei = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    trace_dir, iters = capture(nuclei)
    from benchmarks.profile_step import summarize

    summarize(trace_dir, iters, top_n)


if __name__ == "__main__":
    main()
