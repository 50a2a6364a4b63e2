"""Whole-slide inference CLI (BASELINE.json configs 4-5).

Grades an *unsampled* whole-slide cell graph (100k+ nuclei) by running
patch-trained CGCNet parameters through the node-sharded MegaCGCNet
(cgcnet_tpu/parallel/mega_model.py) over the mesh's ``graph`` axis.

Usage:
    # synthetic demo slide on an 8-way virtual CPU mesh
    python -m cgcnet_tpu.cli.slide --synthetic --nuclei 100000 --shards 8 --cpu

    # real slide proto + trained checkpoint
    python -m cgcnet_tpu.cli.slide --proto data/proto/feature/colorectal/fold_1/...npz \
        --ckpt runs/<id>/model_best.msgpack --shards 4
"""

from __future__ import annotations

import argparse
import time


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--proto", help="patch/slide proto (.npz)")
    p.add_argument("--ckpt", help="trained checkpoint (.msgpack)")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--nuclei", type=int, default=100_000)
    p.add_argument("--shards", type=int, default=0, help="0 = all devices")
    p.add_argument("--cpu", action="store_true", help="force 8-dev CPU mesh")
    p.add_argument("overrides", nargs="*")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
    else:
        # persistent compile cache — TPU relay compiles are minutes each
        import os as _os

        _cache = _os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.dirname(_os.path.abspath(__file__)))), ".jax_cache")
        try:
            _os.makedirs(_cache, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", _cache)
        except Exception:
            pass
    import numpy as np
    import jax.numpy as jnp

    from cgcnet_tpu.config import Config
    from cgcnet_tpu.dataflow import native, stats as stats_mod
    from cgcnet_tpu.nn.model import CGCNet
    from cgcnet_tpu.core.graph import CellGraph
    from cgcnet_tpu.ops.knn import radius_knn_np
    from cgcnet_tpu.parallel.mega_graph import partition_graph
    from cgcnet_tpu.parallel.mega_model import mega_forward, prepare_mega_inputs
    from cgcnet_tpu.parallel.mesh import make_mesh

    cfg = Config().apply_overrides(args.overrides)
    shards = args.shards or len(jax.devices())
    mesh = make_mesh(1, shards)

    # ---- slide data ----
    if args.synthetic:
        rng = np.random.default_rng(0)
        n = args.nuclei
        side = 3584.0 * max(1.0, np.sqrt(n / 5000.0))
        coords = rng.uniform(0, side, (n, 2)).astype(np.float32)
        feats = (rng.normal(size=(n, 16)) * 10 + 40).astype(np.float32)
        label = None
    else:
        if not args.proto:
            p.error("--proto or --synthetic required")
        with np.load(args.proto) as z:
            feats, coords, label = z["features"], z["coords"], int(z["label"])
        n = len(coords)

    # ---- normalize + spatially sort + pad to shard multiple ----
    mean, std = stats_mod.reference_stats(cfg.data.cross_val, cfg.data.feature_type)
    band = np.floor(coords[:, 0] / cfg.data.max_edge_distance)
    order = np.lexsort((coords[:, 1], band))
    feats, coords = feats[order], coords[order]
    x = (np.concatenate([feats, coords], -1) - mean) / std

    cap = -(-n // (128 * shards)) * (128 * shards)
    xp = np.zeros((cap, x.shape[1]), np.float32)
    xp[:n] = x

    # ---- graph construction (native grid hash for 100k+ nuclei) ----
    t0 = time.perf_counter()
    if native.available():
        nbr, mask = native.radius_knn(
            coords, cfg.data.max_edge_distance, cfg.data.max_neighbours
        )
    else:
        nbr, mask = radius_knn_np(
            coords, cfg.data.max_edge_distance, cfg.data.max_neighbours
        )
    nbrp = np.tile(np.arange(cap, dtype=np.int32)[:, None], (1, nbr.shape[1]))
    maskp = np.zeros((cap, nbr.shape[1]), np.float32)
    nbrp[:n], maskp[:n] = nbr, mask
    t_graph = time.perf_counter() - t0

    # ---- partition + forward ----
    t0 = time.perf_counter()
    part = partition_graph(nbrp, maskp, shards)
    # BSR tables: gather-free Pallas aggregation on TPU backends (halo
    # columns as extra tiles); XLA gathers elsewhere
    tables = None
    if jax.default_backend() == "tpu":
        from cgcnet_tpu.parallel.mega_graph import build_bsr_tables

        tables = build_bsr_tables(part)
    t_part = time.perf_counter() - t0
    inputs = prepare_mega_inputs(xp, part, mesh, n_real=n, bsr=tables)

    mcfg = cfg.model
    mcfg = mcfg.__class__(**{**mcfg.__dict__, "input_dim": x.shape[1],
                             "use_pallas": "never"})
    model = CGCNet(mcfg)
    example = CellGraph(
        x=jnp.zeros((1, 256, x.shape[1])),
        nbr=jnp.zeros((1, 256, cfg.data.max_neighbours), jnp.int32),
        nbr_mask=jnp.zeros((1, 256, cfg.data.max_neighbours)),
        n_nodes=jnp.asarray([256], jnp.int32),
    )
    variables = model.init({"params": jax.random.key(0)}, example, train=False)
    if args.ckpt:
        from cgcnet_tpu.train.checkpoint import load_partial

        restored, copied, _ = load_partial(args.ckpt, {"params": variables["params"],
                                                       "batch_stats": variables.get("batch_stats", {})})
        variables = restored
        print(f"loaded {len(copied)} tensors from {args.ckpt}")

    fwd = jax.jit(lambda v: mega_forward(v, mcfg, inputs, mesh, train=False,
                                     halo_overlap=cfg.mesh.halo_overlap))
    t0 = time.perf_counter()
    logits = np.asarray(jax.device_get(fwd(variables)))
    t_fwd_c = time.perf_counter() - t0
    t0 = time.perf_counter()
    logits = np.asarray(jax.device_get(fwd(variables)))
    t_fwd = time.perf_counter() - t0

    pred = int(np.argmax(logits))
    halo = int(part.req_mask.sum())
    print(
        f"slide: {n} nuclei, {shards} shards, halo rows {halo} "
        f"({100*halo/max(n,1):.2f}%)"
    )
    print(
        f"timing: graph {t_graph*1e3:.0f} ms, partition {t_part*1e3:.0f} ms, "
        f"forward {t_fwd*1e3:.0f} ms (compile {t_fwd_c:.1f} s)"
    )
    print(f"logits {logits}  predicted grade {pred + 1}"
          + (f" (true {label + 1})" if label is not None else ""))
    return {"logits": logits, "pred": pred}


if __name__ == "__main__":
    main()
