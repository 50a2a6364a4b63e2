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
    p.add_argument(
        "--slides", type=int, default=1,
        help="grade a stream of N slides (--synthetic: distinct seeds), "
             "host build of slide i+1 pipelined behind the forward of "
             "slide i; sticky shape caps keep ONE compiled executable",
    )
    p.add_argument(
        "--train-epochs", type=int, default=0,
        help="fine-tune the checkpoint on this slide's label for N epochs "
             "(whole-slide training through the halo exchange) before "
             "grading; requires --ckpt for meaningful results",
    )
    p.add_argument("--out", help="write (fine-tuned) variables here")
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
    from cgcnet_tpu.nn.model import CGCNet
    from cgcnet_tpu.core.graph import CellGraph
    from cgcnet_tpu.parallel.mega_model import mega_forward
    from cgcnet_tpu.parallel.mesh import make_mesh
    from cgcnet_tpu.parallel.slide_setup import (
        build_slide_inputs,
        synthetic_slide,
    )

    cfg = Config().apply_overrides(args.overrides)
    shards = args.shards or len(jax.devices())
    mesh = make_mesh(1, shards)

    # ---- slide data ----
    if args.synthetic:
        feats, coords = synthetic_slide(args.nuclei)
        label = None
    else:
        if not args.proto:
            p.error("--proto or --synthetic required")
        with np.load(args.proto) as z:
            feats, coords, label = z["features"], z["coords"], int(z["label"])

    # ---- normalize / band-sort / pad / radius graph / partition (+BSR) ----
    build = build_slide_inputs(cfg, feats, coords, shards, mesh)
    n, inputs = build.n, build.inputs

    mcfg = cfg.model
    mcfg = mcfg.__class__(**{**mcfg.__dict__, "input_dim": build.input_dim,
                             "use_pallas": "never"})
    model = CGCNet(mcfg)
    example = CellGraph(
        x=jnp.zeros((1, 256, build.input_dim)),
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

    fwd = jax.jit(lambda v, i: mega_forward(v, mcfg, i, mesh, train=False,
                                            halo_overlap=cfg.mesh.halo_overlap,
                                            remat=cfg.mesh.remat,
                                            remat_stage1=cfg.mesh.remat_stage1))
    t0 = time.perf_counter()
    logits = np.asarray(jax.device_get(fwd(variables, inputs)))
    t_fwd_c = time.perf_counter() - t0
    t0 = time.perf_counter()
    logits = np.asarray(jax.device_get(fwd(variables, inputs)))
    t_fwd = time.perf_counter() - t0

    pred = int(np.argmax(logits))
    halo = int(build.part.req_mask.sum())
    print(
        f"slide: {n} nuclei, {shards} shards, halo rows {halo} "
        f"({100*halo/max(n,1):.2f}%)"
    )
    print(
        f"timing: graph {build.t_graph_s*1e3:.0f} ms, "
        f"partition {build.t_part_s*1e3:.0f} ms, "
        f"forward {t_fwd*1e3:.0f} ms (compile {t_fwd_c:.1f} s)"
    )
    print(f"logits {logits}  predicted grade {pred + 1}"
          + (f" (true {label + 1})" if label is not None else ""))

    if args.train_epochs > 0:
        # ---- slide-level fine-tuning (the capability the reference lacks:
        # it can only train on subsampled patches) ----
        from cgcnet_tpu.parallel.mega_train import train_slides

        lbl = label if label is not None else pred
        variables, losses = train_slides(
            mcfg, variables, [(inputs, lbl)], mesh,
            lr=cfg.train.lr, epochs=args.train_epochs,
            remat=cfg.mesh.remat, remat_stage1=cfg.mesh.remat_stage1,
        )
        print(
            f"fine-tune: {args.train_epochs} epochs on this slide, "
            f"loss {losses[0]:.4f} -> {losses[-1]:.4f}"
        )
        logits2 = np.asarray(jax.device_get(fwd(variables, inputs)))
        print(f"post-finetune logits {logits2} predicted grade "
              f"{int(np.argmax(logits2)) + 1}")
        if args.out:
            from flax import serialization

            with open(args.out, "wb") as fh:
                fh.write(serialization.to_bytes(jax.device_get({
                    "params": variables["params"],
                    "batch_stats": variables.get("batch_stats", {}),
                })))
            print(f"saved fine-tuned variables to {args.out}")

    if args.slides > 1:
        # ---- streaming mode: pipeline host build behind device forward ----
        if not args.synthetic:
            p.error("--slides N currently pairs with --synthetic")
        from concurrent.futures import ThreadPoolExecutor

        from cgcnet_tpu.parallel.slide_setup import SlideCaps

        def _w(a):  # table width (1 when the BSR path is off)
            return a.shape[-1] if a is not None else 1

        caps = SlideCaps().grown(
            build.part.halo_capacity,
            _w(inputs.nbr_t), _w(inputs.blk_cols), _w(inputs.blk_cols_t),
        )

        def build_one(i):
            nonlocal caps
            f, c = synthetic_slide(args.nuclei, seed=1000 + i)
            b = build_slide_inputs(cfg, f, c, shards, mesh, caps=caps)
            caps = b.caps or caps
            return b

        preds = []
        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=1) as ex:
            nxt = ex.submit(build_one, 0)
            for i in range(args.slides):
                b = nxt.result()
                if i + 1 < args.slides:
                    nxt = ex.submit(build_one, i + 1)
                preds.append(int(np.argmax(
                    np.asarray(jax.device_get(fwd(variables, b.inputs)))
                )))
        wall = time.perf_counter() - t0
        cache = fwd._cache_size() if hasattr(fwd, "_cache_size") else None
        print(
            f"stream: {args.slides} slides in {wall:.2f} s "
            f"({args.slides / wall:.1f} slides/s, pipelined host build), "
            f"compiled executables: {cache}, preds {preds}"
        )
        return {"logits": logits, "pred": pred, "stream_preds": preds,
                "slides_per_s": args.slides / wall,
                "compiled": cache}
    return {"logits": logits, "pred": pred}


if __name__ == "__main__":
    main()
