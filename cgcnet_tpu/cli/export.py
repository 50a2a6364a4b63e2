"""Export a trained checkpoint as a self-contained serving artifact.

Loads a checkpoint, traces the eval-mode forward at fixed serving shapes
(batch x capacity derived from the config, like the training loader's
padding), and writes a single-file StableHLO artifact via
``utils/export_model.py``. The artifact needs only jax at load time —
no flax, no cgcnet_tpu model code, no checkpoint.

Usage:
    python -m cgcnet_tpu.cli.export --ckpt runs/<id>/model_best.msgpack \
        -o model.cgexp [--batch 4] [--platform tpu] [--pallas] [overrides]

The reference's closest analog is its pickled state_dict checkpoint
(common/utils.py:82-94), which is not a deployment artifact at all.
"""

from __future__ import annotations

import argparse
import json
import sys


def _serving_graph(cfg, batch: int, pallas: bool = False, kt: int = 24):
    """An all-padding CellGraph batch at the serving shapes: export only
    consumes shapes/dtypes. The portable default omits transpose tables
    (eval needs no VJP) and BSR metadata; ``pallas`` includes both so the
    traced graph takes the Pallas block-sparse path and the artifact's
    signature accepts loader-built BSR metadata at serve time."""
    import numpy as np
    import jax.numpy as jnp

    from cgcnet_tpu.core.graph import CellGraph
    from cgcnet_tpu.dataflow.dataset import round_up

    # same capacity rule as NucleiGraphDataset (dataflow/dataset.py:111)
    cap = round_up(cfg.data.padded_nodes, 128)
    k = cfg.data.max_neighbours
    f = cfg.data.num_features
    own = np.tile(np.arange(cap, dtype=np.int32)[None, :, None], (batch, 1, k))
    extra = {}
    if pallas:
        r, m = cap // 128, max(cfg.data.bsr_blocks, 1)
        extra = {
            "nbr_t": jnp.asarray(np.tile(own[..., :1], (1, 1, kt))),
            "nbr_t_mask": jnp.zeros((batch, cap, kt), jnp.float32),
            "blk_cols": jnp.zeros((batch, r, m), jnp.int32),
            "blk_mask": jnp.zeros((batch, r, m), jnp.float32),
            "blk_cols_t": jnp.zeros((batch, r, m), jnp.int32),
            "blk_mask_t": jnp.zeros((batch, r, m), jnp.float32),
        }
    return CellGraph(
        x=jnp.zeros((batch, cap, f), jnp.float32),
        nbr=jnp.asarray(own),
        nbr_mask=jnp.zeros((batch, cap, k), jnp.float32),
        n_nodes=jnp.zeros((batch,), jnp.int32),
        **extra,
    )


def main(argv=None) -> dict:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", required=True, help="checkpoint (.msgpack)")
    p.add_argument("-o", "--out", required=True, help="artifact output path")
    p.add_argument("--batch", type=int, default=4, help="serving batch size")
    p.add_argument(
        "--platform", action="append", default=None,
        help="target platform(s) for cross-lowering (e.g. tpu); "
        "default: current backend",
    )
    p.add_argument(
        "--symbolic-batch", action="store_true",
        help="export with a symbolic batch dimension (one artifact, any "
        "batch size; node capacity stays static)",
    )
    p.add_argument(
        "--pallas", action="store_true",
        help="bake the Pallas TPU kernels into the artifact (TPU-only, "
        "non-portable custom calls; the signature then takes BSR metadata "
        "+ transpose tables at FIXED widths — build them with "
        "attach_bsr_meta(batch, data.bsr_blocks, quantize=False) and a "
        "dataset pinned to --kt, exactly like multi-host loading; export "
        "must run ON a TPU-backed host — Mosaic does not cross-lower from "
        "CPU)",
    )
    p.add_argument(
        "--kt", type=int, default=24,
        help="transpose-table width baked into a --pallas signature (must "
        "match the serving dataset's transpose_width)",
    )
    p.add_argument("overrides", nargs="*")
    args = p.parse_args(argv)

    from cgcnet_tpu.config import Config
    from cgcnet_tpu.nn.model import CGCNet
    from cgcnet_tpu.train.checkpoint import load_for_inference
    from cgcnet_tpu.train.optim import make_optimizer
    from cgcnet_tpu.train.state import create_train_state
    from cgcnet_tpu.utils.export_model import export_forward, save_exported

    cfg = Config().apply_overrides(list(args.overrides))
    cfg = cfg.apply_overrides(
        [f"model.max_num_nodes={cfg.data.max_num_nodes}",
         f"model.input_dim={cfg.data.num_features}"]
    )
    if args.pallas:
        import jax

        if jax.default_backend() != "tpu":
            p.error(
                "--pallas needs a TPU-backed host at export time: Mosaic "
                "kernels only lower on the TPU backend (jax raises 'Only "
                "interpret mode is supported on CPU backend' otherwise). "
                "Export the portable artifact from this host instead."
            )
        # trace through the Pallas block-sparse path unconditionally
        cfg = cfg.apply_overrides(["model.use_pallas=always"])
    else:
        # portable artifact: force the XLA aggregation path at trace time
        cfg = cfg.apply_overrides(["model.use_pallas=never"])

    example = _serving_graph(cfg, args.batch, pallas=args.pallas, kt=args.kt)
    tx = make_optimizer(cfg.train, steps_per_epoch=1)
    model, state = create_train_state(cfg, tx, example)
    # params/batch_stats must fully match (raises otherwise); only the
    # optimizer layout may differ (e.g. the other train.flatten_opt setting)
    state = load_for_inference(args.ckpt, state)
    print(f"loaded {args.ckpt}", file=sys.stderr)

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    exported, header = export_forward(
        CGCNet(cfg.model), variables, example,
        platforms=args.platform,
        allow_custom_calls=args.pallas,
        symbolic_batch=args.symbolic_batch,
    )
    header["ckpt"] = str(args.ckpt)
    if args.pallas:
        # the serve-side batch builder must reproduce these FIXED widths:
        # quantized caps (the loader default) would fail the shape check
        header["serve_contract"] = {
            "bsr_blocks": cfg.data.bsr_blocks,
            "transpose_width": args.kt,
            "metadata": "attach_bsr_meta(batch, bsr_blocks, quantize=False)",
        }
    path = save_exported(exported, header, args.out)
    size = path.stat().st_size
    result = {
        "out": str(path),
        "bytes": size,
        "platforms": header["platforms"],
        "fields": header["fields"],
    }
    print(f"wrote {size/1e6:.1f} MB -> {path}", file=sys.stderr)
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
