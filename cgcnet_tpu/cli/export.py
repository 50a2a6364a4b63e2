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


def _serving_graph(cfg, batch: int):
    """An all-padding CellGraph batch at the serving shapes: export only
    consumes shapes/dtypes. Transpose tables are omitted (eval needs no
    VJP); BSR metadata is omitted (the portable XLA path serves anywhere —
    --pallas re-adds it)."""
    import numpy as np
    import jax.numpy as jnp

    from cgcnet_tpu.core.graph import CellGraph
    from cgcnet_tpu.dataflow.dataset import round_up

    # same capacity rule as NucleiGraphDataset (dataflow/dataset.py:111)
    cap = round_up(cfg.data.padded_nodes, 128)
    k = cfg.data.max_neighbours
    f = cfg.data.num_features
    own = np.tile(np.arange(cap, dtype=np.int32)[None, :, None], (batch, 1, k))
    return CellGraph(
        x=jnp.zeros((batch, cap, f), jnp.float32),
        nbr=jnp.asarray(own),
        nbr_mask=jnp.zeros((batch, cap, k), jnp.float32),
        n_nodes=jnp.zeros((batch,), jnp.int32),
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
        "non-portable custom calls; requires BSR metadata at serve time)",
    )
    p.add_argument("overrides", nargs="*")
    args = p.parse_args(argv)

    from cgcnet_tpu.config import Config
    from cgcnet_tpu.nn.model import CGCNet
    from cgcnet_tpu.train.checkpoint import load_checkpoint
    from cgcnet_tpu.train.optim import make_optimizer
    from cgcnet_tpu.train.state import create_train_state
    from cgcnet_tpu.utils.export_model import export_forward, save_exported

    cfg = Config().apply_overrides(list(args.overrides))
    cfg = cfg.apply_overrides(
        [f"model.max_num_nodes={cfg.data.max_num_nodes}",
         f"model.input_dim={cfg.data.num_features}"]
    )
    if not args.pallas:
        # portable artifact: force the XLA aggregation path at trace time
        cfg = cfg.apply_overrides(["model.use_pallas=never"])

    example = _serving_graph(cfg, args.batch)
    tx = make_optimizer(cfg.train, steps_per_epoch=1)
    model, state = create_train_state(cfg, tx, example)
    state, meta = load_checkpoint(args.ckpt, state)
    print(
        f"loaded {args.ckpt} (epoch {meta.get('epoch', '?')})",
        file=sys.stderr,
    )

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    exported, header = export_forward(
        CGCNet(cfg.model), variables, example,
        platforms=args.platform,
        allow_custom_calls=args.pallas,
        symbolic_batch=args.symbolic_batch,
    )
    header["ckpt"] = str(args.ckpt)
    header["ckpt_epoch"] = meta.get("epoch")
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
