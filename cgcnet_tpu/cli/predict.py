"""Batch inference CLI — grade patches with a trained checkpoint.

The reference folds prediction into its val loop (train.py evaluate); this
standalone driver loads a checkpoint, runs every patch of a split (optionally
with test-time multi-sampling), and writes per-patch predictions plus the
image-level majority votes.

Usage:
    python -m cgcnet_tpu.cli.predict --ckpt runs/<id>/model_best.msgpack \
        [--split valid] [--out predictions.jsonl] data.root=/data [overrides]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np


def main(argv=None) -> dict:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", required=True, help="checkpoint (.msgpack)")
    p.add_argument("--split", default="valid", choices=["train", "valid"])
    p.add_argument("--out", default="", help="JSONL output path (optional)")
    p.add_argument(
        "--reps", type=int, default=0,
        help="test-time resampling repeats (0 = train.test_epoch default)",
    )
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (8 virtual devices)")
    p.add_argument("overrides", nargs="*")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        # in-process before first backend use (env vars are too late once
        # the axon plugin registered, and still dial the tunnel)
        try:
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_num_cpu_devices", 8)
        except RuntimeError:
            pass  # backend already initialized by the caller

    from cgcnet_tpu.config import Config
    from cgcnet_tpu.dataflow.dataset import NucleiGraphDataset
    from cgcnet_tpu.dataflow.loader import GraphLoader
    from cgcnet_tpu.nn.model import CGCNet
    from cgcnet_tpu.train.checkpoint import load_for_inference
    from cgcnet_tpu.train.metrics import ImageLevelMetric, image_stem
    from cgcnet_tpu.train.optim import make_optimizer
    from cgcnet_tpu.train.state import create_train_state

    cfg = Config().apply_overrides(
        list(args.overrides)
    )
    cfg = cfg.apply_overrides(
        [f"model.max_num_nodes={cfg.data.max_num_nodes}",
         f"model.input_dim={cfg.data.num_features}"]
    )
    ds = NucleiGraphDataset(
        cfg.data, args.split, full_graph=cfg.data.full_test_graph
    )
    loader = GraphLoader(
        ds, 1 if cfg.data.full_test_graph else cfg.data.batch_size,
        shuffle=False, num_workers=cfg.data.num_workers,
    )
    example = next(iter(loader.epoch(0)))
    tx = make_optimizer(cfg.train, steps_per_epoch=1)
    model, state = create_train_state(cfg, tx, example)
    # params/batch_stats must fully match (raises otherwise); only the
    # optimizer layout may differ (e.g. the other train.flatten_opt setting)
    state = load_for_inference(args.ckpt, state)
    print(f"loaded {args.ckpt}", file=sys.stderr)

    multi = cfg.data.sample_ratio < 1 and not cfg.data.full_test_graph
    reps = args.reps or (cfg.train.test_epoch if multi else 1)
    eval_step = jax.jit(
        lambda s, g: model.apply(
            {"params": s.params, "batch_stats": s.batch_stats}, g, train=False
        )
    )
    logit_sum: dict[int, np.ndarray] = {}
    labels: dict[int, int] = {}
    for rep in range(reps):
        for graph in loader.epoch(rep):
            logits = np.asarray(eval_step(state, graph))
            y = np.asarray(graph.y)
            for i, pidx in enumerate(np.asarray(graph.patch_idx)):
                pidx = int(pidx)
                logit_sum[pidx] = logit_sum.get(pidx, 0.0) + logits[i]
                labels[pidx] = int(y[i])

    metric = ImageLevelMetric()
    records = []
    for pidx in sorted(logit_sum):
        mean = logit_sum[pidx] / reps
        pred = int(np.argmax(mean))
        name = ds.names[pidx]
        metric.add_batch([name], [pred], [labels[pidx]])
        records.append(
            {
                "patch": name,
                "image": image_stem(name),
                "pred": pred,
                "label": labels[pidx],
                "logits": [float(v) for v in mean],
            }
        )
    result = metric.result()
    result["patch_acc"] = float(
        np.mean([r["pred"] == r["label"] for r in records])
    )
    if args.out:
        out = Path(args.out)
        out.parent.mkdir(parents=True, exist_ok=True)
        with out.open("w") as f:
            for r in records:
                f.write(json.dumps(r) + "\n")
            f.write(json.dumps({"summary": result}) + "\n")
        print(f"wrote {len(records)} predictions -> {out}", file=sys.stderr)
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
