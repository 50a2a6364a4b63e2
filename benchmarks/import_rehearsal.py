"""End-to-end rehearsal of the real-data path at reference shape (round 4).

The CRC dataset itself is env-blocked (no network, no data drop), so this is
the strongest available stand-in for real-data parity: write a tree of
torch-pickled PyG-style ``Data`` protos in the reference's on-disk layout
(fold dirs + grade dirs, raw x=[N,18] with coords appended per
/root/reference/dataflow/prepare_cv_dataset.py:61, N~8-11k nuclei, 3584^2
coordinate range per construct_feature_graph.py / setting.py:15), then run
the full production path on it:

    preprocess import-reference  ->  cli/crossval (3 folds x 2 epochs)

and record timings + accuracies in benchmarks/import_rehearsal_r4.json.

Usage:
    python benchmarks/import_rehearsal.py [--cpu] [--epochs 2]
        [--images-per-grade 2] [--patches-per-image 2] [--out FILE]

Runs on the real TPU by default (the canonical path); --cpu uses the
8-device virtual mesh instead (must be passed before any backend touch).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

FOLDS = ("fold_1", "fold_2", "fold_3")
GRADE_DIRS = ("1_normal", "2_low_grade", "3_high_grade")
TILE = 3584.0  # reference tile side (construct_feature_graph.py crops)


class Data:
    """Stand-in for torch_geometric.data.Data — the reference pickles objects
    exposing .x/.pos/.y (dataflow/data.py:237,253); import-reference reads
    exactly those attributes. PyG itself is not installed in this env
    (tests/vendor/PYG_AUDIT.md), so unpickling resolves this class instead."""

    def __init__(self, x, pos, y):
        self.x, self.pos, self.y = x, pos, y


def generate_reference_tree(
    root: Path,
    *,
    images_per_grade: int,
    patches_per_image: int,
    n_range: tuple[int, int],
    seed: int,
) -> dict:
    """Write .pt pickles in the reference raw-proto layout; returns stats."""
    import torch

    from cgcnet_tpu.dataflow.synthetic import make_patch

    rng = np.random.default_rng(seed)
    n_nodes_all = []
    count = 0
    for fold in FOLDS:
        for grade, gdir in enumerate(GRADE_DIRS):
            d = root / fold / gdir
            d.mkdir(parents=True, exist_ok=True)
            for img in range(images_per_grade):
                # image stem before '_grade' must be unique per image
                # (common/metric.py:29-36 parse convention)
                stem = f"{fold}_g{grade + 1}_img{img}_grade_{grade + 1}"
                for p in range(patches_per_image):
                    n = int(rng.integers(*n_range))
                    feats, pts = make_patch(rng, grade, n, tile=TILE)
                    # reference raw protos append coords to x
                    # (prepare_cv_dataset.py:61)
                    x = np.concatenate([feats, pts], axis=1)
                    data = Data(
                        x=torch.from_numpy(x.astype(np.float32)),
                        pos=torch.from_numpy(pts.astype(np.float32)),
                        y=torch.tensor([grade]),
                    )
                    torch.save(data, d / f"{stem}_{p}.pt")
                    n_nodes_all.append(n)
                    count += 1
    return {
        "patches": count,
        "nodes_min": int(min(n_nodes_all)),
        "nodes_max": int(max(n_nodes_all)),
        "nodes_mean": float(np.mean(n_nodes_all)),
        "coord_range": TILE,
    }


def _val_curve(run_dir: str | None) -> list[dict]:
    """Per-epoch val metrics from a fold's metrics.jsonl (kind == 'val')."""
    if not run_dir:
        return []
    path = Path(run_dir) / "metrics.jsonl"
    if not path.exists():
        return []
    curve = []
    for line in path.read_text().splitlines():
        rec = json.loads(line)
        if rec.get("kind") == "val":
            curve.append(
                {
                    "epoch": rec.get("epoch"),
                    "img_acc": rec.get("img_acc"),
                    "binary_acc": rec.get("binary_acc"),
                    "patch_acc": rec.get("patch_acc"),
                }
            )
    return curve


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--images-per-grade", type=int, default=2)
    ap.add_argument("--patches-per-image", type=int, default=2)
    ap.add_argument("--nodes-min", type=int, default=8000)
    ap.add_argument("--nodes-max", type=int, default=11404)
    ap.add_argument(
        "--max-nodes", type=int, default=11404,
        help="data.max_num_nodes (model capacity follows); the default is "
        "the reference's setting.py:15 value — lower it only for smoke runs",
    )
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--workdir", default=None, help="keep the tree here")
    ap.add_argument(
        "--out", default=str(Path(__file__).parent / "import_rehearsal_r5.json")
    )
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)

    import tempfile

    work = Path(args.workdir or tempfile.mkdtemp(prefix="cgc_rehearsal_"))
    src, dst = work / "reference_raw", work / "data"
    result: dict = {"workdir": str(work), "config": vars(args)}

    print(f"== stage 1: generate reference-layout .pt tree under {src}")
    t0 = time.perf_counter()
    result["generate"] = generate_reference_tree(
        src,
        images_per_grade=args.images_per_grade,
        patches_per_image=args.patches_per_image,
        n_range=(args.nodes_min, args.nodes_max + 1),
        seed=args.seed,
    )
    result["generate"]["seconds"] = round(time.perf_counter() - t0, 3)
    print(f"   {result['generate']}")

    print("== stage 2: preprocess import-reference")
    from cgcnet_tpu.cli.preprocess import main as preprocess_main

    t0 = time.perf_counter()
    rc = preprocess_main(["import-reference", "--src", str(src), "--dst", str(dst)])
    dt = time.perf_counter() - t0
    assert rc == 0, "import-reference failed"
    n_protos = len(list((dst / "proto" / "feature").rglob("*.npz")))
    assert n_protos == result["generate"]["patches"], (
        f"imported {n_protos} != generated {result['generate']['patches']}"
    )
    result["import"] = {
        "seconds": round(dt, 3),
        "protos": n_protos,
        "patches_per_s": round(n_protos / dt, 1),
    }
    print(f"   {result['import']}")

    print(f"== stage 3: 3-fold cross-validation, {args.epochs} epochs/fold")
    from cgcnet_tpu.cli.crossval import main as crossval_main

    overrides = [
        f"data.root={dst}",
        f"train.num_epochs={args.epochs}",
        f"data.max_num_nodes={args.max_nodes}",
        "data.num_workers=2",
    ]
    if args.cpu:
        overrides = ["--cpu"] + overrides
    t0 = time.perf_counter()
    cv = crossval_main(overrides)
    result["crossval"] = {
        "seconds": round(time.perf_counter() - t0, 1),
        "epochs_per_fold": args.epochs,
        "mean": cv["mean"],
        "folds": {
            str(k): {m: float(v[m]) for m in ("img_acc", "binary_acc", "patch_acc")}
            for k, v in cv["folds"].items()
        },
        # per-epoch validation curves (round-5: convergence evidence, not
        # just endpoint plumbing) — read back from each fold's metrics.jsonl
        "curves": {
            str(k): _val_curve(v.get("run_dir")) for k, v in cv["folds"].items()
        },
    }
    print(f"   {result['crossval']}")

    Path(args.out).write_text(json.dumps(result, indent=2) + "\n")
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
