"""Offline preprocessing CLI.

Stage A (reference construct_feature_graph.py): instance masks + images ->
per-nucleus feature/coordinate protos.
Stage B (reference prepare_cv_dataset.py): pre-sample fixed-epoch node
choices.

Usage:
    python -m cgcnet_tpu.cli.preprocess features \
        --masks data/mask/colorectal --images data/images/colorectal \
        --out data [--processes 8]
    python -m cgcnet_tpu.cli.preprocess fixed --root data \
        [data.sampling_method=fuse ...]

Mask files: <fold>/<grade_dir>/<patch>.npy int instance labels; images:
matching .png/.tif under --images (optional — without images, intensity
features are zeroed and only geometry is extracted).
"""

from __future__ import annotations

import argparse
import sys
from multiprocessing import Pool
from pathlib import Path

import numpy as np

from cgcnet_tpu.dataflow.proto import LABEL_NAMES, PatchProto, save_proto
from cgcnet_tpu.preprocess.features import extract_patch_features


def _label_from_path(rel: Path) -> int:
    for part in rel.parts:
        if part in LABEL_NAMES:
            return LABEL_NAMES[part]
    raise ValueError(f"no grade directory in {rel}")


def _process_one(args) -> str:
    mask_path, image_root, out_root, mask_root = args
    rel = Path(mask_path).relative_to(mask_root).with_suffix("")
    mask = np.load(mask_path)
    gray = None
    if image_root:
        for ext in (".png", ".tif", ".jpg"):
            cand = Path(image_root) / rel.parent / (rel.name + ext)
            if cand.exists():
                import cv2

                img = cv2.imread(str(cand))
                gray = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
                if gray.shape != mask.shape:
                    gray = cv2.resize(
                        gray, mask.shape[::-1], interpolation=cv2.INTER_LINEAR
                    )
                break
    if gray is None:
        gray = np.zeros(mask.shape, np.uint8)
    feats, coords = extract_patch_features(mask.astype(np.int64), gray)
    proto = PatchProto(
        name=str(rel), features=feats, coords=coords, label=_label_from_path(rel)
    )
    save_proto(out_root, proto)
    return str(rel)


def run_features(argv) -> int:
    p = argparse.ArgumentParser(prog="preprocess features")
    p.add_argument("--masks", required=True)
    p.add_argument("--images", default=None)
    p.add_argument("--out", required=True)
    p.add_argument("--processes", type=int, default=8)
    a = p.parse_args(argv)
    masks = sorted(Path(a.masks).rglob("*.npy"))
    if not masks:
        print(f"no .npy masks under {a.masks}", file=sys.stderr)
        return 1
    work = [(str(m), a.images, a.out, a.masks) for m in masks]
    if a.processes <= 1:
        done = [_process_one(w) for w in work]
    else:
        with Pool(a.processes) as pool:
            done = []
            for i, name in enumerate(pool.imap_unordered(_process_one, work)):
                done.append(name)
                if (i + 1) % 10 == 0:
                    print(f"Finish {i + 1}/{len(work)}")
    print(f"wrote {len(done)} protos under {a.out}/proto/feature")
    return 0


def run_fixed(argv) -> int:
    p = argparse.ArgumentParser(prog="preprocess fixed")
    p.add_argument("--root", required=True)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--processes", type=int, default=8)
    p.add_argument("overrides", nargs="*")
    a = p.parse_args(argv)
    from cgcnet_tpu.config import Config
    from cgcnet_tpu.dataflow.fixed_epochs import generate_fixed_epochs

    cfg = Config().apply_overrides(
        [f"data.root={a.root}"] + list(a.overrides)
    )
    names = generate_fixed_epochs(
        cfg.data, num_epochs=a.epochs, processes=a.processes
    )
    print(f"pre-sampled {len(names)} patches x {a.epochs or cfg.data.num_fixed_epochs} epochs")
    return 0


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] not in ("features", "fixed"):
        print(__doc__)
        return 2
    return {"features": run_features, "fixed": run_fixed}[argv[0]](argv[1:])


if __name__ == "__main__":
    sys.exit(main())
