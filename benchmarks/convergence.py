"""On-chip end-to-end convergence artifact (accuracy evidence).

Trains the canonical configuration on the deterministic synthetic 3-grade
dataset in both precisions and records final patch / image / binary accuracy
to a JSON artifact. This pins the "bf16 within f32" claim (VERDICT round-1
item 5) to a reproducible run instead of an ad-hoc measurement.

Usage:
    python benchmarks/convergence.py [epochs] [out.json]   # real TPU
    python benchmarks/convergence.py 3 /tmp/conv.json --cpu  # smoke

The reference has no published accuracy in-repo (SURVEY.md §6); the paper's
CRC numbers need the real dataset. Until that exists, this synthetic run is
the end-to-end learning check: both precisions must reach image accuracy 1.0
and patch accuracy >= 0.90 at 8 epochs (round-2 measured f32 0.94 / bf16 at
or above f32 after the f32-island precision policy).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    cpu = "--cpu" in argv
    if cpu:
        argv.remove("--cpu")
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
    epochs = int(argv[0]) if len(argv) > 0 else 8
    out_path = argv[1] if len(argv) > 1 else "benchmarks/convergence_r3.json"

    if not cpu:
        import bench

        bench.wait_for_backend()
        bench.enable_compile_cache()

    from cgcnet_tpu.cli.train import main as train_main

    overrides = [
        f"train.num_epochs={epochs}",
        "train.eval_every_batches=0",
        "data.num_workers=2",
        "train.log_every=50",
    ]
    results = {}
    for dtype in ("float32", "bfloat16"):
        t0 = time.perf_counter()
        final = train_main(
            ["--synthetic", f"model.compute_dtype={dtype}"] + overrides
        )
        results[dtype] = {
            "patch_acc": round(float(final["patch_acc"]), 4),
            "img_acc": round(float(final["img_acc"]), 4),
            "binary_acc": round(float(final["binary_acc"]), 4),
            "wall_s": round(time.perf_counter() - t0, 1),
        }
        print(f"== {dtype}: {results[dtype]}")

    import jax

    artifact = {
        "desc": "end-to-end convergence, canonical config, synthetic "
                "3-grade dataset (fuse sampling ratio 0.5, dropout, BSR "
                "path on TPU), test-time multi-sampling eval",
        "backend": jax.default_backend(),
        "epochs": epochs,
        "measured_utc": time.strftime("%Y-%m-%dT%H:%MZ", time.gmtime()),
        "results": results,
        "bf16_patch_gap": round(
            results["float32"]["patch_acc"] - results["bfloat16"]["patch_acc"],
            4,
        ),
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact))


if __name__ == "__main__":
    main()
