"""Full 3-fold cross-validation driver (BASELINE.json config 3).

The reference trains one fold per invocation (parallel_train.sh); this driver
runs all three folds (dataflow/data.py:15-19 split table) and aggregates
image-level accuracy across them.

Usage:
    python -m cgcnet_tpu.cli.crossval data.root=/data [overrides...]
"""

from __future__ import annotations

import json
import sys

import numpy as np


def main(argv=None) -> dict:
    argv = list(sys.argv[1:] if argv is None else argv)
    from cgcnet_tpu.cli.train import main as train_main

    results = {}
    for fold in (1, 2, 3):
        print(f"===== fold {fold} =====")
        results[fold] = train_main(argv + [f"data.cross_val={fold}"])
    agg = {
        key: float(np.mean([r[key] for r in results.values()]))
        for key in ("img_acc", "binary_acc", "patch_acc")
    }
    print("cross-val mean:", json.dumps(agg, indent=2))
    return {"folds": results, "mean": agg}


if __name__ == "__main__":
    main()
