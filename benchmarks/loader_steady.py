"""Steady-state loader throughput with the built-graph cache (round-3).

Round-2 VERDICT weak #6: the loader saturated at ~60% of step consumption,
and fixed-epoch runs rebuilt identical graphs on every epoch revisit. The
built-graph cache (dataflow/dataset.py::_cache_key, round 3) replays
(sample, kNN, transpose, pad) results once the epoch counter wraps past
``num_fixed_epochs``. This measures cold vs steady-state epochs through the
REAL GraphLoader (threaded workers, wire packing) on canonical-scale
synthetic patches, entirely host-side (CPU backend — device_put cost is the
same transfer either way and the claim under test is host build).

Caveat printed into the artifact: replay requires the resident set
(patches x num_fixed_epochs built graphs, ~2.5 MB each at canonical scale)
to fit ``data.graph_cache_mb``; datasets beyond the budget keep the cold
path for the overflow (no LRU — cyclic access would thrash it).

Usage: python benchmarks/loader_steady.py [--patches 12] [--cycle 5]
       [--out benchmarks/loader_steady_r3.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--patches", type=int, default=12)
    p.add_argument("--cycle", type=int, default=5,
                   help="num_fixed_epochs (reference protocol uses 30)")
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--out", default="benchmarks/loader_steady_r3.json")
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    import tempfile

    from cgcnet_tpu.config import DataConfig
    from cgcnet_tpu.dataflow.dataset import NucleiGraphDataset
    from cgcnet_tpu.dataflow.fixed_epochs import generate_fixed_epochs
    from cgcnet_tpu.dataflow.loader import GraphLoader
    from cgcnet_tpu.dataflow.synthetic import generate_dataset

    root = tempfile.mkdtemp(prefix="cgc_loader_")
    per_grade = max(1, args.patches // 6)
    generate_dataset(
        root, patches_per_image=2, images_per_grade=per_grade,
        n_nodes=(10_500, 11_404), seed=3,
    )
    cfg = DataConfig(
        root=root, use_fixed=True, num_fixed_epochs=args.cycle,
        num_workers=args.workers, seed=11,
    )
    ds = NucleiGraphDataset(cfg, split="train")
    n_patches = len(ds.names)
    t0 = time.perf_counter()
    generate_fixed_epochs(cfg, processes=args.workers)
    t_gen = time.perf_counter() - t0
    loader = GraphLoader(
        ds, cfg.batch_size, shuffle=True, num_workers=args.workers,
    )

    def run_epoch(epoch):
        t0 = time.perf_counter()
        seen = 0
        for batch in loader.epoch(epoch):
            seen += int(batch.x.shape[0])
        return seen / (time.perf_counter() - t0)

    cold = [run_epoch(e) for e in range(1, args.cycle + 1)]  # fills cache
    steady = [run_epoch(e) for e in range(args.cycle + 1, args.cycle + 4)]
    hits = ds.graph_cache_hits
    art = {
        "desc": "host loader throughput, canonical-scale synthetic patches "
                "(10.5-11.4k nuclei), fixed-epoch protocol; steady = epochs "
                "past the fixed-epoch wrap where the built-graph cache "
                "replays",
        "patches": n_patches,
        "num_fixed_epochs": args.cycle,
        "workers": args.workers,
        "fixed_gen_s": round(t_gen, 2),
        "cold_patches_per_s": [round(v, 1) for v in cold],
        "steady_patches_per_s": [round(v, 1) for v in steady],
        "cache_hits": hits,
        "cache_mb": round(ds._graph_cache_bytes / (1 << 20), 1),
        "step_consumption_patches_per_s_bf16": 571,
        "steady_covers_step": min(steady) >= 571,
        "budget_caveat": "replay needs patches*num_fixed_epochs built "
                         "graphs under data.graph_cache_mb; overflow keys "
                         "stay on the cold path",
        "measured_utc": time.strftime("%Y-%m-%dT%H:%MZ", time.gmtime()),
    }
    with open(args.out, "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps(art, indent=1))
    assert hits > 0, "cache never hit — steady epochs did not replay"
    return art


if __name__ == "__main__":
    main()
