"""Multi-shard correctness artifact ABOVE the single-chip capacity boundary.

slide_scale_r3.json established 500k < N* <= 1M nuclei per chip and
prescribed "shard at <=500k/chip"; this script is the correctness artifact
for that deployment claim at a scale where the full train step is
compute-infeasible on the CPU mesh (a 600k step is ~3 TFLOP): it drives the
scale-critical machinery — production graph build, spatial partition,
capacity/halo tables, banded-window tables, and the halo-exchange sharded
aggregation — at 600k nuclei on 2 and 4 virtual devices, and pins the
sharded aggregation against a single-process numpy oracle on the
unpartitioned graph. (The full sharded TRAIN step's correctness is pinned
by tests/test_mega_train.py and the 2-process Gloo run in tests/mh_worker.py
'mega' at feasible sizes; the 1M single-chip step is measured on hardware
in slide_scale_r4.json.)

Usage: python benchmarks/shard_scale.py [--nuclei 600000] [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path
import sys

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nuclei", type=int, default=600_000)
    ap.add_argument(
        "--out", default=str(Path(__file__).parent / "shard_scale_r4.json")
    )
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
    import jax.numpy as jnp

    from cgcnet_tpu.config import Config
    from cgcnet_tpu.dataflow import native
    from cgcnet_tpu.ops.knn import radius_knn_np
    from cgcnet_tpu.ops.pallas.bsr_kernel import G_BAND
    from cgcnet_tpu.parallel.mega_graph import (
        build_bsr_tables,
        partition_graph,
        sharded_gather_sum,
        sharded_gather_sum_overlap,
    )
    from cgcnet_tpu.parallel.mega_model import prepare_mega_inputs
    from cgcnet_tpu.parallel.mesh import make_mesh
    from cgcnet_tpu.parallel.slide_setup import synthetic_slide

    cfg = Config()
    _, coords = synthetic_slide(args.nuclei)
    result: dict = {"nuclei": args.nuclei}

    # same construction slide_setup.build_slide_inputs performs: spatial
    # band-sort, grid-hash radius graph, self-pointing zero-mask pad rows
    band = np.floor(coords[:, 0] / cfg.data.max_edge_distance)
    coords = coords[np.lexsort((coords[:, 1], band))]
    t0 = time.perf_counter()
    if native.available():
        nbr, mask = native.radius_knn(
            coords, cfg.data.max_edge_distance, cfg.data.max_neighbours
        )
    else:
        nbr, mask = radius_knn_np(
            coords, cfg.data.max_edge_distance, cfg.data.max_neighbours
        )
    t_graph = time.perf_counter() - t0
    result["edges"] = int(mask.sum())
    result["graph_build_s"] = round(t_graph, 2)

    for shards in (2, 4):
        mesh = make_mesh(1, shards)
        q = 128 * G_BAND * shards
        cap = -(-args.nuclei // q) * q
        k = nbr.shape[1]
        nbrp = np.tile(np.arange(cap, dtype=np.int32)[:, None], (1, k))
        maskp = np.zeros((cap, k), np.float32)
        nbrp[: args.nuclei], maskp[: args.nuclei] = nbr, mask

        t0 = time.perf_counter()
        part = partition_graph(nbrp, maskp, shards)
        t_part = time.perf_counter() - t0
        t0 = time.perf_counter()
        tables = build_bsr_tables(part)
        t_tables = time.perf_counter() - t0

        rng = np.random.default_rng(0)
        x = rng.normal(size=(cap, 18)).astype(np.float32)
        xb = jnp.asarray(x, jnp.bfloat16)
        inp = prepare_mega_inputs(x, part, mesh, n_real=args.nuclei)

        # single-process oracle on the global graph, from the SAME bf16
        # values the sharded path reads
        xo = np.asarray(xb, np.float32)
        oracle = np.einsum("nk,nkf->nf", maskp, xo[nbrp])

        outs = {}
        for name, fn in (("plain", sharded_gather_sum),
                         ("overlap", sharded_gather_sum_overlap)):
            out = fn(
                xb, inp.nbr_remap, inp.nbr_mask,
                inp.nbr_mask.astype(xb.dtype), inp.req_idx, inp.req_mask,
                mesh,
            )
            err = np.abs(np.asarray(out, np.float32) - oracle).max()
            # bf16 accumulation of K<=8 masked terms vs the oracle's f32
            # accumulation of the same bf16 values
            tol = 0.25
            assert err < tol, (shards, name, err)
            outs[name] = float(err)

        halo_rows = int(np.asarray(part.req_mask).sum())
        result[f"shards_{shards}"] = {
            "rows_per_shard": cap // shards,
            "capacity": cap,
            "halo_capacity_per_pair": int(part.halo_capacity),
            "halo_rows_exchanged": halo_rows,
            "halo_fraction": round(halo_rows / args.nuclei, 5),
            "banded_window_fwd": tables.win_base is not None,
            "banded_window_bwd": tables.win_base_t is not None,
            "bsr_m": int(tables.blk_cols.shape[-1]),
            "bsr_mt": int(tables.blk_cols_t.shape[-1]),
            "partition_s": round(t_part, 2),
            "tables_s": round(t_tables, 2),
            "agg_max_err_vs_oracle": outs,
        }
        print(shards, "shards:", result[f"shards_{shards}"])

    Path(args.out).write_text(json.dumps(result, indent=1) + "\n")
    print("wrote", args.out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
