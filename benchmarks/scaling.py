"""Graph-parallel scaling sweep (BASELINE.json configs 4-5).

Measures edges/s of the sharded halo-exchange aggregation
(cgcnet_tpu/parallel/mega_graph.py) over a whole-slide graph at increasing
shard counts, plus the all-gather baseline, and reports scaling efficiency
vs 1 shard.

Without pod hardware this runs on the virtual CPU mesh (demonstrating the
partition/communication structure and the efficiency accounting); on a real
multi-chip slice the same harness measures ICI-backed numbers — pass
``--platform tpu`` there.

Usage:
    python benchmarks/scaling.py [--nuclei 100000] [--feat 64] [--shards 1 2 4 8]
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
    p.add_argument("--nuclei", type=int, default=100_000)
    p.add_argument("--feat", type=int, default=64)
    p.add_argument("--shards", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    args = p.parse_args(argv)

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", max(args.shards))
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cgcnet_tpu.dataflow import native
    from cgcnet_tpu.ops.knn import radius_knn_np
    from cgcnet_tpu.parallel.mega_graph import (
        partition_graph,
        sharded_gather_sum,
        sharded_gather_sum_allgather,
        sharded_gather_sum_overlap,
    )
    from cgcnet_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(0)
    n = args.nuclei
    side = 3584.0 * max(1.0, np.sqrt(n / 5000.0))
    coords = rng.uniform(0, side, (n, 2)).astype(np.float32)
    band = np.floor(coords[:, 0] / 100.0)
    coords = coords[np.lexsort((coords[:, 1], band))]
    t0 = time.perf_counter()
    if native.available():
        nbr, mask = native.radius_knn(coords, 100.0, 8)
    else:
        nbr, mask = radius_knn_np(coords, 100.0, 8)
    print(f"graph: {n} nodes, {int(mask.sum())} edges, "
          f"built in {time.perf_counter()-t0:.2f}s", file=sys.stderr)
    edges = int(mask.sum())

    results = []
    base_eps = None
    for d in args.shards:
        cap = -(-n // (128 * d)) * (128 * d)
        nbrp = np.tile(np.arange(cap, dtype=np.int32)[:, None], (1, 8))
        maskp = np.zeros((cap, 8), np.float32)
        nbrp[:n], maskp[:n] = nbr, mask
        mesh = make_mesh(1, d, devices=jax.devices()[:d])
        part = partition_graph(nbrp, maskp, d)
        spec = NamedSharding(mesh, P("graph"))
        put = lambda a: jax.device_put(jnp.asarray(a), spec)
        x = put(rng.normal(size=(cap, args.feat)).astype(np.float32))
        tables = (
            put(part.nbr_remap.reshape(cap, 8)),
            put(part.nbr_mask.reshape(cap, 8)),
            put(part.nbr_mask.reshape(cap, 8)),
            put(part.req_idx.reshape(-1, part.halo_capacity)),
            put(part.req_mask.reshape(-1, part.halo_capacity)),
        )

        @jax.jit
        def halo_step(xx):
            out = sharded_gather_sum(xx, *tables, mesh=mesh)
            return xx * 0.999 + out * 1e-9

        @jax.jit
        def overlap_step(xx):
            out = sharded_gather_sum_overlap(xx, *tables, mesh=mesh)
            return xx * 0.999 + out * 1e-9

        @jax.jit
        def ag_step(xx):
            out = sharded_gather_sum_allgather(
                xx, put(nbrp), put(maskp), mesh=mesh
            )
            return xx * 0.999 + out * 1e-9

        row = {"shards": d, "halo_rows": int(part.req_mask.sum()),
               "halo_frac": float(part.req_mask.sum()) / n}
        for name, step in (("halo", halo_step), ("overlap", overlap_step),
                           ("allgather", ag_step)):
            y = step(x)
            jax.block_until_ready(y)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                y = step(y)
            jax.block_until_ready(y)
            dt = (time.perf_counter() - t0) / args.iters
            row[f"{name}_ms"] = round(dt * 1e3, 2)
            row[f"{name}_gedges_per_s"] = round(edges / dt / 1e9, 3)
        if base_eps is None:
            base_eps = row["halo_gedges_per_s"]
        row["halo_scaling_efficiency"] = round(
            row["halo_gedges_per_s"] / (base_eps * d), 3
        )
        results.append(row)
        print(json.dumps(row), file=sys.stderr)

    print(json.dumps({"edges": edges, "results": results}))
    return results


if __name__ == "__main__":
    main()
