"""Capacity ladder: slide-step time vs nuclei count x capacity config.

Round-4 VERDICT weak #3: the 500k-1M guidance rested on two endpoints
(500k without chunking, 1M with chunk+remat). This measures >=4 rungs with
BOTH configurations where they fit, locating where the chunked-recompute
assign tail + stage-1 remat start to pay, and emits a crossover rule.

Each rung runs in a SUBPROCESS (one TPU job at a time, fresh HBM state,
and an OOM kills only the rung) via benchmarks/slide_step.py, which
device-loops the full train step and prints one JSON line.

Usage:
    python benchmarks/slide_ladder.py [--out benchmarks/slide_ladder_r5.json]
        [--rungs 100000,500000,750000,1000000]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

CONFIGS = {
    "default": [],
    "chunked": ["model.assign_tail_chunk=65536", "mesh.remat_stage1=true"],
}


def run_rung(nuclei: int, config: str, timeout_s: int = 3600) -> dict:
    cmd = [
        sys.executable, str(REPO / "benchmarks" / "slide_step.py"),
        "--nuclei", str(nuclei), *CONFIGS[config],
    ]
    print(f"== {nuclei} nuclei / {config}: {' '.join(cmd[2:])}", flush=True)
    try:
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=timeout_s,
            cwd=str(REPO),
        )
    except subprocess.TimeoutExpired:
        return {"error": f"timeout after {timeout_s}s"}
    line = next(
        (ln for ln in reversed(proc.stdout.splitlines())
         if ln.startswith("{")), None,
    )
    if proc.returncode != 0 or line is None:
        tail = (proc.stderr or proc.stdout).strip().splitlines()[-15:]
        oom = any("RESOURCE_EXHAUSTED" in t or "Ran out of memory" in t
                  for t in tail)
        return {
            "error": "OOM" if oom else f"rc={proc.returncode}",
            "tail": tail[-4:],
        }
    rec = json.loads(line)
    print(f"   {rec['step_ms']} ms  ({rec['edges_per_s_fwd_bwd']:.3g} edge/s,"
          f" delta={rec['param_l1_delta']:.3g})", flush=True)
    return rec


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--rungs", default="100000,500000,750000,1000000",
        help="comma-separated nuclei counts",
    )
    ap.add_argument("--configs", default="default,chunked")
    ap.add_argument(
        "--out", default=str(Path(__file__).parent / "slide_ladder_r5.json")
    )
    args = ap.parse_args()
    rungs = [int(r) for r in args.rungs.split(",")]
    configs = args.configs.split(",")

    import datetime

    result: dict = {
        "bench": "slide_train_step capacity ladder (single v5e chip, bf16)",
        "configs": {k: " ".join(v) or "(default path)" for k, v in
                    CONFIGS.items() if k in configs},
        "rungs": {},
        "measured_utc": datetime.datetime.now(datetime.timezone.utc).strftime(
            "%Y-%m-%dT%H:%MZ"
        ),
    }
    for n in rungs:
        row = {}
        for config in configs:
            rec = run_rung(n, config)
            keep = {
                k: rec[k] for k in (
                    "step_ms", "edges_per_s_fwd_bwd", "edges",
                    "param_l1_delta", "error",
                ) if k in rec
            }
            row[config] = keep or rec
            Path(args.out).write_text(json.dumps(result, indent=1) + "\n")
        result["rungs"][str(n)] = row
        Path(args.out).write_text(json.dumps(result, indent=1) + "\n")

    # crossover rule: smallest rung where the chunked config beats default
    # (or where default OOMs)
    rule = None
    for n in rungs:
        row = result["rungs"][str(n)]
        d, ch = row.get("default", {}), row.get("chunked", {})
        if "error" in d and "step_ms" in ch:
            rule = f"default OOMs at {n}; chunked required"
            break
        if d.get("step_ms") and ch.get("step_ms") \
                and ch["step_ms"] < d["step_ms"]:
            rule = f"chunked faster from {n} nuclei"
            break
    result["crossover"] = rule or "default path fastest at every rung it fits"
    Path(args.out).write_text(json.dumps(result, indent=1) + "\n")
    print("crossover:", result["crossover"])
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
