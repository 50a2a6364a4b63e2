#!/bin/sh
# Post-tunnel-outage measurement runbook (CLAUDE.md "Environment gotchas").
# Run ONE at a time — the compile relay serializes TPU compilations.
#
#   sh scripts/post_outage.sh [out_dir]
#
# 1. bench.py          — fresh step numbers (incl. the assign-head fusion)
# 2. profile_step.py   — bf16 device-time breakdown
# Then refresh the step tables in README.md / BASELINE.md / COVERAGE.md by
# hand from the outputs saved under ${out_dir:-/tmp/post_outage}.
set -eu
cd "$(dirname "$0")/.."
out="${1:-/tmp/post_outage}"
mkdir -p "$out"

echo "== 1/2 bench.py (waits for the tunnel; window CGCNET_BENCH_WAIT_S) =="
# no pipe: POSIX sh has no pipefail, and bench.py's terminal give-up exit
# must stop the runbook (profile_step would otherwise hang on a dead tunnel)
python bench.py >"$out/bench.json" 2>"$out/bench.stderr"
cat "$out/bench.json"

echo "== 2/2 profile_step.py bfloat16 =="
python benchmarks/profile_step.py bfloat16 >"$out/profile_bf16.txt" 2>"$out/profile_bf16.stderr"
tail -25 "$out/profile_bf16.txt"

echo "outputs in $out — now refresh README/BASELINE/COVERAGE step tables"
