"""Mechanical per-op floor table from a captured xplane trace.

For every XLA-Ops-line op above a self-time threshold, compares measured
per-step time against the op's own speed-of-light floor computed from the
compiler's cost model stats embedded in the trace:

    floor = max(bytes_accessed / HBM_BW, flops / MXU_FLOPS)

and aggregates the sub-threshold population into size buckets (count,
total, mean — the latency-class tail). This replaces hand-derived bounds:
the round-4 roofline's "68% of bound" ds-assembly row used a hand-counted
4-operand estimate (1.41 GB) where the compiler's own accounting was
1.39 GB — the mechanical table is both cheaper and harder to fudge.

Fiction guards: ops with zero bytes AND zero flops (pure control) are
excluded from efficiency stats; `%while` wrappers are dropped (their span
double-counts every op inside).

Usage:
    python benchmarks/op_floor_table.py /tmp/prof_slide 10 [--thresh-us 100]
"""

from __future__ import annotations

import argparse
import glob
from collections import defaultdict

HBM_GBS = 820e9     # v5e HBM bandwidth
MXU_FLOPS = 197e12  # v5e bf16 dense


def load_ops(trace_dir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    f = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))[-1]
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(f, "rb").read())
    ops = {}
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        smeta = {m.id: m.name for m in plane.stat_metadata.values()}
        meta = {}
        for m in plane.event_metadata.values():
            d = {}
            for st in m.stats:
                sn = smeta.get(st.metadata_id, "?")
                d[sn] = (
                    st.str_value
                    or (st.ref_value and smeta.get(st.ref_value))
                    or st.int64_value
                    or st.uint64_value
                )
            meta[m.id] = (m.name, d)
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            agg = defaultdict(float)
            cnt = defaultdict(int)
            for ev in line.events:
                agg[ev.metadata_id] += ev.duration_ps / 1e12  # -> s
                cnt[ev.metadata_id] += 1
            for mid, secs in agg.items():
                name, d = meta.get(mid, ("?", {}))
                if name.startswith("%while"):
                    continue
                ops[name] = {
                    "s": secs,
                    "n": cnt[mid],
                    "bytes": int(d.get("bytes_accessed") or 0),
                    "flops": int(d.get("flops") or 0),
                    "src": str(d.get("source") or ""),
                }
    return ops


def emit(ops: dict, iters: int, thresh_us: float):
    rows, tail = [], defaultdict(lambda: [0, 0.0])
    total = 0.0
    for name, d in ops.items():
        us = d["s"] / iters * 1e6
        total += us
        if us >= thresh_us:
            bb = d["bytes"] / HBM_GBS * 1e6
            fb = d["flops"] / MXU_FLOPS * 1e6
            floor = max(bb, fb)
            rows.append((us, floor, bb, fb, name, d["src"]))
        else:
            b = (
                "50-%d" % thresh_us if us >= 50 else
                "20-50" if us >= 20 else "5-20" if us >= 5 else "<5"
            )
            tail[b][0] += 1
            tail[b][1] += us
    rows.sort(reverse=True)
    print(f"| op | us/step | floor | binding | % of floor | source |")
    print(f"|---|---:|---:|---|---:|---|")
    for us, floor, bb, fb, name, src in rows:
        short = name.split(" = ")[0].lstrip("%")
        binding = "-" if floor == 0 else ("MXU" if fb >= bb else "HBM")
        pct = "-" if floor == 0 else f"{100 * floor / us:.0f}%"
        src = src.split("/")[-1]
        print(f"| {short} | {us:.0f} | {floor:.0f} | {binding} | {pct} |"
              f" {src} |")
    acc = sum(r[0] for r in rows)
    print(f"\nnamed ops >= {thresh_us} us: {acc:.0f} us/step; tail:")
    for b in ("50-%d" % thresh_us, "20-50", "5-20", "<5"):
        if b in tail:
            n, us = tail[b]
            print(f"  {b} us bucket: {n} ops, {us:.0f} us/step "
                  f"(mean {us / n:.1f})")
    print(f"total (ex while): {total:.0f} us/step")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("iters", type=int)
    ap.add_argument("--thresh-us", type=float, default=100.0)
    args = ap.parse_args()
    emit(load_ops(args.trace_dir), args.iters, args.thresh_us)
