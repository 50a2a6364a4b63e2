"""Op-level device-time breakdown of the canonical train step.

Captures a ``jax.profiler`` trace of a device-looped train step on the real
TPU and aggregates per-op self time from the raw ``.xplane.pb`` (the
tensorboard_plugin_profile converters are version-broken in this image —
parse ``tensorflow.tsl.profiler.protobuf.xplane_pb2`` directly, with
``PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python``).

Usage:  python benchmarks/profile_step.py [float32|bfloat16] [top_n]

Prints one line per op group (sorted by total self time): total ms over the
loop, per-step us, call count, and the op name. The step is the same
fori_loop chain bench.py times, so per-step numbers line up with
``train_step[...]`` stderr context from bench.py minus host dispatch.
"""

from __future__ import annotations

import glob
import os
import re
import sys
from collections import defaultdict

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def capture(dtype: str, iters: int = 20, trace_dir: str = "/tmp/prof_step"):
    import jax

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    # probe the tunnel in a subprocess BEFORE the first in-process backend
    # touch — a hung/failed init is cached for the life of the process
    # (CLAUDE.md environment gotchas), and this script runs unattended in
    # scripts/post_outage.sh
    bench.wait_for_backend()
    bench.enable_compile_cache()
    import __graft_entry__ as ge
    from cgcnet_tpu.config import Config
    from cgcnet_tpu.train.loop import make_train_step
    from cgcnet_tpu.train.optim import make_optimizer
    from cgcnet_tpu.train.state import create_train_state

    graph = ge._example_graph(batch=4, cap=5760, kt=16)
    cfg = Config().apply_overrides(
        ["model.max_num_nodes=11404", f"model.compute_dtype={dtype}"]
    )
    tx = make_optimizer(cfg.train, steps_per_epoch=100)
    model, state = create_train_state(cfg, tx, graph)
    step_fn = make_train_step(model)

    @jax.jit
    def many_steps(s):
        return jax.lax.fori_loop(0, iters, lambda i, ss: step_fn(ss, graph, tx)[0], s)

    jax.block_until_ready(many_steps(state))  # compile + warm
    with jax.profiler.trace(trace_dir):
        jax.block_until_ready(many_steps(state))
    return trace_dir, iters


def summarize(trace_dir: str, iters: int, top_n: int = 40,
              plane_match: str = "TPU"):
    """Aggregate per-op self time from the newest .xplane.pb under trace_dir.

    Reported PER LINE (= per hardware queue): the TPU device plane carries
    one timeline for the TensorCore ("XLA Ops") plus several async queues
    (DMA copy/slice engines). Summing across lines — what the round-2 parse
    did — counts overlapped DMA as if it were serial compute and inflates a
    ~8 ms step to ~49 ms of "self time". Per line this prints busy time,
    idle gap (line span - busy: on the compute line, time the core stalls,
    e.g. waiting on DMA), and the top ops.

    ``plane_match``: substring selecting device planes — "TPU" for real-chip
    traces (XLA op lines), "/host:CPU" lets tests drive the same parse path
    on a CPU-captured trace.
    """
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    f = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))[-1]
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(f, "rb").read())
    rows = []
    for plane in xs.planes:
        if plane_match not in plane.name:
            continue
        evmeta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if line.name.lower().startswith(("step", "xla modules")):
                continue
            agg = defaultdict(float)
            cnt = defaultdict(int)
            t0, t1 = None, None
            for ev in line.events:
                name = evmeta.get(ev.metadata_id, "?")
                agg[name] += ev.duration_ps / 1e9  # -> ms
                cnt[name] += 1
                s = ev.offset_ps
                e = ev.offset_ps + ev.duration_ps
                t0 = s if t0 is None else min(t0, s)
                t1 = e if t1 is None else max(t1, e)
            if not agg:
                continue
            busy = sum(agg.values())
            span = (t1 - t0) / 1e9 if t0 is not None else 0.0
            print(
                f"\n== {plane.name} / line '{line.name}': busy "
                f"{busy:.2f} ms ({busy / iters * 1e3:.0f} us/step), span "
                f"{span:.2f} ms, gap {span - busy:.2f} ms "
                f"({(span - busy) / iters * 1e3:.0f} us/step) over "
                f"{iters} steps =="
            )
            for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:top_n]:
                rows.append((line.name, name, ms))
                print(f"{ms:8.2f} ms  {ms / iters * 1e3:7.1f} us/step  "
                      f"x{cnt[name]:<5d} {name[:110]}")
    return rows


def main():
    dtype = sys.argv[1] if len(sys.argv) > 1 else "bfloat16"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    trace_dir, iters = capture(dtype)
    summarize(trace_dir, iters, top_n)


if __name__ == "__main__":
    main()
