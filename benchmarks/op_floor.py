"""Measure the per-op floor for small [B, N, C] elementwise/reduce ops.

The r3 roofline attributes ~2.4 ms of the 6.36 ms step to ~70 ops at
33-76 us whose individual DMA bounds are 2-10 us. Two hypotheses:
(a) a fixed per-op dispatch/ramp floor (~40 us), (b) lane waste — C=20
occupies 20/128 of each vector register row. This times chains of N
BN-flavoured ops at C in {20, 60, 128} on the real chip, with an
``optimization_barrier`` between chain links so each link compiles to its
own fusion kernel — exactly how the real step's conv/BN/act tail appears
in the xplane profile (separate fusions bounded by matmuls and running-
stat side outputs). A fused variant (no barriers) is timed next to it:
the gap between the two IS the prize for hand-fusing the tail.

If per-op time is ~flat across C, it's a dispatch/ramp floor; if it
scales with C-padding waste it's lanes. Either way `fused` tells whether
multi-layer Pallas tail kernels pay.

Inputs are random and the loop carry is data-dependent so nothing
constant-folds or hoists (the v1 script used ones + a pure chain and XLA
reduced the whole thing to ~0.04 us/op of fiction).

Usage: python benchmarks/op_floor.py [ops_per_chain=32] [iters=50]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ops = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    import bench

    bench.wait_for_backend()
    bench.enable_compile_cache()
    import jax
    import jax.numpy as jnp

    def link(x):
        # one BN-flavoured op: f32 stats reduce + normalize, like
        # TorchBatchNorm's per-layer work
        h = x.astype(jnp.float32)
        m = jnp.mean(h, axis=(0, 1))
        v = jnp.mean((h - m) ** 2, axis=(0, 1))
        return ((h - m) * jax.lax.rsqrt(v + 1e-5) + 0.01).astype(jnp.bfloat16)

    for c in (20, 60, 128):
        key = jax.random.key(c)
        x0 = jax.random.normal(key, (4, 5760, c), jnp.float32).astype(
            jnp.bfloat16
        )

        def run(x0, barriers):
            def body(i, xx):
                # fold the loop counter in so the body can't hoist
                xx = xx + (i * jnp.bfloat16(1e-8))
                for _ in range(ops):
                    xx = link(xx)
                    if barriers:
                        xx = jax.lax.optimization_barrier(xx)
                return xx

            return jax.lax.fori_loop(0, iters, body, x0)

        split = jax.jit(lambda x: run(x, True))
        fused = jax.jit(lambda x: run(x, False))

        out = {}
        for name, fn in (("split", split), ("fused", fused)):
            jax.block_until_ready(fn(x0))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(fn(x0))
                best = min(best, time.perf_counter() - t0)
            out[name] = best / iters / ops
        # each chain op reads+writes ~2.5 tensors
        bw_bound = 2.5 * x0.size * 2 / 820e9
        print(
            f"C={c:4d}: split {out['split'] * 1e6:7.2f} us/op  "
            f"fused {out['fused'] * 1e6:7.2f} us/op  "
            f"(bw bound {bw_bound * 1e6:5.2f} us, "
            f"split ratio {out['split'] / bw_bound:5.1f}x)"
        )


if __name__ == "__main__":
    main()
