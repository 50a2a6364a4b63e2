"""Measure the per-op floor for small [B, N, C] elementwise/reduce ops.

The r3 roofline attributes ~2.4 ms of the 6.36 ms step to ~70 ops at
33-76 us whose individual DMA bounds are 2-10 us. Two hypotheses:
(a) a fixed per-op dispatch/ramp floor (~40 us), (b) lane waste — C=20
occupies 20/128 of each vector register row. This times chains of N
dependent elementwise+reduce ops at C in {20, 60, 128} on the real chip:
if per-op time is ~flat across C, it's a floor (fusing chains into
multi-layer Pallas kernels pays); if it scales with C-padding waste,
it's lanes (fusing still pays, differently).

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

    for c in (20, 60, 128):
        x = jnp.ones((4, 5760, c), jnp.bfloat16)

        def chain(x):
            # one BN-flavoured op: f32 stats reduce + normalize, like
            # TorchBatchNorm's per-layer work — deliberately NOT fusable
            # into one loop because each op depends on the previous result
            for i in range(ops):
                h = x.astype(jnp.float32)
                m = jnp.mean(h, axis=(0, 1))
                v = jnp.mean((h - m) ** 2, axis=(0, 1))
                x = ((h - m) * jax.lax.rsqrt(v + 1e-5)).astype(jnp.bfloat16)
            return x

        @jax.jit
        def many(x):
            return jax.lax.fori_loop(0, iters, lambda i, xx: chain(xx), x)

        jax.block_until_ready(many(x))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(many(x))
            best = min(best, time.perf_counter() - t0)
        per_op = best / iters / ops
        # each chain op reads+writes ~2.5 tensors
        bw_bound = 2.5 * x.size * 2 / 820e9
        print(
            f"C={c:4d}: {per_op * 1e6:7.2f} us/op  "
            f"(bw bound {bw_bound * 1e6:5.2f} us, "
            f"ratio {per_op / bw_bound:5.1f}x)"
        )


if __name__ == "__main__":
    main()
