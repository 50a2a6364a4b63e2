"""Assign-head forward floor experiment (round-4 VERDICT #5).

The r3 roofline (`roofline_r3.md` §2) measured the fused assign-head
forward (`ops/pallas/assign_head.py::_fwd_call_pre`) at 427 us vs a 275 us
FLOP bound at the canonical patch shape [4, 5760, 40]->[.., 1140] — 64%.
Two hypotheses were on the table (CLAUDE.md round-3 notes):

(a) lane padding: C=1140 is not a 128 multiple, so the last lane tile is
    108/128 wasted — but Mosaic tiles to 9 lane tiles either way, so
    C=1152 should be the controlled comparison (same tile count, zero
    padding waste);
(b) the in-kernel softmax/normalize VPU work (exp + rsqrt + reduces over
    C=1140 per row) does not overlap the MXU enough at this arithmetic
    intensity.

This script isolates them with three standalone kernels at the exact
production block specs (PrefetchScalarGridSpec, same BlockSpecs/tiles):

  full     — L2norm + 2 matmuls + softmax + row mask (the production body)
  mm_only  — the 2 matmuls alone (pure MXU at identical DMA pattern)
  sm_only  — normalize+softmax+mask alone on a resident logits block

over C in {1024, 1140, 1152} x row tile in {128, 384, 576}, plus the
pure-XLA [B*N, F12+C] @ [F12+C, C] matmul as the MXU reference. full -
mm_only is the price of the fused tail; mm_only vs the FLOP bound is the
DMA/scheduling gap; the C sweep separates padding from everything else.

Fiction guards (CLAUDE.md): random inputs, loop-counter folded into the
input so nothing hoists, results accumulated into the carry, best-of-3,
device-side fori_loop chains so the ~4 ms axon dispatch is excluded.

Usage: python benchmarks/ah_floor.py [iters=60]
"""

from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

B, N, F12 = 4, 5760, 40


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    import bench

    bench.wait_for_backend()
    bench.enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from cgcnet_tpu.ops.pallas.assign_head import _rnorm_h

    def body_full(nn_ref, x12_ref, p_ref, k12_ref, k3f_ref, const_ref,
                  s_ref, *, tile):
        bi = pl.program_id(0)
        ri = pl.program_id(1)
        _, h = _rnorm_h(p_ref[0].astype(jnp.float32))
        acc = jnp.dot(x12_ref[0], k12_ref[...],
                      preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(h.astype(p_ref.dtype), k3f_ref[...],
                            preferred_element_type=jnp.float32)
        logits = acc + const_ref[0][None, :]
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        s = e / jnp.sum(e, axis=-1, keepdims=True)
        rows = ri * tile + jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
        s_ref[0] = (s * (rows < nn_ref[bi]).astype(jnp.float32)).astype(
            s_ref.dtype)

    def body_mm(nn_ref, x12_ref, p_ref, k12_ref, k3f_ref, const_ref,
                s_ref, *, tile):
        del nn_ref
        acc = jnp.dot(x12_ref[0], k12_ref[...],
                      preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(p_ref[0], k3f_ref[...],
                            preferred_element_type=jnp.float32)
        s_ref[0] = (acc + const_ref[0][None, :]).astype(s_ref.dtype)

    def body_sm(nn_ref, x12_ref, p_ref, k12_ref, k3f_ref, const_ref,
                s_ref, *, tile):
        del x12_ref, k12_ref, k3f_ref
        bi = pl.program_id(0)
        ri = pl.program_id(1)
        _, h = _rnorm_h(p_ref[0].astype(jnp.float32))
        logits = h + const_ref[0][None, :]
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        s = e / jnp.sum(e, axis=-1, keepdims=True)
        rows = ri * tile + jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
        s_ref[0] = (s * (rows < nn_ref[bi]).astype(jnp.float32)).astype(
            s_ref.dtype)

    def make_call(body, c, tile):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, N // tile),
            in_specs=[
                pl.BlockSpec((1, tile, F12), lambda bi, ri, nn: (bi, ri, 0)),
                pl.BlockSpec((1, tile, c), lambda bi, ri, nn: (bi, ri, 0)),
                pl.BlockSpec((F12, c), lambda bi, ri, nn: (0, 0)),
                pl.BlockSpec((c, c), lambda bi, ri, nn: (0, 0)),
                pl.BlockSpec((1, c), lambda bi, ri, nn: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, tile, c), lambda bi, ri, nn: (bi, ri, 0)),
        )
        call = pl.pallas_call(
            functools.partial(body, tile=tile),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, N, c), jnp.bfloat16),
            cost_estimate=pl.CostEstimate(
                flops=2 * B * N * c * (F12 + c),
                bytes_accessed=B * N * (F12 + 2 * c) * 2,
                transcendentals=B * N * (c + 1),
            ),
        )
        return call

    def time_fn(fn, *xs):
        """best-of-3 of an iters-long device chain; returns us/call."""
        @jax.jit
        def chain(*xs):
            def step(i, carry):
                p, acc = carry
                # fold the counter in so the call can't hoist out of the loop
                p = p + (i * jnp.bfloat16(1e-8))
                out = fn(p, *xs[1:])
                return (p, acc + jnp.sum(out.astype(jnp.float32)))

            return jax.lax.fori_loop(
                0, iters, step, (xs[0], jnp.float32(0)))

        out = jax.block_until_ready(chain(*xs))
        assert not bool(jnp.isnan(out[1])), "NaN accumulator — fiction risk"
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(chain(*xs))
            best = min(best, time.perf_counter() - t0)
        return best / iters * 1e6

    results = {}
    key = jax.random.key(0)
    for c in (1024, 1140, 1152):
        ks = jax.random.split(jax.random.fold_in(key, c), 5)
        p = jax.random.normal(ks[0], (B, N, c), jnp.float32).astype(jnp.bfloat16)
        x12 = jax.random.normal(ks[1], (B, N, F12), jnp.float32).astype(jnp.bfloat16)
        k12 = jax.random.normal(ks[2], (F12, c), jnp.float32).astype(jnp.bfloat16) * 0.1
        k3f = jax.random.normal(ks[3], (c, c), jnp.float32).astype(jnp.bfloat16) * 0.03
        const = jax.random.normal(ks[4], (1, c), jnp.bfloat16)
        nn = jnp.full((B,), N - 7, jnp.int32)

        flops = 2 * B * N * c * (F12 + c)
        flop_bound_us = flops / 197e12 * 1e6

        # pure-XLA MXU reference on the concatenated form
        xc = jnp.concatenate(
            [x12.reshape(B * N, F12), p.reshape(B * N, c)], axis=1)
        kc = jnp.concatenate([k12, k3f], axis=0)
        xla_us = time_fn(lambda a, k: jnp.dot(a, k), xc, kc)

        for tile in (128, 384, 576):
            row = {}
            for name, body in (("full", body_full), ("mm_only", body_mm),
                               ("sm_only", body_sm)):
                call = make_call(body, c, tile)
                row[name] = round(time_fn(
                    lambda pp, *rest: call(nn, x12, pp, k12, k3f, const),
                    p), 1)
            results[f"C{c}_t{tile}"] = {
                **row,
                "flop_bound_us": round(flop_bound_us, 1),
                "xla_mm_us": round(xla_us, 1),
                "full_vs_bound": round(flop_bound_us / row["full"], 3),
            }
            print(f"C={c} tile={tile}: {results[f'C{c}_t{tile}']}")

    out = Path(__file__).parent / "ah_floor_r4.json"
    out.write_text(json.dumps(results, indent=1) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
