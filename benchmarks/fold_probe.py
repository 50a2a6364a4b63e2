"""Standalone probe: the assign-softmax-VJP fold at patch shape.

profile_bf16_r3b charges fusion.1832 (dl fold: reads s,g -> writes dl +
f32 rowsum) 565 us/step at [4,5760,1140] — ~12x its HBM bound — while the
slide-shape twin (fusion.2710 at [1,100352,1140]) runs AT bound. Variants:
  batched   — exactly the production form [B,N,C], f32 intermediates
  flat      — same math on [B*N, C] (reshape first)
  flat_bf16 — flat with bf16-only arithmetic (rowsum in f32)
"""
import sys, time
sys.path.insert(0, "/root/repo")
import bench
bench.wait_for_backend()
bench.enable_compile_cache()
import jax
import jax.numpy as jnp

B, N, C = 4, 5760, 1140
iters = 100

def fold_batched(s, g):
    gf = g.astype(jnp.float32)
    sf = s.astype(jnp.float32)
    dl32 = sf * (gf - jnp.sum(gf * sf, axis=-1, keepdims=True))
    return dl32.astype(s.dtype), jnp.sum(dl32, axis=(0, 1))

def fold_flat(s, g):
    s2, g2 = s.reshape(-1, C), g.reshape(-1, C)
    gf = g2.astype(jnp.float32)
    sf = s2.astype(jnp.float32)
    dl32 = sf * (gf - jnp.sum(gf * sf, axis=-1, keepdims=True))
    return dl32.astype(s.dtype).reshape(s.shape), jnp.sum(dl32, axis=0)

def fold_flat_bf16(s, g):
    s2, g2 = s.reshape(-1, C), g.reshape(-1, C)
    rs = jnp.sum((g2 * s2).astype(jnp.float32), axis=-1, keepdims=True)
    dl = s2 * (g2 - rs.astype(s.dtype))
    return dl.reshape(s.shape), jnp.sum(dl.astype(jnp.float32), axis=0)

def timeit(fn, s, g):
    @jax.jit
    def chain(s, g):
        def body(i, carry):
            g2, acc = carry
            g2 = g2 + (i * jnp.bfloat16(1e-8))
            dl, dconst = fn(s, g2)
            return (g2, acc + jnp.sum(dl.astype(jnp.float32)) + dconst[0])
        return jax.lax.fori_loop(0, iters, body, (g, jnp.float32(0)))
    out = jax.block_until_ready(chain(s, g))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(chain(s, g))
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e6

key = jax.random.key(0)
s = jax.nn.softmax(jax.random.normal(key, (B, N, C), jnp.float32)).astype(jnp.bfloat16)
g = jax.random.normal(jax.random.fold_in(key, 1), (B, N, C), jnp.float32).astype(jnp.bfloat16)
bw_bound = 3 * B * N * C * 2 / 820e9 * 1e6
print(f"HBM bound (3 bf16 passes): {bw_bound:.0f} us")
for name, fn in (("batched", fold_batched), ("flat", fold_flat),
                 ("flat_bf16", fold_flat_bf16)):
    print(f"{name:10s}: {timeit(fn, s, g):7.1f} us")
