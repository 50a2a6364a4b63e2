"""MegaCGCNet: whole-slide inference/training with node-sharded stage 1.

The reference can never see a whole slide — it bounds every graph to
ratio*11404 nodes by subsampling (dataflow/data.py:195-225). This module runs
the *same trained CGCNet parameters* over an unsampled 100k+-nucleus slide
graph, node-partitioned over the mesh's ``graph`` axis (BASELINE.json
configs 4-5):

- stage-1 convolutions aggregate with capacity-padded all_to_all halo
  exchange (parallel/mega_graph.py);
- BatchNorm uses cross-shard statistics via psum (the TPU-native
  SyncBatchNorm — SURVEY.md §2.3 P6);
- DiffPool contracts to the replicated cluster space with a single psum:
  x_pool = Σ_shards S_loc^T embed_loc, adj_pool = Σ_shards S_loc^T (A S)_loc;
- pooled stages 2-3 and the head run replicated (they are tiny: 1140 -> 114
  clusters).

Parameters are the CGCNet flax tree verbatim, so patch-trained checkpoints
drive slide-level inference unchanged (parity test:
tests/test_mega_model.py::test_matches_cellgraph_model).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cgcnet_tpu.config import ModelConfig
from cgcnet_tpu.ops.ell import EPS, ell_gather_sum
from cgcnet_tpu.parallel.mega_graph import (
    ShardedGraphPartition,
    _halo_exchange,
)


from flax import struct


@struct.dataclass
class MegaInputs:
    """Device-ready sharded slide graph (leading dims sharded over 'graph').
    A pytree — can cross jit boundaries directly. The optional BSR fields
    (from mega_graph.build_bsr_tables) switch stage-1 aggregation to the
    gather-free Pallas MXU kernel with halo columns as extra tiles."""

    x: jax.Array           # f32[N, F]
    nbr_remap: jax.Array   # i32[N, K]
    nbr_mask: jax.Array    # f32[N, K]
    req_idx: jax.Array     # i32[D*D, P]
    req_mask: jax.Array    # f32[D*D, P]
    valid: jax.Array       # f32[N] real-node mask
    blk_cols: jax.Array | None = None    # i32[D*R, M]
    blk_mask: jax.Array | None = None    # f32[D*R, M]
    nbr_t: jax.Array | None = None       # i32[D*NC, KT]
    mask_t: jax.Array | None = None      # f32[D*NC, KT]
    blk_cols_t: jax.Array | None = None  # i32[D*RC, MT]
    blk_mask_t: jax.Array | None = None  # f32[D*RC, MT]
    # banded-window bases per direction ((0,)-shaped sentinel = use the
    # streamed kernel; see bsr_kernel.bsr_matmul_banded)
    win_base: jax.Array | None = None    # i32[D, R // G_BAND] or [D, 0]
    win_base_t: jax.Array | None = None  # i32[D, RC // G_BAND] or [D, 0]
    # halo-window bases for the forward direction ((D, 0) sentinel = halo
    # rides the resident tail / not banded; bsr_kernel._banded_halo_kernel)
    win_halo: jax.Array | None = None    # i32[D, R // G_BAND] or [D, 0]
    # block values materialized ONCE per slide (prepare_mega_inputs): the
    # slide adjacency is constant across train steps, so the per-step build
    # (2.15 ms at 100k nuclei) and the step-entry relayout copies of the
    # [NC, KT] transpose ELL tables (2x488 MB at 1M — lane-padding 16->128)
    # both leave the hot loop. int8: the mega operator is binary.
    vals: jax.Array | None = None        # i8[D*R, M, T, T]
    vals_t: jax.Array | None = None      # i8[D*RC, MT, T, T]


def prepare_mega_inputs(
    x: np.ndarray,
    part: ShardedGraphPartition,
    mesh: Mesh,
    n_real: int | None = None,
    bsr=None,
    put=None,
) -> MegaInputs:
    """``bsr``: optional mega_graph.ShardedBsrTables enabling the Pallas
    block-sparse aggregation path.

    ``put(host_array, sharding) -> jax.Array`` overrides device placement —
    required under multi-process meshes, where each process only holds its
    addressable shards and must assemble globals via
    ``jax.make_array_from_process_local_data`` instead of ``device_put``
    (exercised by tests/mh_worker.py's cross-process mega scenario)."""
    n, k = part.nbr_remap.shape[0] * part.nbr_remap.shape[1], part.nbr_remap.shape[2]
    nn = part.nbr_remap.shape[0] * part.nbr_remap.shape[1]
    spec = NamedSharding(mesh, P("graph"))
    if put is None:
        put = lambda a, s=None: jax.device_put(jnp.asarray(a), spec)
    else:
        _user_put = put
        put = lambda a: _user_put(np.asarray(a), spec)
    valid = np.zeros(nn, np.float32)
    valid[: (n_real if n_real is not None else nn)] = 1.0
    extra = {}
    if bsr is not None:
        d = part.num_shards
        _zero_win = np.zeros((d, 0), np.int32)
        extra = {
            "blk_cols": put(bsr.blk_cols.reshape(-1, bsr.blk_cols.shape[-1])),
            "blk_mask": put(bsr.blk_mask.reshape(-1, bsr.blk_mask.shape[-1])),
            "nbr_t": put(bsr.nbr_t.reshape(-1, bsr.nbr_t.shape[-1])),
            "mask_t": put(bsr.mask_t.reshape(-1, bsr.mask_t.shape[-1])),
            "blk_cols_t": put(
                bsr.blk_cols_t.reshape(-1, bsr.blk_cols_t.shape[-1])
            ),
            "blk_mask_t": put(
                bsr.blk_mask_t.reshape(-1, bsr.blk_mask_t.shape[-1])
            ),
            # (D, 0) sentinel = direction not banded (streamed kernel)
            "win_base": put(
                bsr.win_base if getattr(bsr, "win_base", None) is not None
                else _zero_win
            ),
            "win_base_t": put(
                bsr.win_base_t
                if getattr(bsr, "win_base_t", None) is not None
                else _zero_win
            ),
            "win_halo": put(
                bsr.win_halo
                if getattr(bsr, "win_halo", None) is not None
                else _zero_win
            ),
        }

        # materialize the block values ONCE per slide — see MegaInputs.vals
        from cgcnet_tpu.ops.pallas import bsr_kernel as _bk

        def _build_shard(nbr_remap, nbr_mask, blk_cols, blk_mask,
                         nbr_t, mask_t, blk_cols_t, blk_mask_t):
            ns = nbr_remap.shape[0]
            row = jnp.arange(ns)
            off = nbr_mask * (nbr_remap != row[:, None]).astype(
                nbr_mask.dtype
            )
            v = _bk.bsr_build_blocks(
                nbr_remap[None], off[None], blk_cols[None], blk_mask[None],
                jnp.int8,
            )
            # the transpose blocks may cover LOCAL rows only (hybrid halo
            # transpose, build_bsr_tables) — slice the ELL lists to match
            tr = blk_cols_t.shape[0] * 128
            vt = _bk.bsr_build_blocks(
                nbr_t[None, :tr], mask_t[None, :tr], blk_cols_t[None],
                blk_mask_t[None], jnp.int8,
            )
            return v[0], vt[0]

        was_interp = _bk._INTERPRET
        _bk.set_interpret(was_interp or jax.default_backend() != "tpu")
        try:
            vals, vals_t = jax.shard_map(
                _build_shard, mesh=mesh,
                in_specs=(P("graph"),) * 8,
                out_specs=(P("graph"), P("graph")),
                check_vma=False,  # pallas_call outputs carry no vma info
            )(
                put(part.nbr_remap.reshape(nn, k)),
                put(part.nbr_mask.reshape(nn, k)),
                extra["blk_cols"], extra["blk_mask"],
                extra["nbr_t"], extra["mask_t"],
                extra["blk_cols_t"], extra["blk_mask_t"],
            )
        finally:
            _bk.set_interpret(was_interp)
        extra["vals"], extra["vals_t"] = vals, vals_t
    return MegaInputs(
        x=put(x),
        nbr_remap=put(part.nbr_remap.reshape(nn, k)),
        nbr_mask=put(part.nbr_mask.reshape(nn, k)),
        req_idx=put(part.req_idx.reshape(-1, part.halo_capacity)),
        req_mask=put(part.req_mask.reshape(-1, part.halo_capacity)),
        valid=put(valid),
        **extra,
    )


# ---------------------------------------------------------------------------
# functional layers over the CGCNet param tree
# ---------------------------------------------------------------------------

def _linear(p, h):
    # params live in f32; matmuls run at the activation dtype (bf16 under
    # model.compute_dtype=bfloat16) — same cast-at-use policy as nn/blocks.py
    out = h @ p["kernel"].astype(h.dtype)
    if "bias" in p:
        out = out + p["bias"].astype(h.dtype)
    return out


import functools as _functools


@_functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _chunked_pool_contract(s, pembed, a_s, chunk: int):
    """(S^T pembed, S^T A S) with a hand-chunked backward.

    The direct einsum pair's reverse-mode materializes THREE [N, C]-class
    ds contributions plus their sum simultaneously, and a first
    loop-accumulation rewrite still left the d(A S) cotangent triple-
    buffered (autodiff dus accumulator + XLA's remat-compressed copy + the
    adjacency backward's scale multiply — ~4.3 GB of the 16.5 GB 1M-nuclei
    peak, benchmarks/slide_step_r4.json). This custom VJP's backward:

    - d(A S) = S @ ct_adj as ONE matmul output — no accumulator, no
      compressed copy, and the _ShardedAdj scale-on-cotangent multiply can
      fuse into the matmul epilogue;
    - ds assembled by one fori_loop writing
      ds[chunk] = pembed_c @ ct_x^T + a_s_c @ ct_adj^T
      into a single buffer (both products per chunk in one expression);
    - d pembed = S @ ct_x ([N, F] — small).

    Backward working set: s + a_s (residuals) + ds + d(A S), the inherent
    minimum for this contraction pair."""
    return (
        jnp.einsum("nc,nf->cf", s, pembed),
        jnp.einsum("nc,nd->cd", s, a_s),
    )


def _cpc_fwd(s, pembed, a_s, chunk):
    return _chunked_pool_contract(s, pembed, a_s, chunk), (s, pembed, a_s)


def _cpc_bwd(chunk, res, cts):
    s, pembed, a_s = res
    ct_x, ct_adj = cts
    dt = s.dtype
    d_a_s = s @ ct_adj.astype(dt)
    d_pembed = s @ ct_x.astype(dt)
    n = s.shape[0]
    ch = min(chunk, n)
    ctx_t = ct_x.astype(dt).T
    cta_t = ct_adj.astype(dt).T

    # STATIC chunk offsets + one concatenate, not a fori_loop over
    # dynamic-update-slice: the dus form needs a zeros-initialized [N, C]
    # accumulator that XLA materialized as a 2.13 GB broadcast constant at
    # the 1M peak (it cannot prove the dynamic updates fully cover the
    # init); concat parts write straight into the single output buffer.
    parts = []
    for lo in range(0, n, ch):
        size = min(ch, n - lo)
        pc = jax.lax.slice_in_dim(pembed, lo, lo + size, axis=0)
        ac = jax.lax.slice_in_dim(a_s, lo, lo + size, axis=0)
        parts.append((pc @ ctx_t + ac @ cta_t).astype(dt))
    ds = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
    return ds, d_pembed, d_a_s


_chunked_pool_contract.defvjp(_cpc_fwd, _cpc_bwd)


def _pa_primal(axis, vals, blk_cols, win, vals_t, blk_cols_t, win_t,
               win_halo, nbr_t_h, mask_t_h, scale, self_w, pool_ratio,
               req_idx, req_mask, s, pembed):
    from cgcnet_tpu.ops.ell import bsr_local_matmul
    from cgcnet_tpu.ops.pallas.bsr_kernel import (
        BAND_MIN_F, bsr_matmul_banded,
    )

    halo = _halo_exchange(s, req_idx, req_mask, axis)
    nc = blk_cols_t.shape[1] * 128 + (
        nbr_t_h.shape[0] if nbr_t_h is not None else 0
    )
    hp = nc - s.shape[0] - halo.shape[0]
    if hp:
        halo = jnp.concatenate(
            [halo, jnp.zeros((hp, halo.shape[1]), halo.dtype)], 0
        )
    f = s.shape[1]
    # the in-kernel _ShardedAdj epilogue (bsr_matmul_banded epilogue_sw=)
    # was MEASURED A REGRESSION here: 36.04 -> 36.9 ms at 100k — the
    # forward leg's band-window DMA is already the binding stream, so the
    # +231 MB s re-read at the output offset costs more than the fused
    # scale/self_w pass saves (add_bitcast.12 is 83% of ITS bound). Keep
    # the composable epilogue; the kernel capability stays (tested,
    # hardware-probed) for shapes where the leg is MXU-bound.
    if False and win.shape[-1] and f >= BAND_MIN_F and f % 128 == 0 \
            and jnp.dtype(s.dtype).itemsize <= 2:
        sw = (
            jnp.zeros((s.shape[0], 128), s.dtype)
            .at[:, 0].set(scale).at[:, 1].set(self_w)
        )
        hw = win_halo if win_halo.shape[-1] else None
        a_s = bsr_matmul_banded(
            vals, blk_cols, win, s[None], ns_rows=s.shape[0],
            halo=halo[None], halo_win=hw, epilogue_sw=sw[None],
        )[0]
    else:
        agg = bsr_local_matmul(
            vals, blk_cols, win, vals_t, blk_cols_t, win_t, s, halo,
            win_halo, nbr_t_h, mask_t_h,
        )
        a_s = scale[:, None] * agg + self_w[:, None] * s
    return (
        jnp.einsum("nc,nf->cf", s, pembed),
        jnp.einsum("nc,nd->cd", s, a_s),
        a_s,
    )


@_functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _pool_aggregate(axis, vals, blk_cols, win, vals_t, blk_cols_t, win_t,
                    win_halo, nbr_t_h, mask_t_h, scale, self_w, pool_ratio,
                    req_idx, req_mask, s, pembed):
    """(S^T pembed, S^T A S) with the aggregation A S INSIDE the VJP
    boundary — the banded-transpose fast path (round 5).

    Composable autodiff assembles ct_s as a separate full-width pass over
    FOUR [N, C]-class operands (the two pool-contraction products, the
    self-loop term, and the A^T leg's output — fusion.2340, 2.04 ms at
    100k nuclei, 83% of its 1.39 GB bound). Owning the whole chain lets
    the backward hand the summed ds contributions to the banded transpose
    kernel as its in-kernel row accumulator (bsr_matmul_banded ``acc``),
    so the A^T output is never re-read and ct_s is written exactly once.

    Engaged by ``pool1_segment`` only when the banded transpose is
    available (win_t nonbare, lane-multiple C, <=2-byte activations) and
    the assign tail is unchunked; all other paths keep the composable
    ``adj(s)`` + ``_chunked_pool_contract`` form. Matches the DiffPool
    contraction pair at /root/reference/model/network.py:206-207 at slide
    scale."""
    x_pool, adj_pool, _ = _pa_primal(
        axis, vals, blk_cols, win, vals_t, blk_cols_t, win_t, win_halo,
        nbr_t_h, mask_t_h, scale, self_w, pool_ratio, req_idx, req_mask,
        s, pembed,
    )
    return x_pool, adj_pool


def _pa_fwd(axis, vals, blk_cols, win, vals_t, blk_cols_t, win_t,
            win_halo, nbr_t_h, mask_t_h, scale, self_w, pool_ratio,
            req_idx, req_mask, s, pembed):
    x_pool, adj_pool, a_s = _pa_primal(
        axis, vals, blk_cols, win, vals_t, blk_cols_t, win_t, win_halo,
        nbr_t_h, mask_t_h, scale, self_w, pool_ratio, req_idx, req_mask,
        s, pembed,
    )
    res = (vals, blk_cols, win, vals_t, blk_cols_t, win_t, win_halo,
           nbr_t_h, mask_t_h, scale, self_w, pool_ratio, req_idx, req_mask,
           s, pembed, a_s)
    return (x_pool, adj_pool), res


def _pa_bwd(axis, res, cts):
    from cgcnet_tpu.ops.ell import ell_gather_sum
    from cgcnet_tpu.ops.pallas.bsr_kernel import bsr_matmul_banded

    (vals, blk_cols, win, vals_t, blk_cols_t, win_t, win_halo, nbr_t_h,
     mask_t_h, scale, self_w, pool_ratio, req_idx, req_mask, s, pembed,
     a_s) = res
    ct_x, ct_adj = cts
    dt = s.dtype
    ctx = ct_x.astype(dt)
    cta = ct_adj.astype(dt)
    d_pembed = s @ ctx
    d_a_s = s @ cta                                       # [N, C]
    g = scale[:, None] * d_a_s
    # every ct_s contribution EXCEPT the A^T leg, summed once — this is
    # the kernel's acc operand. The self-loop term uses
    # ratio * g == self_w * d_a_s (pool_ratio, exact by construction) so
    # g is d_a_s's ONLY consumer and the scale multiply fuses into the
    # matmul epilogue instead of a standalone full-width pass.
    acc = pembed @ ctx.T + a_s @ cta.T + pool_ratio[:, None] * g
    # pool1_segment only routes here when the banded transpose engages;
    # with acc the kernel emits (local rows, tail rows) as SEPARATE
    # outputs, so neither consumer needs a materialized slice
    res_t = bsr_matmul_banded(
        vals_t, blk_cols_t, win_t, g[None], ns_rows=g.shape[0],
        acc=acc[None],
    )
    if isinstance(res_t, (tuple, list)):
        ds, d_halo = res_t[0][0], res_t[1][0]
    else:
        ds, d_halo = res_t[0], None
    if nbr_t_h is not None and nbr_t_h.shape[0]:
        # hybrid transpose: halo rows' in-edges as an ELL gather
        # (ops/ell._bsr_local_bwd's contract)
        d_halo = ell_gather_sum(
            nbr_t_h[None], mask_t_h.astype(dt)[None], g[None]
        )[0]
    if d_halo is not None and d_halo.shape[0]:
        # route the halo rows' cotangent back to their owner shards
        # through the halo-exchange transpose (scatter-add into local rows
        # + the reverse all_to_all — the composable path's autodiff)
        halo_nat, hx_vjp = jax.vjp(
            lambda h_: _halo_exchange(h_, req_idx, req_mask, axis), s
        )
        ds = ds + hx_vjp(
            d_halo[: halo_nat.shape[0]].astype(halo_nat.dtype)
        )[0]
    z = jax.tree.map(
        jnp.zeros_like,
        (vals, blk_cols, win, vals_t, blk_cols_t, win_t),
    )
    z_hw = None if win_halo is None else jnp.zeros_like(win_halo)
    z_nh = None if nbr_t_h is None else jnp.zeros_like(nbr_t_h)
    z_mh = None if mask_t_h is None else jnp.zeros_like(mask_t_h)
    return (*z, z_hw, z_nh, z_mh, jnp.zeros_like(scale),
            jnp.zeros_like(self_w), jnp.zeros_like(pool_ratio),
            jnp.zeros_like(req_idx),
            jnp.zeros_like(req_mask), ds, d_pembed)


_pool_aggregate.defvjp(_pa_fwd, _pa_bwd)


def _act(name):
    from cgcnet_tpu.nn.layers import activation

    return activation(name)


def _bn_moments(stats, h, valid, axis, train: bool, replicated: bool = False):
    """(mean, var, upd) of the cross-shard psum BatchNorm; ``upd`` carries
    the torch-momentum-0.1 running-stat update in train mode (biased batch
    mean, unbiased variance) so slide training tracks running statistics
    like TorchBatchNorm does.

    ``replicated``: the post-pool dense stages compute IDENTICAL h on every
    shard, so the psum'd count is D x the real row count — mean/var cancel
    the factor but Bessel's correction must use the true count."""
    upd = None
    if train:
        m = valid[:, None]
        cnt = jax.lax.psum(jnp.sum(m), axis)
        mean = jax.lax.psum(jnp.sum(h * m, 0), axis) / cnt
        var = jax.lax.psum(jnp.sum((h - mean) ** 2 * m, 0), axis) / cnt
        true_cnt = cnt / jax.lax.psum(1.0, axis) if replicated else cnt
        unbiased = var * true_cnt / jnp.maximum(true_cnt - 1.0, 1.0)
        old_mean = stats["mean"] if stats else jnp.zeros_like(mean)
        old_var = stats["var"] if stats else jnp.ones_like(var)
        upd = {
            "mean": 0.9 * old_mean + 0.1 * mean,
            "var": 0.9 * old_var + 0.1 * unbiased,
        }
    else:
        mean, var = stats["mean"], stats["var"]
    return mean, var, upd


def _bn(p, stats, h, valid, axis, train: bool, replicated: bool = False):
    """BatchNorm over all real nodes of the global graph (psum stats).
    Statistics and the normalization itself run in f32 (the bf16 precision
    policy's f32 island — CLAUDE.md / nn.layers.TorchBatchNorm)."""
    h32 = h.astype(jnp.float32)
    mean, var, upd = _bn_moments(stats, h32, valid, axis, train, replicated)
    out = (h32 - mean) * jax.lax.rsqrt(var + 1e-5) * p["scale"] + p["bias"]
    return out.astype(h.dtype), upd


def _gat_conv(gp, h, agg, valid, cfg: ModelConfig):
    """Multi-head dot-product attention conv over sharded or dense cluster
    nodes — the functional twin of nn.layers.GATConv (same params q/k/v,
    same f32 softmax over [self ++ slots]).

    Sharded (``agg`` is _ShardedAdj): k/v are computed locally, halo-exchanged
    like any stage-1 feature tensor, and neighbour rows gathered through the
    remapped ELL lists — the "own halo score exchange" the forward previously
    refused to fake.
    Dense (``agg`` carries .dense_adj): full score matrix masked by adjacency
    support, exactly like GATConv's DenseAdj branch (unbatched).
    """
    heads = cfg.gat_heads
    q = _linear(gp["q"], h)
    k = _linear(gp["k"], h)
    v = _linear(gp["v"], h)
    feats = q.shape[-1]
    assert feats % heads == 0, (feats, heads)
    d = feats // heads
    scale = 1.0 / (d ** 0.5)
    n = h.shape[0]
    neg = jnp.finfo(jnp.float32).min
    if hasattr(agg, "concat_halo"):
        nbr = agg.inp.nbr_remap                     # [N, K]
        kk = nbr.shape[1]
        gk = agg.concat_halo(k)[nbr]                # [N, K, F]
        gv = agg.concat_halo(v)[nbr]
        qh = q.reshape(n, heads, d)
        e_nbr = jnp.einsum(
            "nhd,nkhd->nkh", qh, gk.reshape(n, kk, heads, d),
            preferred_element_type=jnp.float32,
        )
        e_self = jnp.einsum(
            "nhd,nhd->nh", qh, k.reshape(n, heads, d),
            preferred_element_type=jnp.float32,
        )[:, None]
        scores = (
            jnp.concatenate([e_self, e_nbr], axis=1).astype(jnp.float32)
            * scale
        )
        smask = jnp.concatenate(
            [jnp.ones((n, 1), jnp.float32),
             agg.off_mask.astype(jnp.float32)], -1
        )[..., None]
        scores = jnp.where(smask > 0, scores, neg)
        m = jnp.max(scores, axis=1, keepdims=True)
        ex = jnp.exp(scores - jax.lax.stop_gradient(m)) * smask
        alpha = (ex / jnp.sum(ex, 1, keepdims=True)).astype(h.dtype)
        out = (
            alpha[:, 0, :, None] * v.reshape(n, heads, d)
            + jnp.einsum(
                "nkh,nkhd->nhd", alpha[:, 1:], gv.reshape(n, kk, heads, d),
                preferred_element_type=h.dtype,
            )
        ).reshape(n, feats)
    else:
        aa = agg.dense_adj
        logits = jnp.einsum(
            "ihd,jhd->hij", q.reshape(n, heads, d), k.reshape(n, heads, d),
            preferred_element_type=jnp.float32,
        ) * scale
        support = (aa > 0)[None]
        logits = jnp.where(support, logits.astype(jnp.float32), neg)
        alpha = jax.nn.softmax(logits, axis=-1).astype(h.dtype)
        alpha = alpha * (jnp.sum(aa, -1) > 0)[None, :, None].astype(h.dtype)
        out = jnp.einsum(
            "hij,jhd->ihd", alpha, v.reshape(n, heads, d),
            preferred_element_type=h.dtype,
        ).reshape(n, feats)
    return out * valid[:, None]


def _paired_layers12(
    params, stats, name_e, name_p, x, agg, valid, cfg: ModelConfig, axis,
    train, stats_out: dict | None, replicated: bool = False,
):
    """Layers 1-2 of an (embed, pool) SAGE block pair over ONE shared
    aggregation stream — the functional twin of nn/blocks.paired_blocks'
    dual path. Each layer runs one matvec (A @ [h_e | h_p]), one merged
    lin matmul (shared-input kernel concat at layer 1, block-diagonal at
    layer 2 — exact zeros, bit-identical columns) and one
    l2norm/valid/act/BN chain over the concatenated channels (per-channel
    BN statistics and per-stream row norms don't mix across the concat).
    Halves both the sparse-aggregation launches and the latency-bound
    [N, <=40] tail kernels vs running the blocks independently.

    Returns ([e1, e2], [p1, p2], agg3_e, agg3_p) where agg3_* are the
    slices of the shared A @ [e2 | p2] that the two conv3's consume
    (pass to ``_stage1_block(..., pre12=..., pre_agg3=...)``).
    Caller gates on SAGE + BN + equal hidden widths.
    """
    pe, pp = params[name_e], params[name_p]
    act = _act(cfg.activation)
    f = pe["gcn1"]["lin"]["kernel"].shape[1]

    def dual_lin(i, ah, shared):
        dt = ah.dtype
        denom = jnp.clip(agg.rowsum(), min=1.0)[:, None].astype(dt)
        le, lp = pe[f"gcn{i}"]["lin"], pp[f"gcn{i}"]["lin"]
        ke, kp = le["kernel"], lp["kernel"]
        if shared:
            k = jnp.concatenate([ke, kp], axis=1)
        else:
            z_ep = jnp.zeros((ke.shape[0], kp.shape[1]), ke.dtype)
            z_pe = jnp.zeros((kp.shape[0], ke.shape[1]), kp.dtype)
            k = jnp.concatenate(
                [jnp.concatenate([ke, z_ep], 1),
                 jnp.concatenate([z_pe, kp], 1)], 0,
            )
        out = (ah / denom) @ k.astype(dt)
        if "bias" in le or "bias" in lp:
            be = le.get("bias", jnp.zeros((f,), jnp.float32))
            bp = lp.get("bias", jnp.zeros((f,), jnp.float32))
            out = out + jnp.concatenate([be, bp]).astype(dt)
        return out

    def dual_tail(i, cat):
        from cgcnet_tpu.nn.blocks import dual_l2norm_2d

        h = dual_l2norm_2d(cat, f).astype(cat.dtype)
        h = h * valid[:, None].astype(cat.dtype)
        h = act(h)
        st_e = (stats or {}).get(name_e, {}).get(f"bn{i}")
        st_p = (stats or {}).get(name_p, {}).get(f"bn{i}")
        st = None
        if st_e is not None and st_p is not None:
            st = {
                key: jnp.concatenate([st_e[key], st_p[key]])
                for key in ("mean", "var")
            }
        h32 = h.astype(jnp.float32)
        mean, var, upd = _bn_moments(st, h32, valid, axis, train, replicated)
        scale = jnp.concatenate([pe[f"bn{i}"]["scale"], pp[f"bn{i}"]["scale"]])
        bias = jnp.concatenate([pe[f"bn{i}"]["bias"], pp[f"bn{i}"]["bias"]])
        out = (
            (h32 - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
        ).astype(h.dtype)
        if upd is not None and stats_out is not None:
            stats_out.setdefault(name_e, {})[f"bn{i}"] = {
                key: v[:f] for key, v in upd.items()
            }
            stats_out.setdefault(name_p, {})[f"bn{i}"] = {
                key: v[f:] for key, v in upd.items()
            }
        return out

    cat1 = dual_tail(1, dual_lin(1, agg(x), shared=True))
    cat2 = dual_tail(2, dual_lin(2, agg(cat1), shared=False))
    agg3 = agg(cat2)
    return (
        [cat1[:, :f], cat2[:, :f]],
        [cat1[:, f:], cat2[:, f:]],
        agg3[:, :f],
        agg3[:, f:],
    )


def _stage1_block(
    params, stats, name, x, agg, valid, cfg: ModelConfig, axis, train,
    lin: bool, stats_out: dict | None = None, replicated: bool = False,
    pre12=None, pre_agg3=None,
):
    """GNN block over sharded nodes; ``agg`` maps h -> A @ h.

    ``pre12``: layer-1/2 outputs already computed by the paired dual-stream
    path (``_paired_layers12``) — the loop then runs only conv3, consuming
    ``pre_agg3`` (the shared A @ [h2_e | h2_p] slice) instead of its own
    aggregation. The conv3 tail (fold3 / concat / lin) is unchanged."""
    p, s = params[name], (stats or {}).get(name, {})
    act = _act(cfg.activation)
    # fold bn3's affine into the lin kernel for pooling blocks (same algebra
    # as nn/blocks.py::finish_folded) — at slide scale every avoided pass
    # over the [N, 1140] assign tensor is HBM-bandwidth won
    fold3 = lin and cfg.bn and cfg.fold_assign_tail
    outs = []
    h = x
    for i in (1, 2, 3):
        if pre12 is not None and i <= 2:
            h = pre12[i - 1]
            outs.append(h)
            continue
        gp = p[f"gcn{i}"]
        if cfg.gcn_name == "GAT":
            out = _gat_conv(gp, h, agg, valid, cfg)
        elif cfg.gcn_name == "SAGE":
            ah = pre_agg3 if (i == 3 and pre_agg3 is not None) else agg(h)
            denom = jnp.clip(agg.rowsum(), min=1.0)[:, None].astype(h.dtype)
            out = _linear(gp["lin"], ah / denom)
            # L2-normalize in f32 (precision-policy island, nn/layers.py)
            out32 = out.astype(jnp.float32)
            norm = jnp.linalg.norm(out32, axis=-1, keepdims=True)
            out = (out32 / jnp.maximum(norm, 1e-12)).astype(h.dtype)
        else:
            ah = pre_agg3 if (i == 3 and pre_agg3 is not None) else agg(h)
            out = _linear(gp["mlp_0"], ah)
            out = act(out)
            out = _linear(gp["mlp_1"], out)
        out = out * valid[:, None]
        out = act(out)
        if cfg.bn and not (fold3 and i == 3):
            out, upd = _bn(
                p[f"bn{i}"], s.get(f"bn{i}"), out, valid, axis, train,
                replicated,
            )
            if upd is not None and stats_out is not None:
                stats_out.setdefault(name, {})[f"bn{i}"] = upd
        h = out
        outs.append(out)
    if fold3:
        h3a = outs[2]  # pre-BN activation (valid-masked)
        dt = h3a.dtype
        mean, var, upd = _bn_moments(
            s.get("bn3"), h3a.astype(jnp.float32), valid, axis, train,
            replicated,
        )
        if upd is not None and stats_out is not None:
            stats_out.setdefault(name, {})["bn3"] = upd
        # fold in f32, matmul at the activation dtype (nn/blocks.py:228-236)
        bp = p["bn3"]
        inv = jax.lax.rsqrt(var + 1e-5) * bp["scale"]
        shift = bp["bias"] - mean * inv
        k = p["lin"]["kernel"]
        split = outs[0].shape[-1] + outs[1].shape[-1]
        k12, k3 = k[:split], k[split:]
        const = shift @ k3 + p["lin"].get("bias", 0.0)
        cat12 = jnp.concatenate(outs[:2], -1)
        out = (
            cat12 @ k12.astype(dt)
            + h3a @ (inv[:, None] * k3).astype(dt)
            + const.astype(dt)
        )
        return out * valid[:, None]
    cat = jnp.concatenate(outs, -1) * valid[:, None]
    if lin:
        cat = _linear(p["lin"], cat) * valid[:, None]
    return cat


def _jk(p, h, channels: int, layers: int = 3):
    """DenseJK over sharded nodes — per-node op, no communication.

    Delegates to nn.jk.bilstm_attend_2d (round 5): the all-2D fused
    biLSTM-attention shared with the patch path's DenseJK — one
    block-structured input-projection matmul for all six (timestep,
    direction) gate blocks, concatenated-direction recurrent matmuls, and
    no [n, T, C]-stacked tensor (17x layout padding at T=3/C=20, ~200 MB
    of HBM traffic per such tensor at 100k nuclei)."""
    from cgcnet_tpu.nn.jk import bilstm_attend_2d

    return bilstm_attend_2d(p, h, channels, layers)


class _ShardedAdj:
    """A = diag(scale) * B_off + self_w * I over the sharded node space.

    With ``overlap`` the aggregation is split into an interior part (rows
    whose neighbours are all shard-local) with no data dependency on the
    halo all_to_all, so XLA can overlap the collective with the interior
    gather (same structure as mega_graph.sharded_gather_sum_overlap; pays
    on real ICI, neutral on a virtual CPU mesh)."""

    def __init__(
        self,
        inputs: MegaInputs,
        cfg: ModelConfig,
        axis: str,
        overlap: bool = False,
        dtype=None,
    ):
        self.axis = axis
        self.inp = inputs
        self.overlap = overlap
        # dtype = activation/compute dtype (model.compute_dtype); the scale
        # vectors and ELL weights must match it or every aggregation silently
        # promotes bf16 activations back to f32
        dt = jnp.dtype(dtype) if dtype is not None else inputs.x.dtype
        row = jnp.arange(inputs.nbr_remap.shape[0])
        off_mask32 = inputs.nbr_mask * (
            inputs.nbr_remap != row[:, None]
        ).astype(inputs.nbr_mask.dtype)
        self.off_mask = off_mask32.astype(dt)
        deg = jnp.sum(off_mask32, -1)
        # BSR path: build the local-operator blocks ONCE per forward — all
        # stage-1 matvecs then run the gather-free Pallas MXU kernel
        self.bsr = inputs.blk_cols is not None
        if self.bsr:
            # mega-path block values are BINARY (off_mask is a 0/1 edge
            # mask; norm_adj scale/self-loops apply OUTSIDE the matvec), so
            # int8 storage is exact and halves the dominant per-leg vals
            # DMA (231 MB/leg bf16 at 100k nuclei — roofline_r3.md §4); the
            # matmul kernels convert to the compute dtype at use.
            # prepare_mega_inputs materializes them once per slide; the
            # in-step build below only serves hand-built MegaInputs (tests)
            if inputs.vals is not None:
                self.vals = inputs.vals[None]
                self.vals_t = inputs.vals_t[None]
            else:
                from cgcnet_tpu.ops.pallas.bsr_kernel import bsr_build_blocks

                self.vals = bsr_build_blocks(
                    inputs.nbr_remap[None], self.off_mask[None],
                    inputs.blk_cols[None], inputs.blk_mask[None], jnp.int8,
                )
                self.vals_t = bsr_build_blocks(
                    inputs.nbr_t[None], inputs.mask_t[None],
                    inputs.blk_cols_t[None], inputs.blk_mask_t[None],
                    jnp.int8,
                )
        if cfg.norm_adj:
            p = cfg.self_weight
            self.scale = ((1.0 - p) / (deg + EPS) * inputs.valid).astype(dt)
            self.self_w = (p * inputs.valid).astype(dt)
            # self_w / scale, formed from deg (no runtime division): lets
            # _pa_bwd write the self-loop term as ratio * (scale * d_a_s)
            # so d_a_s has ONE consumer and the scale multiply fuses into
            # the d_a_s matmul epilogue (was a 0.71 ms standalone pass)
            self.pool_ratio = (
                p / (1.0 - p) * (deg + EPS) * inputs.valid
            ).astype(dt)
            # renormalized rows sum to <= 1, so SAGE's clamp(min=1) pins the
            # mean denominator at exactly 1 — same contract as
            # nn.model.make_stage1_adj (keeps any cfg.self_weight consistent)
            self._rowsum = jnp.ones_like(deg)
        else:
            # binary adjacency: contribute a self loop only where the graph
            # actually carries one — same has_self detection as
            # nn.model.make_stage1_adj:82-85 (a loop=False global graph must
            # not grow phantom diagonals on the mega path)
            has_self = jnp.max(
                inputs.nbr_mask
                * (inputs.nbr_remap == row[:, None]).astype(
                    inputs.nbr_mask.dtype
                ),
                axis=-1,
            )
            self.scale = inputs.valid.astype(dt)
            self.self_w = (has_self * inputs.valid).astype(dt)
            self.pool_ratio = self.self_w  # scale == valid here
            self._rowsum = (deg + has_self) * inputs.valid

    def concat_halo(self, h):
        """[Ns, F] -> [Ns + halo, F]: local rows followed by the exchanged
        halo rows — the index space ``nbr_remap`` points into."""
        halo = _halo_exchange(
            h, self.inp.req_idx, self.inp.req_mask, self.axis
        )
        return jnp.concatenate([h, halo], 0)

    def __call__(self, h):
        nbr, w = self.inp.nbr_remap, self.off_mask
        if self.bsr:
            from cgcnet_tpu.ops.ell import bsr_local_matmul

            # halo rows as their own (tiny) array, zero-padded to the
            # column-space tail — the banded kernel reads (h, halo)
            # separately so the S-sized local++halo concat never happens
            halo = _halo_exchange(
                h, self.inp.req_idx, self.inp.req_mask, self.axis
            )
            nc = self.inp.nbr_t.shape[0]
            hp = nc - h.shape[0] - halo.shape[0]
            if hp:
                halo = jnp.concatenate(
                    [halo, jnp.zeros((hp, halo.shape[1]), halo.dtype)], 0
                )
            win = (
                self.inp.win_base.reshape(1, -1)
                if self.inp.win_base is not None
                else jnp.zeros((1, 0), jnp.int32)
            )
            win_t = (
                self.inp.win_base_t.reshape(1, -1)
                if self.inp.win_base_t is not None
                else jnp.zeros((1, 0), jnp.int32)
            )
            win_halo = (
                self.inp.win_halo.reshape(1, -1)
                if self.inp.win_halo is not None
                else jnp.zeros((1, 0), jnp.int32)
            )
            # hybrid transpose (build_bsr_tables): blocks cover local rows
            # only — hand the backward the halo rows' ELL in-edge lists
            tr = self.inp.blk_cols_t.shape[0] * 128
            if tr < self.inp.nbr_t.shape[0]:
                nbr_t_h = self.inp.nbr_t[tr:]
                mask_t_h = self.inp.mask_t[tr:]
            else:
                nbr_t_h = mask_t_h = None
            agg = bsr_local_matmul(
                self.vals, self.inp.blk_cols[None], win,
                self.vals_t, self.inp.blk_cols_t[None], win_t, h, halo,
                win_halo, nbr_t_h, mask_t_h,
            )
            return self.scale[:, None] * agg + self.self_w[:, None] * h
        if self.overlap:
            ns = h.shape[0]
            slot_local = jnp.where(self.inp.nbr_mask > 0, nbr, 0) < ns
            interior = jnp.all(slot_local, axis=-1)
            out_int = ell_gather_sum(
                jnp.minimum(nbr, ns - 1)[None],
                (w * interior[:, None])[None],
                h[None],
            )[0]
            hh = self.concat_halo(h)
            out_bnd = ell_gather_sum(
                nbr[None], (w * (~interior)[:, None])[None], hh[None]
            )[0]
            agg = out_int + out_bnd
        else:
            hh = self.concat_halo(h)
            agg = ell_gather_sum(nbr[None], w[None], hh[None])[0]
        return self.scale[:, None] * agg + self.self_w[:, None] * h

    def rowsum(self):
        return self._rowsum

    def pool_aggregate_args(self):
        """The table/vector args for the fused ``_pool_aggregate`` VJP, or
        None when its banded-transpose backward cannot engage (non-BSR
        adjacency, or no transpose window table)."""
        if not self.bsr or self.inp.win_base_t is None:
            return None
        win = (
            self.inp.win_base.reshape(1, -1)
            if self.inp.win_base is not None
            else jnp.zeros((1, 0), jnp.int32)
        )
        win_t = self.inp.win_base_t.reshape(1, -1)
        win_halo = (
            self.inp.win_halo.reshape(1, -1)
            if self.inp.win_halo is not None
            else jnp.zeros((1, 0), jnp.int32)
        )
        tr = self.inp.blk_cols_t.shape[0] * 128
        if tr < self.inp.nbr_t.shape[0]:
            nbr_t_h, mask_t_h = self.inp.nbr_t[tr:], self.inp.mask_t[tr:]
        else:
            nbr_t_h = mask_t_h = None
        return (self.vals, self.inp.blk_cols[None], win, self.vals_t,
                self.inp.blk_cols_t[None], win_t, win_halo, nbr_t_h,
                mask_t_h, self.scale, self.self_w, self.pool_ratio,
                self.inp.req_idx, self.inp.req_mask)


def mega_forward(
    variables: dict,
    cfg: ModelConfig,
    inputs: MegaInputs,
    mesh: Mesh,
    *,
    train: bool = False,
    axis: str = "graph",
    halo_overlap: bool = False,
    remat: bool = False,
    remat_stage1: bool = False,
    return_stats: bool = False,
    dropout_rng=None,
) -> jax.Array:
    """Logits [3] for one whole-slide graph. Parameters replicated; graph
    sharded over ``axis``. ``halo_overlap`` structures stage-1 aggregation
    for collective/compute overlap (MeshConfig.halo_overlap).

    Supports SAGE/GIN/GAT parameter trees; sharded GAT halo-exchanges the
    k/v projections per convolution and scores neighbours through the
    remapped ELL lists (``_gat_conv``).

    ``return_stats`` (train only): also return the updated batch_stats tree
    (cross-shard psum statistics blended with torch momentum 0.1) so slide
    training tracks running BN stats — reference SyncBatchNorm analog.

    ``dropout_rng`` (train only): PRNG key for the prediction-head dropout
    (CGCNet applies Dropout(cfg.drop_out) between pred layers in train mode,
    nn/model.py:250-252 — slide fine-tuning must regularize the same way).
    The head runs replicated, so every shard uses the same key. None
    disables dropout."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    d1, d2 = cfg.assign_dims
    use_dropout = train and cfg.drop_out > 0 and dropout_rng is not None
    rng_data = jax.random.key_data(
        dropout_rng if dropout_rng is not None else jax.random.key(0)
    )

    dtype = jnp.dtype(cfg.compute_dtype)

    def fn(params, stats, inp: MegaInputs, rng_data):
        # activations run at model.compute_dtype (bf16 under the mixed-
        # precision policy); L2-norm / softmax / BN-stats / JK-attention /
        # head stay f32 — same islands as the patch path (nn/model.py:171)
        x = inp.x.astype(dtype)
        valid = inp.valid.astype(dtype)
        adj = _ShardedAdj(inp, cfg, axis, overlap=halo_overlap, dtype=dtype)
        neg = jnp.finfo(dtype).min
        stats_out: dict = {}

        # ---- stage 1 (sharded) ----
        # (embed, pool) pairs share one aggregation stream with dual-fused
        # lins and tails where widths/settings allow (_paired_layers12);
        # conv3's split off (embed solo, pool into the possibly-remat'd
        # assign segment)
        paired = (
            cfg.gcn_name == "SAGE"
            and cfg.bn
            and params["embed1"]["gcn1"]["lin"]["kernel"].shape[1]
            == params["pool1"]["gcn1"]["lin"]["kernel"].shape[1]
        )
        if paired:
            def stage1_paired(prm, st, xx):
                # pure segment (stats flow OUT as explicit returns) so it
                # can be jax.checkpoint'd; e12/agg3_e stay internal and are
                # recomputed in the backward under remat_stage1
                so1: dict = {}
                e12_, p12_, agg3_e_, agg3_p_ = _paired_layers12(
                    prm, st, "embed1", "pool1", xx, adj, valid, cfg, axis,
                    train, so1,
                )
                emb = _stage1_block(
                    prm, st, "embed1", xx, adj, valid, cfg, axis, train,
                    lin=False, stats_out=so1, pre12=e12_, pre_agg3=agg3_e_,
                )
                return emb, p12_, agg3_p_, so1

            if remat_stage1:
                # the [Ns, <=120] dual-stream activations + their backward
                # intermediates (~2.8 GB at 1M) otherwise survive the
                # pool-1 backward peak; residuals shrink to the segment
                # outputs (~0.5 GB at 1M) for ~3 extra F<=40 matvec legs
                stage1_paired = jax.checkpoint(stage1_paired)
            embed, p12, agg3_p, so1 = stage1_paired(params, stats or {}, x)
            for _name, _d in so1.items():
                stats_out.setdefault(_name, {}).update(_d)
        else:
            p12 = agg3_p = None
            embed = _stage1_block(
                params, stats, "embed1", x, adj, valid, cfg, axis, train,
                lin=False, stats_out=stats_out,
            )
        if cfg.jk:
            embed = _jk(params["jk1"], embed, cfg.hidden_dim) * valid[:, None]
        # global masked max-readout: per-shard max, all_gather (differentiable,
        # unlike pmax), max across shards
        local_max = jnp.max(jnp.where(valid[:, None] > 0, embed, neg), 0)
        read1 = jnp.max(jax.lax.all_gather(local_max, axis), 0)

        # fused Pallas assign tail (ops/pallas/assign_head.py): conv3's
        # l2norm/relu/BN-stats/BN-fold/lin/softmax in two VMEM passes, with
        # the one-pass statistics psum'd BETWEEN the passes (SyncBatchNorm
        # semantics) — the [Ns, 1140] logits/S chains that dominated the
        # r3 slide profile (f32 softmax fwd+bwd fusions) never reach HBM.
        # Needs the paired layers (x12/agg3 precomputed), the relu
        # homogeneity fold, fold_assign_tail, and 128-tiling rows.
        def _fuse_on(v):
            # tri-state 'auto'/'always'/'never' or plain bool (nn/model.py's
            # tri_state with auto->True: pallas availability is implied by
            # the mega path's own gates)
            return (v != "never") if isinstance(v, str) else bool(v)

        from cgcnet_tpu.ops.pallas import assign_head as _ah

        fused_tail = (
            paired
            and cfg.fold_assign_tail
            and cfg.activation == "relu"
            and inp.nbr_remap.shape[0] % 128 == 0
            and _fuse_on(cfg.fused_assign_softmax)
            and _fuse_on(cfg.fused_assign_norm)
            # the kernel needs a real TPU or the Pallas interpreter
            and (jax.default_backend() == "tpu" or _ah._interpret())
        )

        def pool1_segment(pool_params, pool_stats, px, pembed, p12, agg3_p):
            # stats flow OUT as explicit returns (jax.checkpoint purity)
            so: dict = {}
            if fused_tail:
                from cgcnet_tpu.ops.pallas import assign_head as ah

                dt = pembed.dtype
                denom = jnp.clip(adj.rowsum(), min=1.0)[:, None].astype(dt)
                x3 = agg3_p / denom
                ch = (
                    ah.pick_chunk(x3.shape[0], cfg.assign_tail_chunk)
                    if cfg.assign_tail_chunk else 0
                )
                if not (train and ch):
                    # conv3 RAW lin output (pre-normalize/mask/act) — the
                    # kernel recomputes l2norm+relu in VMEM (_rnorm_h). The
                    # capacity path never materializes it (see below).
                    p_raw = _linear(pool_params["gcn3"]["lin"], x3)
                x12 = jnp.concatenate(p12, -1)
                k = pool_params["lin"]["kernel"]
                split = x12.shape[-1]
                k12, k3 = k[:split], k[split:]
                lin_bias = pool_params["lin"].get(
                    "bias", jnp.zeros((k.shape[1],), jnp.float32)
                )
                vm = valid.astype(dt)
                if train:
                    n_glob = jax.lax.psum(
                        jnp.sum(valid.astype(jnp.float32)), axis
                    )
                    if ch:
                        # slide-capacity path: chunked-recompute backward
                        # with conv3's lin ABSORBED into the chunk loops —
                        # no [N, 1140]-class p residual, remat-compressed
                        # copy, or assembled dp exists at any point
                        # (three of the seven S-class allocations in the
                        # 18.71 GB 1M OOM, benchmarks/slide_step_r4.json)
                        gl = pool_params["gcn3"]["lin"]
                        b3 = gl.get("bias",
                                    jnp.zeros((gl["kernel"].shape[1],),
                                              jnp.float32))
                        s, _, mean, var = ah.assign_tail_train_chunked_lin(
                            x12[None], x3[None], gl["kernel"], b3,
                            k12, k3, lin_bias,
                            pool_params["bn3"]["scale"],
                            pool_params["bn3"]["bias"],
                            vm[None], n_glob, 1e-5, axis, ch,
                        )
                    else:
                        # emit S lane-padded when the banded A@S kernel is
                        # in play (round 5): pad columns are exact zeros
                        # born inside the kernel, so the banded legs'
                        # aligned-minor manual DMA needs no [N, C] pad
                        # pass fwd or bwd (2 x 0.69 ms at 100k,
                        # roofline_r4 §4); contractions stay exact and the
                        # pooled outputs trim once after the psum below
                        d1c = k3.shape[1]
                        band_on = (
                            inp.win_base is not None
                            and inp.win_base.shape[-1] > 0
                            and jnp.dtype(dt).itemsize <= 2
                        )
                        c_pad = -(-d1c // 128) * 128
                        co = c_pad if (band_on and c_pad != d1c) else None
                        s, _, mean, var = ah.assign_tail_train_psum(
                            x12[None], p_raw[None], k12, k3, lin_bias,
                            pool_params["bn3"]["scale"],
                            pool_params["bn3"]["bias"],
                            vm[None], n_glob, 1e-5, axis, co,
                        )
                    # running-stat update: same blend as _bn_moments
                    unbiased = var * n_glob / jnp.maximum(n_glob - 1.0, 1.0)
                    st = pool_stats.get("bn3") or {
                        "mean": jnp.zeros_like(mean),
                        "var": jnp.ones_like(var),
                    }
                    so["bn3"] = {
                        "mean": 0.9 * st["mean"] + 0.1 * mean,
                        "var": 0.9 * st["var"] + 0.1 * unbiased,
                    }
                else:
                    st = pool_stats["bn3"]
                    inv = jax.lax.rsqrt(st["var"] + 1e-5) * pool_params[
                        "bn3"
                    ]["scale"]
                    shift = pool_params["bn3"]["bias"] - st["mean"] * inv
                    s, _ = ah.assign_head_softmax_pre(
                        x12[None], p_raw[None], k12,
                        inv[:, None] * k3, shift @ k3 + lin_bias, vm[None],
                    )
                s = s[0]
            else:
                assign = _stage1_block(
                    {"pool1": pool_params}, {"pool1": pool_stats}, "pool1",
                    px, adj, valid, cfg, axis, train,
                    lin=True, stats_out=so, pre12=p12, pre_agg3=agg3_p,
                )
                so = so.get("pool1", {})
                # assignment softmax in f32 (nn/blocks.py:360 island)
                s = jax.nn.softmax(assign.astype(jnp.float32), -1).astype(
                    dtype
                ) * valid[:, None]
            from cgcnet_tpu.ops.pallas.assign_head import pick_chunk
            from cgcnet_tpu.ops.pallas.bsr_kernel import BAND_MIN_F

            ch_seg = (
                pick_chunk(s.shape[0], cfg.assign_tail_chunk)
                if (train and cfg.assign_tail_chunk) else 0
            )
            pa = adj.pool_aggregate_args() if not ch_seg else None
            if (
                pa is not None
                and jnp.dtype(s.dtype).itemsize <= 2
                and s.shape[1] % 128 == 0
                and s.shape[1] >= BAND_MIN_F
            ):
                # fused aggregation+contraction VJP: ct_s assembled inside
                # the banded transpose kernel (acc operand) instead of a
                # separate 4-operand full-width pass
                x_pool, adj_pool = _pool_aggregate(axis, *pa, s, pembed)
                x_pool, adj_pool = jax.lax.psum((x_pool, adj_pool), axis)
                if x_pool.shape[0] != d1:
                    x_pool = x_pool[:d1]
                    adj_pool = adj_pool[:d1, :d1]
                return x_pool, adj_pool, so
            a_s = adj(s)                                         # [Ns, d1]
            # TWO row-contracting einsums + one (tree) psum. The patch path
            # fuses these into one [d1, Ns] @ [Ns, F+d1] matmul
            # (_contract_dual_pair); at slide scale the [Ns, F+d1] concat is
            # a full S-sized HBM round trip forward (1.5 ms in the r4
            # profile). Contract over rows of S directly — do NOT consume
            # the kernel's s_t output here: a materialized S^T makes the
            # backward produce TRANSPOSED cotangents (ds_t), and the
            # [d1, Ns] relayout + add_any pair that reassembles them was
            # 2.3 ms/step at 100k and ~6.4 GB of the 1M-nuclei OOM
            # (copy.275/broadcast_in_dim.2417 in slide_scale_r4). The MXU
            # contracts over dim 0 natively (weight-gradient orientation,
            # same as _atf_bwd's dk3f einsum at ~80% of bound).
            # custom-VJP backward on BOTH paths (round 5): d(A S) as ONE
            # matmul and ds assembled per static chunk as
            # (pc @ ctx^T + ac @ cta^T) in one expression — on the
            # non-chunked path (chunk = all rows) XLA fuses the add into
            # the second matmul's epilogue, where the einsum pair's
            # autodiff emitted a separate full [N, C]-tensor add pass
            # under the lane-padded S shapes (a 1.0 ms add_bitcast in the
            # first r5 profile; r4's un-padded comparison measured the
            # difference neutral, 38.4 vs 38.08).
            x_pool, adj_pool = _chunked_pool_contract(
                s, pembed, a_s, ch_seg if ch_seg else s.shape[0]
            )
            x_pool, adj_pool = jax.lax.psum((x_pool, adj_pool), axis)
            if x_pool.shape[0] != d1:
                # lane-padded S (see the c_out emission above): the pooled
                # rows/cols past d1 are exact zeros — trim once, AFTER the
                # psum (the trim's VJP zero-pads the cotangents back, which
                # is exactly the padded backward's contract)
                x_pool = x_pool[:d1]
                adj_pool = adj_pool[:d1, :d1]
            return x_pool, adj_pool, so

        if remat:
            # the [Ns, d1]-class tensors (assign logits, S, A@S) dominate
            # slide-scale activation memory; recompute them in the backward.
            # With pairing, conv1/2 live OUTSIDE the segment ([Ns, <=40]
            # activations, negligible) so only the 1140-wide tail recomputes.
            pool1_segment = jax.checkpoint(pool1_segment)
        x_pool, adj_pool, pool1_stats = pool1_segment(
            params["pool1"], (stats or {}).get("pool1", {}), x, embed,
            p12, agg3_p,
        )
        if pool1_stats:
            # merge, don't clobber: the paired path already recorded pool1's
            # bn1/bn2 updates into stats_out
            stats_out.setdefault("pool1", {}).update(pool1_stats)

        # ---- stages 2-3 (replicated) ----
        from cgcnet_tpu.ops.ell import renorm_dense

        def dense_agg(aa):
            class DenseAgg:
                dense_adj = aa

                def __call__(self, h):
                    return aa @ h

                def rowsum(self):
                    return jnp.sum(aa, -1)

            return DenseAgg()

        def dense_stage(name, jk_name, xx, aa, pre12=None, pre_agg3=None):
            ones = jnp.ones(xx.shape[0], xx.dtype)
            emb = _stage1_block(
                params, stats, name, xx, dense_agg(aa), ones, cfg, axis,
                train, lin=False, stats_out=stats_out, replicated=True,
                pre12=pre12, pre_agg3=pre_agg3,
            )
            if cfg.jk:
                emb = _jk(params[jk_name], emb, cfg.hidden_dim)
            return emb

        if cfg.norm_adj:
            adj_pool = renorm_dense(adj_pool[None], cfg.self_weight)[0]
        ones = jnp.ones(x_pool.shape[0], x_pool.dtype)
        if paired:
            # same pairing for the dense (embed2, pool2) pair
            e12_2, p12_2, agg3_e2, agg3_p2 = _paired_layers12(
                params, stats, "embed2", "pool2", x_pool,
                dense_agg(adj_pool), ones, cfg, axis, train, stats_out,
                replicated=True,
            )
        else:
            e12_2 = p12_2 = agg3_e2 = agg3_p2 = None
        embed2 = dense_stage(
            "embed2", "jk2", x_pool, adj_pool, pre12=e12_2, pre_agg3=agg3_e2
        )
        read2 = jnp.max(embed2, 0)

        assign2 = _stage1_block(
            params, stats, "pool2", x_pool, dense_agg(adj_pool), ones, cfg,
            axis, train, lin=True, stats_out=stats_out, replicated=True,
            pre12=p12_2, pre_agg3=agg3_p2,
        )
        s2 = jax.nn.softmax(assign2.astype(jnp.float32), -1).astype(dtype)
        x3 = s2.T @ embed2
        adj3 = s2.T @ (adj_pool @ s2)
        if cfg.norm_adj:
            adj3 = renorm_dense(adj3[None], cfg.self_weight)[0]
        embed3 = dense_stage("embed3", "jk3", x3, adj3)
        read3 = jnp.max(embed3, 0)

        # the head is [60]-tiny — run it in f32 regardless of compute_dtype
        # (same decision as nn/model.py:250-252)
        out = jnp.concatenate([read1, read2, read3], -1).astype(jnp.float32)
        h = out
        act = _act(cfg.activation)
        for i, _ in enumerate(cfg.pred_hidden_dims):
            h = act(_linear(params[f"pred_{i}"], h))
            if use_dropout:
                # flax.linen.Dropout semantics: keep w.p. 1-rate, scale by
                # 1/(1-rate) — the head is replicated so one shared key
                keep = jax.random.bernoulli(
                    jax.random.fold_in(jax.random.wrap_key_data(rng_data), i),
                    1.0 - cfg.drop_out,
                    h.shape,
                )
                h = jnp.where(keep, h / (1.0 - cfg.drop_out), 0.0)
        logits = _linear(params["pred_out"], h)
        if return_stats:
            return logits, stats_out
        return logits

    out_specs = (P(), P()) if return_stats else P()
    inp_specs = jax.tree.map(lambda _: P(axis), inputs)
    shard_fn = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(), P(), inp_specs, P()),
        out_specs=out_specs,
        check_vma=False,
    )
    return shard_fn(params, stats, inputs, rng_data)
