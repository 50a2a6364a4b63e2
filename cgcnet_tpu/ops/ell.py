"""Sparse neighbourhood aggregation over padded ELL graphs.

This is the hot op of the whole framework: the reference spends its FLOPs on
``adj @ x`` dense batched matmuls at N=5703 with 0.14%-dense adjacency
(reference model/network.py:206-207 and the DenseSAGEConv internals — see
SURVEY.md §2.3 P1). Here the same contraction is a fixed-width gather +
K-reduction:

    out[b, i, :] = sum_k w[b, i, k] * x[b, nbr[b, i, k], :]

Two implementations with identical semantics:

- ``impl='xla'``: jnp gather (XLA lowers to dynamic-gather; autodiff gives the
  scatter-add backward for free).
- the Pallas block-sparse MXU kernel (ops/pallas/bsr_kernel.py), engaged via
  :func:`bsr_spmm_factored` when the loader supplies block metadata — on TPU
  the per-row-latency cost of XLA gathers makes this decisively faster.

The adaptive-GraphSAGE renormalization (reference ``_re_norm_adj``,
model/network.py:183-191: zero diagonal, row-normalize, scale by (1-p), set
diagonal to p) factors over ELL as per-row scales — no materialized [N, N]
matrix ever exists at stage 1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

EPS = 1e-15  # reference model/network.py:8

def _gather_sum_xla(nbr: jax.Array, w: jax.Array, x: jax.Array) -> jax.Array:
    def one(nbr_, w_, x_):
        gathered = x_[nbr_]                      # [N, K, F]
        return jnp.einsum(
            "nk,nkf->nf", w_, gathered, preferred_element_type=x_.dtype
        )

    return jax.vmap(one)(nbr, w, x)


def ell_gather_sum(
    nbr: jax.Array, w: jax.Array, x: jax.Array, *, impl: str | None = None
) -> jax.Array:
    """Weighted neighbour sum: out[b,i] = sum_k w[b,i,k] * x[b, nbr[b,i,k]].

    Args:
      nbr: i32[B, N, K] neighbour indices (invalid slots must be in-bounds —
        the loader points them at the row itself).
      w:   f32[B, N, K] edge weights; padding slots must carry weight 0.
      x:   f32[B, N, F] node features.
    """
    del impl  # the XLA gather is the only generic impl; see bsr_spmm_factored
    return _gather_sum_xla(nbr, w, x)


# Back-compat name: the full sparse matrix-times-dense-matrix product.
ell_spmm = ell_gather_sum


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def ell_spmm_factored(
    nbr: jax.Array,
    off_mask: jax.Array,
    nbr_t: jax.Array,
    off_mask_t: jax.Array,
    scale: jax.Array,
    self_w: jax.Array,
    x: jax.Array,
    impl: str = "xla",
) -> jax.Array:
    """A @ x for A = diag(scale) * B_off + self_w * I.

    ``B_off`` is the binary *off-diagonal* adjacency (``nbr`` with self slots
    masked out of ``off_mask``); ``nbr_t``/``off_mask_t`` its transpose (the
    loader's in-edge lists, core/convert.transpose_ell_np). The factorization
    covers both reference adjacency modes (model/network.py:183-191 and the
    raw binary path):

      norm_adj:  scale = (1-p)/deg_off * valid, self_w = p * valid
      binary  :  scale = valid,                 self_w = valid

    (``self_w`` is per-row [B, N] — zero on padded rows, so neither output
    nor gradient leaks through padding.)

    The payoff is the VJP: dL/dx = B_off^T (scale * g) + self_w * g — a
    *gather* over the transpose, not an XLA scatter-add. Both directions run
    the same kernel. Weights are data-derived constants; their tangents are
    zero.
    """
    gathered = ell_gather_sum(nbr, off_mask, x, impl=impl)
    return scale[..., None] * gathered + self_w[..., None] * x


def _factored_fwd(nbr, off_mask, nbr_t, off_mask_t, scale, self_w, x, impl="xla"):
    out = ell_spmm_factored(nbr, off_mask, nbr_t, off_mask_t, scale, self_w, x, impl)
    return out, (nbr, off_mask, nbr_t, off_mask_t, scale, self_w)


def _factored_bwd(impl, res, g):
    nbr, off_mask, nbr_t, off_mask_t, scale, self_w = res
    sg = scale[..., None] * g
    dx = ell_gather_sum(nbr_t, off_mask_t, sg, impl=impl) + self_w[..., None] * g
    z = jax.tree.map(jnp.zeros_like, (nbr, off_mask, nbr_t, off_mask_t, scale, self_w))
    return (*z, dx)


ell_spmm_factored.defvjp(_factored_fwd, _factored_bwd)


@jax.custom_vjp
def bsr_spmm_factored(
    nbr: jax.Array,
    off_mask: jax.Array,
    blk_cols: jax.Array,
    blk_mask: jax.Array,
    nbr_t: jax.Array,
    off_mask_t: jax.Array,
    blk_cols_t: jax.Array,
    blk_mask_t: jax.Array,
    scale: jax.Array,
    self_w: jax.Array,
    x: jax.Array,
) -> jax.Array:
    """Same contract as :func:`ell_spmm_factored`, but both directions run
    the gather-free Pallas block-sparse MXU kernel
    (ops/pallas/bsr_kernel.bsr_gather_sum) using loader-built block metadata
    over spatially-sorted nodes."""
    from cgcnet_tpu.ops.pallas.bsr_kernel import bsr_gather_sum

    gathered = bsr_gather_sum(nbr, off_mask, blk_cols, blk_mask, x)
    return scale[..., None] * gathered + self_w[..., None] * x


def _bsr_fwd(nbr, off_mask, blk_cols, blk_mask, nbr_t, off_mask_t,
             blk_cols_t, blk_mask_t, scale, self_w, x):
    out = bsr_spmm_factored(
        nbr, off_mask, blk_cols, blk_mask, nbr_t, off_mask_t,
        blk_cols_t, blk_mask_t, scale, self_w, x,
    )
    res = (nbr, off_mask, blk_cols, blk_mask, nbr_t, off_mask_t,
           blk_cols_t, blk_mask_t, scale, self_w)
    return out, res


def _bsr_bwd(res, g):
    from cgcnet_tpu.ops.pallas.bsr_kernel import bsr_gather_sum

    (nbr, off_mask, blk_cols, blk_mask, nbr_t, off_mask_t,
     blk_cols_t, blk_mask_t, scale, self_w) = res
    sg = scale[..., None] * g
    dx = (
        bsr_gather_sum(nbr_t, off_mask_t, blk_cols_t, blk_mask_t, sg)
        + self_w[..., None] * g
    )
    z = jax.tree.map(
        jnp.zeros_like,
        (nbr, off_mask, blk_cols, blk_mask, nbr_t, off_mask_t,
         blk_cols_t, blk_mask_t, scale, self_w),
    )
    return (*z, dx)


bsr_spmm_factored.defvjp(_bsr_fwd, _bsr_bwd)


@jax.custom_vjp
def bsr_matmul_precomp(
    vals: jax.Array,       # [B, R, M, T, T] blocks of A (weights folded in)
    blk_cols: jax.Array,   # i32[B, R, M]
    vals_t: jax.Array,     # [B, R, MT, T, T] BINARY blocks of B_off^T
    blk_cols_t: jax.Array, # i32[B, R, MT]
    scale: jax.Array,      # f32[B, N] row scales of A
    self_w: jax.Array,     # f32[B, N] diagonal weights of A
    x: jax.Array,
) -> jax.Array:
    """A @ x with A's block values precomputed ONCE per step
    (ops.pallas.bsr_kernel.bsr_build_blocks) — the adjacency is constant
    across all 6 convolutions + quadform of a stage-1 forward and their
    backward calls, so both directions are pure MXU matmuls.

    Forward blocks fold A completely (row scale + self weight): no epilogue.
    Backward uses A^T g = B_off^T (scale*g) + self_w*g over BINARY transpose
    blocks — folding scale into the transpose would need a per-in-edge
    gather of row scales (profiled at ~4 ms/step on TPU)."""
    from cgcnet_tpu.ops.pallas.bsr_kernel import bsr_matmul

    return bsr_matmul(vals, blk_cols, x)


def _bsr_pre_fwd(vals, blk_cols, vals_t, blk_cols_t, scale, self_w, x):
    out = bsr_matmul_precomp(
        vals, blk_cols, vals_t, blk_cols_t, scale, self_w, x
    )
    return out, (vals, blk_cols, vals_t, blk_cols_t, scale, self_w)


def _bsr_pre_bwd(res, g):
    from cgcnet_tpu.ops.pallas.bsr_kernel import bsr_matmul

    vals, blk_cols, vals_t, blk_cols_t, scale, self_w = res
    sg = scale[..., None].astype(g.dtype) * g
    dx = bsr_matmul(vals_t, blk_cols_t, sg) + self_w[..., None].astype(
        g.dtype
    ) * g
    z = jax.tree.map(
        jnp.zeros_like, (vals, blk_cols, vals_t, blk_cols_t, scale, self_w)
    )
    return (*z, dx)


bsr_matmul_precomp.defvjp(_bsr_pre_fwd, _bsr_pre_bwd)


@jax.custom_vjp
def bsr_local_matmul(
    vals: jax.Array,       # [1, R, M, T, T] blocks of the local operator
    blk_cols: jax.Array,   # i32[1, R, M]
    win: jax.Array,        # i32[1, S] window bases, or [1, 0] sentinel
    vals_t: jax.Array,     # [1, RC, MT, T, T] blocks of its transpose
    blk_cols_t: jax.Array, # i32[1, RC, MT]
    win_t: jax.Array,      # i32[1, S_t] or [1, 0]
    h: jax.Array,          # [Ns, F] local rows
    halo: jax.Array,       # [NC - Ns, F] exchanged halo rows (zero-padded)
    win_halo: jax.Array | None = None,  # i32[1, S] halo-window bases
                                        #   (band_window_table_halo) or
                                        #   [1, 0]/None — multi-shard halos
                                        #   too big for the resident tail
    nbr_t_h: jax.Array | None = None,   # i32[H, KT] transpose ELL lists of
                                        #   the HALO rows — set when the
                                        #   transpose blocks cover local
                                        #   rows only (hybrid transpose,
                                        #   mega_graph.build_bsr_tables)
    mask_t_h: jax.Array | None = None,  # f32[H, KT]
) -> jax.Array:
    """Rectangular per-shard matmul for the mega path: out[Ns, F] =
    A_loc @ [h ++ halo] where A_loc is [Ns x NC] (halo columns are extra
    tiles). The VJP runs the transposed blocks; the halo slice of its
    output routes back to owner shards through the halo-exchange autodiff.
    Runs inside shard_map — per shard, batch dim 1.

    ``win``/``win_t`` select the banded x-window kernel per direction
    (bsr_kernel.bsr_matmul_banded — the slide-scale F=1140 legs are
    x-re-DMA-bound in the streamed kernel); a [1, 0] sentinel keeps the
    streamed kernel for that direction. The banded forward reads ``h`` and
    ``halo`` as separate arrays, so the [NC, F] concat — a full S-sized
    HBM round trip at slide scale, 0.9 ms in the r4 profile — never
    materializes on that path."""
    from cgcnet_tpu.ops.pallas.bsr_kernel import (
        BAND_MIN_F, bsr_matmul, bsr_matmul_banded,
    )

    # the banded kernels' double-buffered (W_BAND + H_BAND_MAX)-tile x
    # window is VMEM-sized for <=2-byte activations (bf16 production path);
    # at f32 the scratch alone is ~23.6 MB > the 16 MB scoped limit
    # (measured: the r5 halo-window probe failed AOT compile at f32)
    band_dtype_ok = jnp.dtype(h.dtype).itemsize <= 2
    if win.shape[-1] and h.shape[-1] >= BAND_MIN_F and band_dtype_ok:
        # wide F only: the banded window cuts x traffic (the F=1140 A@S
        # cost); narrow legs are vals-DMA-bound and would pay the window
        # kernel's internal lane-pad of x for nothing
        hw = (
            win_halo if win_halo is not None and win_halo.shape[-1]
            else None
        )
        return bsr_matmul_banded(
            vals, blk_cols, win, h[None], ns_rows=h.shape[0],
            halo=halo[None], halo_win=hw,
        )[0]
    xx = jnp.concatenate([h, halo], axis=0)
    return bsr_matmul(vals, blk_cols, xx[None])[0]


def _bsr_local_fwd(vals, blk_cols, win, vals_t, blk_cols_t, win_t, h, halo,
                   win_halo=None, nbr_t_h=None, mask_t_h=None):
    out = bsr_local_matmul(
        vals, blk_cols, win, vals_t, blk_cols_t, win_t, h, halo, win_halo,
        nbr_t_h, mask_t_h,
    )
    return out, (vals, blk_cols, win, vals_t, blk_cols_t, win_t, h.shape[0],
                 win_halo, nbr_t_h, mask_t_h)


def _bsr_local_bwd(res, g):
    from cgcnet_tpu.ops.pallas.bsr_kernel import (
        BAND_MIN_F, bsr_matmul, bsr_matmul_banded,
    )

    (vals, blk_cols, win, vals_t, blk_cols_t, win_t, ns, win_halo,
     nbr_t_h, mask_t_h) = res
    if win_t.shape[-1] and g.shape[-1] >= BAND_MIN_F \
            and jnp.dtype(g.dtype).itemsize <= 2:
        # transpose x = the forward's row space: no halo column tiles
        d_xx = bsr_matmul_banded(
            vals_t, blk_cols_t, win_t, g[None], ns_rows=g.shape[0]
        )[0]
    else:
        d_xx = bsr_matmul(vals_t, blk_cols_t, g[None])[0]
    if nbr_t_h is not None and nbr_t_h.shape[0]:
        # hybrid transpose: the blocks cover local rows only; the (few,
        # <1% of the graph) HALO transpose rows run as an ELL gather —
        # their in-edge columns scatter across destination bands and do
        # not tile (measured M_t=64 at 600k x 2 stripes,
        # mega_graph.build_bsr_tables)
        d_halo = ell_gather_sum(
            nbr_t_h[None], mask_t_h.astype(g.dtype)[None], g[None]
        )[0]
    else:
        d_halo = d_xx[ns:]
    z = jax.tree.map(
        jnp.zeros_like, (vals, blk_cols, win, vals_t, blk_cols_t, win_t)
    )
    z_hw = None if win_halo is None else jnp.zeros_like(win_halo)
    z_nh = None if nbr_t_h is None else jnp.zeros_like(nbr_t_h)
    z_mh = None if mask_t_h is None else jnp.zeros_like(mask_t_h)
    return (*z, d_xx[:ns], d_halo, z_hw, z_nh, z_mh)


bsr_local_matmul.defvjp(_bsr_local_fwd, _bsr_local_bwd)


def renorm_ell(
    nbr: jax.Array,
    nbr_mask: jax.Array,
    n_nodes: jax.Array,
    p: float,
) -> jax.Array:
    """Adaptive-GraphSAGE edge weights over ELL, matching ``_re_norm_adj``.

    Reference (model/network.py:183-191) on a binary adjacency A:
      A[diag] = 0;  A' = A / (rowsum(A) + 1e-15) * (1-p);  A'[diag] = p;
      rows of padded nodes zeroed by the mask.

    Returns w f32[B, N, K]: ``p`` on self slots, ``(1-p)/deg_offdiag`` on real
    off-diagonal slots, 0 on padding and on rows past ``n_nodes``.
    """
    row = jnp.arange(nbr.shape[1], dtype=nbr.dtype)[None, :, None]
    is_self = (nbr == row).astype(nbr_mask.dtype) * nbr_mask
    off = nbr_mask * (1.0 - is_self)
    deg = jnp.sum(off, axis=-1, keepdims=True)          # [B, N, 1]
    w = off * (1.0 - p) / (deg + EPS) + is_self * p
    node_ok = (
        jnp.arange(nbr.shape[1])[None, :] < n_nodes[:, None]
    ).astype(w.dtype)
    return w * node_ok[:, :, None]


def renorm_dense(adj: jax.Array, p: float, mask: jax.Array | None = None) -> jax.Array:
    """Dense adaptive renormalization for pooled stages.

    Bit-matches the reference ``_re_norm_adj`` (model/network.py:183-191):
    zero the diagonal, row-normalize with +1e-15, scale by (1-p), set the
    diagonal to p, then (optionally) zero masked rows.
    """
    n = adj.shape[-1]
    # iota compare instead of a materialized [n, n] eye constant (the eye
    # showed up as pred[1140,1140] copies in the TPU step profile)
    eye = jax.lax.broadcasted_iota(
        jnp.int32, (n, n), 0
    ) == jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    adj = jnp.where(eye[None], 0.0, adj)
    new_adj = adj / (jnp.sum(adj, axis=-1, keepdims=True) + EPS) * (1.0 - p)
    new_adj = jnp.where(eye[None], p, new_adj)
    if mask is not None:
        new_adj = new_adj * mask[..., None] if mask.ndim == 2 else new_adj * mask
    return new_adj


def ell_rowsum(w: jax.Array) -> jax.Array:
    """[B, N, K] -> [B, N] row sums (degree for binary weights)."""
    return jnp.sum(w, axis=-1)
