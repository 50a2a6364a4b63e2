"""Adjacency abstraction: one interface, two layouts.

Stage 1 of the hierarchy runs on sparse cell graphs (ELL, <=8 nbrs/node at
N=5703); pooled stages run on small dense cluster graphs (1140, 114) that map
straight onto the MXU. Every layer is written against this interface so the
same module code serves both — the layout choice is a data property, not a
model property (contrast the reference, which densifies everything:
model/utils.py:3-37).
"""

from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jnp
from flax import struct

from typing import Optional

from cgcnet_tpu.ops.ell import (
    bsr_matmul_precomp,
    bsr_spmm_factored,
    ell_gather_sum,
    ell_spmm_factored,
)


@struct.dataclass
class EllAdjFactored:
    """Stage-1 adjacency in factored form A = diag(scale)·B_off + diag(self_w)
    with the transposed graph carried for a scatter-free backward
    (ops.ell.ell_spmm_factored). Preferred whenever the loader supplies
    ``nbr_t`` (training path). With block metadata and impl='pallas', both
    directions run the gather-free MXU kernel (ops/pallas/bsr_kernel.py)."""

    nbr: jax.Array          # i32[B, N, K]
    off_mask: jax.Array     # f32[B, N, K] (self slots zeroed)
    nbr_t: jax.Array        # i32[B, N, KT]
    off_mask_t: jax.Array   # f32[B, N, KT]
    scale: jax.Array        # f32[B, N]
    self_w: jax.Array       # f32[B, N]
    rowsum_: jax.Array      # f32[B, N]
    blk_cols: Optional[jax.Array] = None
    blk_mask: Optional[jax.Array] = None
    blk_cols_t: Optional[jax.Array] = None
    blk_mask_t: Optional[jax.Array] = None
    # Precomputed block values of A / A^T (weights folded in): built once per
    # step by nn.model.make_stage1_adj so every matvec is matmul-only.
    vals: Optional[jax.Array] = None
    vals_t: Optional[jax.Array] = None
    impl: str = struct.field(pytree_node=False, default="xla")

    def matvec(self, x: jax.Array) -> jax.Array:
        if self.impl == "pallas" and self.vals is not None:
            return bsr_matmul_precomp(
                self.vals, self.blk_cols, self.vals_t, self.blk_cols_t,
                self.scale, self.self_w, x,
            )
        if self.impl == "pallas" and self.blk_cols is not None:
            return bsr_spmm_factored(
                self.nbr,
                self.off_mask.astype(x.dtype),
                self.blk_cols,
                self.blk_mask,
                self.nbr_t,
                self.off_mask_t.astype(x.dtype),
                self.blk_cols_t,
                self.blk_mask_t,
                self.scale.astype(x.dtype),
                self.self_w.astype(x.dtype),
                x,
            )
        return ell_spmm_factored(
            self.nbr,
            self.off_mask.astype(x.dtype),
            self.nbr_t,
            self.off_mask_t.astype(x.dtype),
            self.scale.astype(x.dtype),
            self.self_w.astype(x.dtype),
            x,
            "xla",
        )

    def rowsum(self) -> jax.Array:
        return self.rowsum_

    def quadform(self, s: jax.Array) -> jax.Array:
        a_s = self.matvec(s)
        return jnp.einsum("bnc,bnd->bcd", s, a_s, preferred_element_type=s.dtype)


@struct.dataclass
class EllAdj:
    """Padded-ELL adjacency. ``w`` carries effective edge weights with the
    slot mask already folded in (0 on padding)."""

    nbr: jax.Array                 # i32[B, N, K]
    w: jax.Array                   # f32[B, N, K]
    impl: str = struct.field(pytree_node=False, default="xla")

    def matvec(self, x: jax.Array) -> jax.Array:
        """A @ x for the implied [B, N, N] adjacency."""
        return ell_gather_sum(self.nbr, self.w.astype(x.dtype), x, impl=self.impl)

    def rowsum(self) -> jax.Array:
        return jnp.sum(self.w, axis=-1)

    def quadform(self, s: jax.Array) -> jax.Array:
        """S^T A S — DiffPool's pooled adjacency (model/network.py:207)."""
        a_s = self.matvec(s)                       # [B, N, C]
        return jnp.einsum("bnc,bnd->bcd", s, a_s, preferred_element_type=s.dtype)


@struct.dataclass
class DenseAdj:
    adj: jax.Array                 # f32[B, N, N]

    def matvec(self, x: jax.Array) -> jax.Array:
        return jnp.einsum(
            "bij,bjf->bif", self.adj.astype(x.dtype), x, preferred_element_type=x.dtype
        )

    def rowsum(self) -> jax.Array:
        return jnp.sum(self.adj, axis=-1)

    def quadform(self, s: jax.Array) -> jax.Array:
        a_s = self.matvec(s)
        return jnp.einsum("bnc,bnd->bcd", s, a_s, preferred_element_type=s.dtype)


Adjacency = Union[EllAdj, EllAdjFactored, DenseAdj]
