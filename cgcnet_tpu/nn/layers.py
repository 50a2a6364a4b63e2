"""Graph convolutions and normalization with pinned reference semantics.

Numerical contracts (SURVEY.md §2.2, verified against the PyG 1.2.1 release
the reference pins at requirements.txt:40):

- DenseSAGEConv (called at model/network.py:95,114-116 with add_loop=False,
  normalize=True):  out = (A @ x) / clamp(rowsum(A), min=1);  out = out W + b;
  out = l2_normalize(out);  out = out * mask.
- DenseGINConv (model/network.py:96-99, add_loop=False): out = mlp(A @ x)
  with mlp = Linear -> act -> Linear.
- BatchNorm1d over the flattened [B*N, C] view (model/network.py:101-107).
  The reference includes padded rows in the statistics; ``TorchBatchNorm``
  supports a mask to exclude them (the TPU build's default) and reproduces
  the quirk exactly when called without one.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as fnn

from cgcnet_tpu.nn.adjacency import Adjacency


def activation(name: str) -> Callable[[jax.Array], jax.Array]:
    """Activation factory (reference model/network.py:84-91)."""
    if name == "relu":
        return jax.nn.relu
    if name == "elu":
        return jax.nn.elu
    if name == "leakyrelu":
        # torch nn.LeakyReLU default negative_slope=0.01.
        return lambda x: jax.nn.leaky_relu(x, negative_slope=0.01)
    raise ValueError(f"unknown activation {name!r}")


def _torch_linear_init(fan_in: int):
    """torch nn.Linear / PyG-1.2.1 'uniform' init: U(-1/sqrt(fan_in), +)."""
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class TorchLinear(fnn.Module):
    """Linear layer with torch's default init and [out, in] kernel layout
    transposed at apply time — keeps parity tests a direct weight copy."""

    features: int
    use_bias: bool = True

    @fnn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        fan_in = x.shape[-1]
        kernel = self.param(
            "kernel", _torch_linear_init(fan_in), (fan_in, self.features)
        )
        y = x @ kernel.astype(x.dtype)
        if self.use_bias:
            bias = self.param("bias", _torch_linear_init(fan_in), (self.features,))
            y = y + bias.astype(x.dtype)
        return y


class SAGEConv(fnn.Module):
    """Dense/ELL GraphSAGE convolution, PyG-1.2.1 ``DenseSAGEConv`` semantics.

    ``in_features`` (optional, static) declares the lin's fan-in up front so
    the kernel/bias are readable via ``lin_params()`` without a call — the
    dual-stream paired path merges two convs' lins into one matmul
    (nn/blocks.py::_dual_lin). Param tree ("lin/kernel", "lin/bias"), init
    distribution and RNG folding are identical either way.
    """

    features: int
    use_bias: bool = True
    normalize: bool = True
    in_features: Optional[int] = None

    def setup(self):
        if self.in_features is not None:
            self.lin = TorchLinearStatic(
                in_features=self.in_features,
                features=self.features,
                use_bias=self.use_bias,
            )

    def lin_params(self) -> tuple[jax.Array, Optional[jax.Array]]:
        """(kernel [in, out], bias [out] or None) — requires in_features."""
        assert self.in_features is not None, "lin_params needs in_features"
        return self.lin.kernel, self.lin.bias_p

    @fnn.compact
    def __call__(
        self,
        x: jax.Array,
        adj: Adjacency,
        mask: Optional[jax.Array] = None,
        *,
        agg: Optional[jax.Array] = None,
        pre_normalize: bool = False,
    ) -> jax.Array:
        out = adj.matvec(x) if agg is None else agg
        denom = jnp.clip(adj.rowsum(), min=1.0)[..., None].astype(out.dtype)
        out = out / denom
        if self.in_features is not None:
            assert out.shape[-1] == self.in_features, (
                out.shape, self.in_features)
            out = self.lin(out)
        else:
            out = TorchLinear(
                self.features, use_bias=self.use_bias, name="lin"
            )(out)
        if pre_normalize:
            # raw lin output for an externally fused normalize+relu epilogue
            # (ops/pallas/assign_head.py) — caller owns masking too
            return out
        if self.normalize:
            # F.normalize(p=2, dim=-1, eps=1e-12): x / max(||x||, eps).
            # Sum-of-squares in f32 even under bf16 compute — bf16 norms of
            # wide rows (F=1140 assign head) are the main bf16 accuracy leak;
            # XLA fuses the cast so no extra HBM traffic.
            out32 = out.astype(jnp.float32)
            norm = jnp.linalg.norm(out32, axis=-1, keepdims=True)
            out = (out32 / jnp.maximum(norm, 1e-12)).astype(out.dtype)
        if mask is not None:
            out = out * mask[..., None].astype(out.dtype)
        return out


class GINConv(fnn.Module):
    """Dense/ELL GIN convolution, PyG-1.2.1 ``DenseGINConv`` with
    add_loop=False: out = mlp(A @ x), mlp = Linear(in->out), act,
    Linear(out->out) (reference model/network.py:96-99)."""

    features: int
    act: str = "relu"

    @fnn.compact
    def __call__(
        self,
        x: jax.Array,
        adj: Adjacency,
        mask: Optional[jax.Array] = None,
        *,
        agg: Optional[jax.Array] = None,
    ) -> jax.Array:
        out = adj.matvec(x) if agg is None else agg
        out = TorchLinear(self.features, name="mlp_0")(out)
        out = activation(self.act)(out)
        out = TorchLinear(self.features, name="mlp_1")(out)
        if mask is not None:
            out = out * mask[..., None].astype(out.dtype)
        return out


class GATConv(fnn.Module):
    """Dot-product (multi-head) attention message passing over the same
    Adjacency abstraction — a capability extension beyond the reference's
    binary SAGE/GIN (select with ``gcn_name='GAT'``).

    Per head h: out_i = sum_j alpha^h_ij (W_v x_j)^h with alpha^h =
    softmax_j(<(W_q x_i)^h, (W_k x_j)^h> / sqrt(D)) over {i} ∪ N(i); heads
    concatenate back to ``features``. On ELL graphs the neighbour k/v rows
    are gathered once and scored per head; pooled dense stages mask the full
    score matrix by adjacency support. Softmax in f32 under bf16 compute
    like the rest of the precision policy.
    """

    features: int
    heads: int = 1
    use_bias: bool = True

    @fnn.compact
    def __call__(
        self,
        x: jax.Array,
        adj: Adjacency,
        mask: Optional[jax.Array] = None,
        *,
        agg: Optional[jax.Array] = None,
    ) -> jax.Array:
        del agg  # attention cannot share a precomputed aggregation
        from cgcnet_tpu.nn.adjacency import DenseAdj, EllAdj, EllAdjFactored

        assert self.features % self.heads == 0, (self.features, self.heads)
        h, d = self.heads, self.features // self.heads
        q = TorchLinear(self.features, use_bias=self.use_bias, name="q")(x)
        k = TorchLinear(self.features, use_bias=self.use_bias, name="k")(x)
        v = TorchLinear(self.features, use_bias=self.use_bias, name="v")(x)
        scale = 1.0 / (d ** 0.5)
        b, n = x.shape[0], x.shape[1]
        neg = jnp.finfo(jnp.float32).min
        if isinstance(adj, DenseAdj):
            qh = q.reshape(b, n, h, d)
            kh = k.reshape(b, n, h, d)
            logits = jnp.einsum(
                "bihd,bjhd->bhij", qh, kh, preferred_element_type=jnp.float32
            ) * scale
            support = (adj.adj > 0)[:, None]
            logits = jnp.where(support, logits.astype(jnp.float32), neg)
            alpha = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
            # rows with no support would softmax to uniform garbage
            alpha = alpha * (adj.rowsum() > 0)[:, None, :, None].astype(
                x.dtype
            )
            out = jnp.einsum(
                "bhij,bjhd->bihd", alpha, v.reshape(b, n, h, d),
                preferred_element_type=x.dtype,
            ).reshape(b, n, self.features)
        else:
            if isinstance(adj, EllAdjFactored):
                nbr, slot_mask = adj.nbr, adj.off_mask
            else:
                assert isinstance(adj, EllAdj)
                row = jnp.arange(adj.nbr.shape[1], dtype=adj.nbr.dtype)
                slot_mask = (adj.w > 0).astype(x.dtype) * (
                    adj.nbr != row[None, :, None]
                )
                nbr = adj.nbr
            kk = nbr.shape[2]
            # gather neighbour k/v rows ONCE, score all heads from them
            gk = jax.vmap(lambda i, a: a[i])(nbr, k)     # [B, N, K, F]
            gv = jax.vmap(lambda i, a: a[i])(nbr, v)
            qh = q.reshape(b, n, h, d)
            e_nbr = jnp.einsum(
                "bnhd,bnkhd->bnkh", qh, gk.reshape(b, n, kk, h, d),
                preferred_element_type=jnp.float32,
            )
            e_self = jnp.einsum(
                "bnhd,bnhd->bnh", qh, k.reshape(b, n, h, d),
                preferred_element_type=jnp.float32,
            )[:, :, None]
            # scores over [self ++ K off-diagonal slots], softmax in f32
            scores = (
                jnp.concatenate([e_self, e_nbr], axis=2).astype(jnp.float32)
                * scale
            )
            smask = jnp.concatenate(
                [jnp.ones((b, n, 1), jnp.float32),
                 slot_mask.astype(jnp.float32)], -1
            )[..., None]
            scores = jnp.where(smask > 0, scores, neg)
            m = jnp.max(scores, axis=2, keepdims=True)
            ex = jnp.exp(scores - jax.lax.stop_gradient(m)) * smask
            alpha = (ex / jnp.sum(ex, 2, keepdims=True)).astype(x.dtype)
            vh = v.reshape(b, n, h, d)
            out = (
                alpha[:, :, 0, :, None] * vh
                + jnp.einsum(
                    "bnkh,bnkhd->bnhd", alpha[:, :, 1:],
                    gv.reshape(b, n, kk, h, d),
                    preferred_element_type=x.dtype,
                )
            ).reshape(b, n, self.features)
        if mask is not None:
            out = out * mask[..., None].astype(out.dtype)
        return out


class TorchLinearStatic(fnn.Module):
    """`TorchLinear` with a statically declared fan-in: params live in
    ``setup`` so callers can read ``.kernel`` / ``.bias_p`` directly (the
    folded assign-tail scales the kernel by the BN affine — nn/blocks.py).
    Identical init, param layout ("kernel"/"bias") and compute."""

    in_features: int
    features: int
    use_bias: bool = True

    def setup(self):
        init = _torch_linear_init(self.in_features)
        self.kernel = self.param(
            "kernel", init, (self.in_features, self.features)
        )
        self.bias_p = (
            self.param("bias", init, (self.features,)) if self.use_bias else None
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        y = x @ self.kernel.astype(x.dtype)
        if self.bias_p is not None:
            y = y + self.bias_p.astype(x.dtype)
        return y


class TorchBatchNorm(fnn.Module):
    """BatchNorm1d with torch semantics over a [..., C] input flattened to
    rows: biased variance for normalization, unbiased for the running-stat
    update, momentum 0.1, eps 1e-5.

    ``mask`` (row weights, broadcastable to the row axes) restricts statistics
    to real nodes — the TPU build's fix for the reference's BN-over-padding
    quirk (model/network.py:101-107). Without a mask the quirk is reproduced
    exactly.

    ``moments``/``folded_affine`` expose the normalization statistics without
    applying them, so wide layers can fold the affine into a following
    linear's kernel instead of materializing the normalized tensor
    (nn/blocks.py::GNNBlock.finish_folded).
    """

    features: int
    momentum: float = 0.1
    eps: float = 1e-5

    def setup(self):
        self.scale_p = self.param(
            "scale", fnn.initializers.ones, (self.features,)
        )
        self.bias_p = self.param(
            "bias", fnn.initializers.zeros, (self.features,)
        )
        self.ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(self.features, jnp.float32)
        )
        self.ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(self.features, jnp.float32)
        )

    def moments(
        self,
        x: jax.Array,
        use_running_average: bool,
        mask: Optional[jax.Array] = None,
    ) -> tuple[jax.Array, jax.Array]:
        """(mean[C], biased var[C]) used for normalization; updates running
        stats in training mode exactly like ``__call__``."""
        reduce_axes = tuple(range(x.ndim - 1))
        if use_running_average:
            return self.ra_mean.value, self.ra_var.value
        xf = x.astype(jnp.float32)
        if mask is None:
            n = jnp.asarray(
                jnp.prod(jnp.asarray(x.shape[:-1])), dtype=jnp.float32
            )
            mean = jnp.mean(xf, axis=reduce_axes)
            var = jnp.mean(jnp.square(xf - mean), axis=reduce_axes)
        else:
            m = jnp.broadcast_to(
                mask.astype(jnp.float32)[..., None], x.shape
            )
            n = jnp.maximum(jnp.sum(m) / self.features, 1.0)
            mean = jnp.sum(xf * m, axis=reduce_axes) / n
            var = jnp.sum(jnp.square(xf - mean) * m, axis=reduce_axes) / n
        if not self.is_initializing():
            unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
            self.ra_mean.value = (
                (1.0 - self.momentum) * self.ra_mean.value + self.momentum * mean
            )
            self.ra_var.value = (
                (1.0 - self.momentum) * self.ra_var.value
                + self.momentum * unbiased
            )
        return mean, var

    def update_running(
        self, mean: jax.Array, var: jax.Array, n: jax.Array
    ) -> None:
        """Running-stat update from externally computed batch moments (the
        fused assign tail computes them inside its custom VJP,
        ops/pallas/assign_head.py::assign_tail_train) — same biased/unbiased
        split and momentum as ``moments``."""
        if self.is_initializing():
            return
        n = jnp.maximum(jnp.asarray(n, jnp.float32), 1.0)
        unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
        self.ra_mean.value = (
            (1.0 - self.momentum) * self.ra_mean.value + self.momentum * mean
        )
        self.ra_var.value = (
            (1.0 - self.momentum) * self.ra_var.value + self.momentum * unbiased
        )

    def folded_affine(
        self, mean: jax.Array, var: jax.Array
    ) -> tuple[jax.Array, jax.Array]:
        """BN as x*inv + shift (f32): inv = rsqrt(var+eps)*scale,
        shift = bias - mean*inv."""
        inv = jax.lax.rsqrt(var + self.eps) * self.scale_p
        return inv, self.bias_p - mean * inv

    def __call__(
        self,
        x: jax.Array,
        use_running_average: bool,
        mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        mean, var = self.moments(x, use_running_average, mask)
        inv = jax.lax.rsqrt(var + self.eps) * self.scale_p
        return ((x - mean) * inv + self.bias_p).astype(x.dtype)
