"""Jumping-knowledge layer attention (reference ``DenseJK``,
model/network.py:11-55).

A bidirectional LSTM runs over the *layer axis* (length 3: the three conv
outputs of a GNN block), an attention head scores each layer, and the softmax-
weighted sum collapses [B, N, 3C] -> [B, N, C].

The LSTM is implemented cell-for-cell with torch's gate ordering
(i, f, g, o; both ``b_ih`` and ``b_hh`` biases) so reference checkpoints map
1:1 onto the parameter tree. Sequence length is a static 3, so the scan is a
trivially unrollable loop — XLA fuses it; no custom kernel needed
(SURVEY.md §2.3 P5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as fnn

from cgcnet_tpu.nn.layers import TorchLinear


def _lstm_uniform(hidden: int):
    bound = 1.0 / (hidden ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class TorchLSTM(fnn.Module):
    """Single-layer (optionally bidirectional) LSTM, torch parameterization.

    Input [M, T, C] (batch_first), returns outputs [M, T, H*dirs].
    Parameters use torch's [4H, C] / [4H, H] layouts and (i, f, g, o) gate
    order, enabling direct weight transplant in parity tests.
    """

    hidden: int
    bidirectional: bool = True

    def _direction(self, x: jax.Array, suffix: str) -> jax.Array:
        c_in = x.shape[-1]
        h = self.hidden
        init = _lstm_uniform(h)
        w_ih = self.param(f"weight_ih{suffix}", init, (4 * h, c_in))
        w_hh = self.param(f"weight_hh{suffix}", init, (4 * h, h))
        b_ih = self.param(f"bias_ih{suffix}", init, (4 * h,))
        b_hh = self.param(f"bias_hh{suffix}", init, (4 * h,))

        m, t_len = x.shape[0], x.shape[1]
        dt = x.dtype
        # input projection for ALL timesteps in one matmul; the unrolled
        # per-step loop (T is a static 3) only adds the recurrent term —
        # a lax.scan here costs ~300 us/step of dynamic-update-slice
        # stacking and copies at the canonical [4*5760, 3, 20] shape
        gx = x @ w_ih.T.astype(dt) + (b_ih + b_hh).astype(dt)  # [M, T, 4H]
        w_hh_t = w_hh.T.astype(dt)
        h_t = jnp.zeros((m, h), dt)
        c_t = jnp.zeros((m, h), dt)
        ys = []
        for step in range(t_len):
            gates = gx[:, step, :] + h_t @ w_hh_t
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c_t = jax.nn.sigmoid(f) * c_t + jax.nn.sigmoid(i) * jnp.tanh(g)
            h_t = jax.nn.sigmoid(o) * jnp.tanh(c_t)
            ys.append(h_t)
        return jnp.stack(ys, axis=1)  # [M, T, H]

    @fnn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        out_f = self._direction(x, "_l0")
        if not self.bidirectional:
            return out_f
        out_b = self._direction(x[:, ::-1, :], "_l0_reverse")[:, ::-1, :]
        return jnp.concatenate([out_f, out_b], axis=-1)


class DenseJK(fnn.Module):
    """Jumping-knowledge aggregation: [B, N, num_layers*C] -> reduced.

    mode='lstm' (the only mode the reference actually implements,
    model/network.py:16-26) attends over layers with a biLSTM ->
    [B, N, C]. The reference *asserts* 'cat'/'max' but never implements
    them (model/network.py:16); here they work: 'cat' is identity over the
    concat, 'max' takes the elementwise max across layer slices.
    """

    channels: int
    num_layers: int = 3
    mode: str = "lstm"

    @fnn.compact
    def __call__(self, xs: jax.Array) -> jax.Array:
        assert self.mode in ("cat", "max", "lstm")
        if self.mode == "cat":
            return xs
        b, n, total = xs.shape
        c, t = self.channels, self.num_layers
        assert total == c * t, (total, c, t)
        if self.mode == "max":
            return jnp.max(
                jnp.stack(jnp.split(xs, t, axis=-1), axis=0), axis=0
            )
        # split into layer slices and stack: [B*N, T, C]
        x = jnp.stack(jnp.split(xs, t, axis=-1), axis=2).reshape(b * n, t, c)
        # torch: hidden = channels * num_layers // 2, bidirectional
        hidden = c * t // 2
        alpha = TorchLSTM(hidden, bidirectional=True, name="lstm")(x)
        alpha = TorchLinear(1, name="att")(alpha)[..., 0]        # [B*N, T]
        # length-3 attention softmax in f32 under bf16 compute (cheap, and
        # the weights gate the whole stage readout)
        alpha = jax.nn.softmax(alpha.astype(jnp.float32), axis=-1).astype(
            x.dtype
        )
        out = jnp.sum(x * alpha[..., None], axis=1)              # [B*N, C]
        return out.reshape(b, n, c)
