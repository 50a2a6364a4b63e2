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


class _LSTMParams(fnn.Module):
    """Parameter container matching TorchLSTM's tree exactly (names, shapes,
    init distribution — param init RNG folds on the path name, so values are
    identical too). Lets DenseJK run the all-2D fused computation below
    without materializing any [M, T, C]-stacked tensor."""

    hidden: int
    c_in: int

    @fnn.compact
    def __call__(self) -> dict:
        init = _lstm_uniform(self.hidden)
        out = {}
        for sfx in ("_l0", "_l0_reverse"):
            out[f"weight_ih{sfx}"] = self.param(
                f"weight_ih{sfx}", init, (4 * self.hidden, self.c_in)
            )
            out[f"weight_hh{sfx}"] = self.param(
                f"weight_hh{sfx}", init, (4 * self.hidden, self.hidden)
            )
            out[f"bias_ih{sfx}"] = self.param(
                f"bias_ih{sfx}", init, (4 * self.hidden,)
            )
            out[f"bias_hh{sfx}"] = self.param(
                f"bias_hh{sfx}", init, (4 * self.hidden,)
            )
        return out


def bilstm_attend_2d(p: dict, h: jax.Array, channels: int, layers: int = 3):
    """biLSTM-over-layers + attention + weighted sum, every tensor 2D.

    ``p`` = {"lstm": TorchLSTM param dict, "att": {"kernel", "bias"}},
    ``h`` = [n, layers*channels] (the un-stacked conv concat). Returns
    [n, channels].

    Rationale (round 5): the stacked [n, T, C] layout tiles T=3 sublanes to
    8 and C=20 lanes to 128 (~17x the true bytes per tensor — at 100k
    nuclei each such tensor costs ~200 MB of HBM traffic instead of 12),
    and per-step input matmuls add ~10 latency-class launches. Here:

    - ONE block-structured input-projection matmul covers all six
      (timestep, direction) gate pre-activations (the bwd direction's step
      s reads slice T-1-s — a column-block permutation of the same kernel,
      so no reversed copy of the input exists);
    - the two directions' recurrent matmuls run concatenated per step
      (block-diagonal kernel) and step 0 skips its recurrent term entirely
      (h_0 = c_0 = 0);
    - the attention head is one [n, 2H*T] @ [2H*T, T] block matmul and the
      weighted sum is a lane-sliced 2D fusion.

    The extra kernel blocks are exact zeros and f32 MXU accumulation of
    zeros is exact, so outputs match the stacked form to rounding
    (~1e-6 f32; parity pinned by tests/test_parity_torch.py against the
    pure-torch oracle and tests/test_mega_model.py across paths)."""
    n = h.shape[0]
    assert h.shape[-1] == channels * layers, (h.shape, channels, layers)
    lp = p["lstm"]
    dt = h.dtype
    c, t_len = channels, layers
    hdim = lp["weight_hh_l0"].shape[1]
    g4 = 4 * hdim
    gpad = -(-g4 // 128) * 128  # lane-align each gate block's column start

    w_ih = {s: lp[f"weight_ih{s}"] for s in ("_l0", "_l0_reverse")}
    w_hh = {s: lp[f"weight_hh{s}"] for s in ("_l0", "_l0_reverse")}
    bias = {
        s: (lp[f"bias_ih{s}"] + lp[f"bias_hh{s}"]).astype(dt)
        for s in ("_l0", "_l0_reverse")
    }

    def _pad(k):  # [rows, g4] -> [rows, gpad]
        return jnp.pad(k, ((0, 0), (0, gpad - g4))) if gpad != g4 else k

    # input projection: gx[:, blk(j)] = x_src(j) @ w_ih_dir(j).T for the six
    # column blocks j = (fwd t0..t2, bwd s0..s2); bwd step s reads source
    # slice t_len-1-s. Row strip r contributes to fwd block r and bwd block
    # t_len-1-r.
    strips = []
    zero = jnp.zeros((c, gpad), jnp.float32)
    for r in range(t_len):
        blocks = [
            _pad(w_ih["_l0"].T) if j == r else zero for j in range(t_len)
        ] + [
            _pad(w_ih["_l0_reverse"].T) if t_len - 1 - j == r else zero
            for j in range(t_len)
        ]
        strips.append(jnp.concatenate(blocks, axis=1))
    k_in = jnp.concatenate(strips, axis=0).astype(dt)  # [T*C, 2*T*gpad]
    gx = h @ k_in                                      # [n, 2*T*gpad]

    # recurrent kernel: [2H, 2*gpad] block-diag over directions
    k_hh = jnp.concatenate(
        [
            jnp.concatenate(
                [_pad(w_hh["_l0"].T), jnp.zeros((hdim, gpad), jnp.float32)],
                axis=1,
            ),
            jnp.concatenate(
                [jnp.zeros((hdim, gpad), jnp.float32),
                 _pad(w_hh["_l0_reverse"].T)],
                axis=1,
            ),
        ],
        axis=0,
    ).astype(dt)
    b_cat = jnp.concatenate([bias["_l0"], bias["_l0_reverse"]])  # [2*g4]

    def cell(gates_cat, c_cat):
        # gates_cat [n, 2*g4] = both directions' (i, f, g, o); c_cat [n, 2H]
        i = jnp.concatenate(
            [gates_cat[:, :hdim], gates_cat[:, g4:g4 + hdim]], axis=1
        )
        f = jnp.concatenate(
            [gates_cat[:, hdim:2 * hdim],
             gates_cat[:, g4 + hdim:g4 + 2 * hdim]], axis=1
        )
        g = jnp.concatenate(
            [gates_cat[:, 2 * hdim:3 * hdim],
             gates_cat[:, g4 + 2 * hdim:g4 + 3 * hdim]], axis=1
        )
        o = jnp.concatenate(
            [gates_cat[:, 3 * hdim:4 * hdim],
             gates_cat[:, g4 + 3 * hdim:g4 + 4 * hdim]], axis=1
        )
        c_new = jax.nn.sigmoid(f) * c_cat + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        return h_new, c_new

    def gx_step(s):
        # fwd block s ++ bwd block s, un-padded to g4 columns
        return jnp.concatenate(
            [gx[:, s * gpad:s * gpad + g4],
             gx[:, (t_len + s) * gpad:(t_len + s) * gpad + g4]],
            axis=1,
        ) + b_cat

    hs = []  # per step s: [n, 2H] = [h_fwd_s | h_bwd_s]
    h_cat, c_cat = cell(gx_step(0), jnp.zeros((n, 2 * hdim), dt))
    hs.append(h_cat)
    for s in range(1, t_len):
        rec = h_cat @ k_hh  # [n, 2*gpad]
        gates = gx_step(s) + jnp.concatenate(
            [rec[:, :g4], rec[:, gpad:gpad + g4]], axis=1
        )
        h_cat, c_cat = cell(gates, c_cat)
        hs.append(h_cat)

    # attention: alpha[:, t] = h_fwd_t @ wf + h_bwd_{T-1-t} @ wb + b_att
    # (bwd step s corresponds to original position T-1-s)
    ak = p["att"]["kernel"]  # [2H, 1]
    wf, wb = ak[:hdim, 0], ak[hdim:, 0]
    att_strips = []
    for s in range(t_len):
        col_f = jnp.zeros((hdim, t_len), jnp.float32).at[:, s].set(wf)
        col_b = (
            jnp.zeros((hdim, t_len), jnp.float32)
            .at[:, t_len - 1 - s].set(wb)
        )
        att_strips.append(jnp.concatenate([col_f, col_b], axis=0))
    k_att = jnp.concatenate(att_strips, axis=0).astype(dt)  # [T*2H, T]
    ab = p["att"].get("bias")
    alpha = jnp.concatenate(hs, axis=1) @ k_att + (
        ab.astype(dt) if ab is not None else 0.0
    )
    # layer-attention softmax in f32 (precision-policy island)
    alpha = jax.nn.softmax(alpha.astype(jnp.float32), -1).astype(dt)
    out = jnp.zeros((n, c), dt)
    for t in range(t_len):
        out = out + alpha[:, t:t + 1] * h[:, t * c:(t + 1) * c]
    return out


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
        # torch: hidden = channels * num_layers // 2, bidirectional
        hidden = c * t // 2
        # all-2D fused path (round 5) — no [B*N, T, C] stacked tensor ever
        # exists (17x layout padding at T=3/C=20); param tree identical to
        # the TorchLSTM + TorchLinear layout so checkpoints and the torch
        # oracle transplant are unaffected
        from cgcnet_tpu.nn.layers import TorchLinearStatic

        lp = _LSTMParams(hidden, c, name="lstm")()
        att = TorchLinearStatic(2 * hidden, 1, name="att")
        p = {"lstm": lp, "att": {"kernel": att.kernel, "bias": att.bias_p}}
        out = bilstm_attend_2d(p, xs.reshape(b * n, total), c, t)
        return out.reshape(b, n, c)
