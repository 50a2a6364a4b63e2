"""GNN block and DiffPool (reference ``GNN_Module`` model/network.py:57-125
and ``_diff_pool`` model/network.py:194-208)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as fnn

from cgcnet_tpu.nn.adjacency import Adjacency
from cgcnet_tpu.nn.layers import (
    GATConv,
    GINConv,
    SAGEConv,
    TorchBatchNorm,
    TorchLinearStatic,
    activation,
)


class GNNBlock(fnn.Module):
    """Three stacked convolutions, each act+BN, concat of the three outputs.

    ``lin=True`` (pooling blocks) maps the concat down to ``embedding_dim``
    (reference model/network.py:78-82). BN runs over flattened [B*N, C]
    (model/network.py:101-107); with ``masked_bn`` the statistics exclude
    padded rows (TPU-build fix; set False for reference-quirk parity).

    Besides the plain ``__call__``, the block exposes ``conv_step``/``finish``
    so the model can interleave two blocks over one shared aggregation (the
    embed/pool pair of each stage reads the same adjacency — see
    nn/model.py stage 1).
    """

    hidden_dim: int
    embedding_dim: int
    use_bias: bool = True
    use_bn: bool = True
    use_lin: bool = True
    gcn_name: str = "SAGE"
    act: str = "relu"
    masked_bn: bool = True
    gat_heads: int = 1
    # Static input width (SAGE only). Declares every conv lin's fan-in up
    # front so the paired path can merge the two streams' lins into one
    # matmul (_dual_lin). None keeps the lazy fan-in path.
    input_dim: Optional[int] = None
    # Fold bn3's affine into the lin kernel (mathematically identical up to
    # fp reassociation) — the 1140-wide assign head never materializes the
    # BN output or the [.., 2h+C] concat. Only takes effect with
    # use_lin and use_bn.
    fold_tail: bool = False

    def setup(self):
        # setup(): names come from the attribute names (param-tree layout
        # matches the reference module names for checkpoint transplant)
        def conv(idx, features):
            if self.gcn_name == "SAGE":
                fin = (self.input_dim, self.hidden_dim, self.hidden_dim)[
                    idx - 1
                ]
                return SAGEConv(
                    features, use_bias=self.use_bias, in_features=fin
                )
            if self.gcn_name == "GAT":
                return GATConv(
                    features, heads=self.gat_heads, use_bias=self.use_bias
                )
            return GINConv(features, act=self.act)

        self.gcn1 = conv(1, self.hidden_dim)
        self.gcn2 = conv(2, self.hidden_dim)
        self.gcn3 = conv(3, self.embedding_dim)
        if self.use_bn:
            self.bn1 = TorchBatchNorm(self.hidden_dim)
            self.bn2 = TorchBatchNorm(self.hidden_dim)
            self.bn3 = TorchBatchNorm(self.embedding_dim)
        if self.use_lin:
            self.lin = TorchLinearStatic(
                in_features=2 * self.hidden_dim + self.embedding_dim,
                features=self.embedding_dim,
            )

    # ------------------------------------------------------------------
    def conv_step(
        self,
        i: int,
        x: jax.Array,
        adj: Adjacency,
        mask: Optional[jax.Array],
        *,
        train: bool = False,
        agg: Optional[jax.Array] = None,
        apply_bn: bool = True,
        raw: bool = False,
    ) -> jax.Array:
        """conv_i -> activation -> bn_i. ``agg`` optionally supplies the
        precomputed neighbourhood aggregation A @ x. ``apply_bn=False``
        returns the pre-BN activation (the folded tail consumes it);
        ``raw`` (SAGE only) returns the conv's raw lin output — normalize,
        mask, activation and BN all deferred to the fused tail
        (``finish_folded_pre``)."""
        conv = (self.gcn1, self.gcn2, self.gcn3)[i - 1]
        if raw:
            assert self.gcn_name == "SAGE", self.gcn_name
            return conv(x, adj, mask, agg=agg, pre_normalize=True)
        h = conv(x, adj, mask, agg=agg)
        h = activation(self.act)(h)
        if self.use_bn and apply_bn:
            bn = (self.bn1, self.bn2, self.bn3)[i - 1]
            bn_mask = mask if self.masked_bn else None
            h = bn(h, use_running_average=not train, mask=bn_mask)
        return h

    def bn_affine(self, i: int) -> tuple[jax.Array, jax.Array, float]:
        """(scale, bias, eps) of bn_i — read by the dual-stream tail, which
        normalizes both paired streams with one concatenated affine."""
        bn = (self.bn1, self.bn2, self.bn3)[i - 1]
        return bn.scale_p, bn.bias_p, bn.eps

    def bn_push(self, i: int, mean, var, n) -> None:
        """Running-stat update of bn_i from externally computed moments
        (the dual-stream tail computes both streams' statistics in one
        kernel and pushes each block its slice)."""
        (self.bn1, self.bn2, self.bn3)[i - 1].update_running(mean, var, n)

    def bn_moments(self, i: int) -> tuple[jax.Array, jax.Array]:
        """bn_i's running (mean, var) — the eval-mode dual tail normalizes
        with the stored statistics."""
        bn = (self.bn1, self.bn2, self.bn3)[i - 1]
        return bn.ra_mean.value, bn.ra_var.value

    def lin_params(self, i: int):
        """conv_i's (kernel, bias) — read by the merged dual-stream lin
        (SAGE with a static ``input_dim`` only)."""
        return (self.gcn1, self.gcn2, self.gcn3)[i - 1].lin_params()

    @property
    def folds_tail(self) -> bool:
        return self.fold_tail and self.use_lin and self.use_bn

    @property
    def folds_norm(self) -> bool:
        """Whether the deeper ``finish_folded_pre`` tail applies: needs the
        L2-normalizing SAGE conv and relu (the kernel exploits
        relu(l2norm(p)) == rnorm * relu(p), which needs a positively
        homogeneous activation — relu — and normalize=True)."""
        return (
            self.folds_tail and self.gcn_name == "SAGE" and self.act == "relu"
        )

    def finish_folded_pre(
        self,
        x1: jax.Array,
        x2: jax.Array,
        p: jax.Array,
        mask: Optional[jax.Array],
        *,
        train: bool = False,
    ) -> tuple[jax.Array, jax.Array]:
        """Deepest assign-tail fusion: ``p`` is conv3's RAW lin output
        (pre-normalize, pre-mask, pre-act — ``conv_step(..., raw=True)``).
        L2-normalize, relu, BN statistics, the BN-folded lin and the masked
        softmax are all computed by two Pallas passes over ``p``
        (ops/pallas/assign_head.py) — conv3's activation tensor and the
        assign logits never reach HBM. Returns (S, S^T).

        Bit-compatible with ``finish_folded(..., fused_softmax=True)`` fed
        by the unfused conv3 chain, up to single-pass-variance rounding in
        the BN statistics.
        """
        from cgcnet_tpu.ops.pallas.assign_head import (
            assign_head_softmax_pre,
            assign_tail_train,
        )

        dt = p.dtype
        m = (
            mask.astype(dt)
            if mask is not None
            else jnp.ones(p.shape[:2], dt)
        )
        split = x1.shape[-1] + x2.shape[-1]
        k = self.lin.kernel
        k12, k3 = k[:split], k[split:]
        lin_bias = (
            self.lin.bias_p
            if self.lin.bias_p is not None
            else jnp.zeros((k.shape[1],), jnp.float32)
        )
        x12 = jnp.concatenate([x1, x2], axis=-1)
        if train:
            # masked_bn: statistics over real rows only; otherwise reproduce
            # the reference's padded-row quirk — padded rows of the
            # activation are exactly zero, so only the divisor changes
            n = (
                jnp.sum(m.astype(jnp.float32))
                if self.masked_bn
                else jnp.asarray(p.shape[0] * p.shape[1], jnp.float32)
            )
            s, s_t, mean, var = assign_tail_train(
                x12, p, k12, k3, lin_bias, self.bn3.scale_p,
                self.bn3.bias_p, m, n, self.bn3.eps,
            )
            self.bn3.update_running(mean, var, n)
            return s, s_t
        inv, shift = self.bn3.folded_affine(
            self.bn3.ra_mean.value, self.bn3.ra_var.value
        )
        k3f = inv[:, None] * k3
        const = shift @ k3 + lin_bias
        return assign_head_softmax_pre(x12, p, k12, k3f, const, m)

    def finish_folded(
        self,
        x1: jax.Array,
        x2: jax.Array,
        h3a: jax.Array,
        mask: Optional[jax.Array],
        *,
        train: bool = False,
        fused_softmax: bool = False,
    ) -> jax.Array | tuple[jax.Array, jax.Array]:
        """``bn3 -> concat -> mask -> lin -> mask`` with the BN affine folded
        into the lin kernel.

        ``h3a`` is conv3's pre-BN activation (already masked by the conv).
        Algebra: lin(concat(x1, x2, (h3a - mu)*inv + beta)) * mask
               = (concat(x1, x2) @ K12 + h3a @ (inv*K3)
                  + ((beta - mu*inv) @ K3 + bias)) * mask
        — identical up to fp reassociation, but the [B, N, C3] BN output and
        the [B, N, 2h+C3] concat never exist, forward or backward. BN batch
        statistics and running-stat updates are unchanged (``moments``).
        Padded rows: x1/x2/h3a are zero there, so only the constant term
        leaks — killed by the final mask, exactly like ``finish``'s
        mask-before-lin zeroing of the BN output.
        """
        bn_mask = mask if self.masked_bn else None
        mean, var = self.bn3.moments(
            h3a, use_running_average=not train, mask=bn_mask
        )
        inv, shift = self.bn3.folded_affine(mean, var)      # f32 [C3]
        split = x1.shape[-1] + x2.shape[-1]
        k = self.lin.kernel                                  # f32 [2h+C3, C]
        k12, k3 = k[:split], k[split:]
        k3f = inv[:, None] * k3
        const = shift @ k3 + (
            self.lin.bias_p if self.lin.bias_p is not None else 0.0
        )
        dt = h3a.dtype
        x12 = jnp.concatenate([x1, x2], axis=-1)
        if fused_softmax:
            # one Pallas pass: matmul + softmax + mask, S emitted in both
            # consumer layouts — returns (S, S^T) instead of logits
            from cgcnet_tpu.ops.pallas.assign_head import assign_head_softmax

            m = (
                mask.astype(dt)
                if mask is not None
                else jnp.ones(h3a.shape[:2], dt)
            )
            return assign_head_softmax(x12, h3a, k12, k3f, const, m)
        out = (
            x12 @ k12.astype(dt)
            + h3a @ k3f.astype(dt)
            + const.astype(dt)
        )
        if mask is not None:
            out = out * mask[..., None].astype(dt)
        return out

    def finish(
        self, xs: list[jax.Array], mask: Optional[jax.Array]
    ) -> jax.Array:
        out = jnp.concatenate(xs, axis=-1)
        if mask is not None:
            out = out * mask[..., None].astype(out.dtype)
        if self.use_lin:
            out = self.lin(out)
            if mask is not None:
                out = out * mask[..., None].astype(out.dtype)
        return out

    def __call__(
        self,
        x: jax.Array,
        adj: Adjacency,
        mask: Optional[jax.Array] = None,
        *,
        train: bool = False,
    ) -> jax.Array:
        fold = self.folds_tail
        x1 = self.conv_step(1, x, adj, mask, train=train)
        x2 = self.conv_step(2, x1, adj, mask, train=train)
        x3 = self.conv_step(3, x2, adj, mask, train=train, apply_bn=not fold)
        if fold:
            return self.finish_folded(x1, x2, x3, mask, train=train)
        return self.finish([x1, x2, x3], mask)


def _dual_lin(
    e_blk: GNNBlock,
    p_blk: GNNBlock,
    i: int,
    agg: jax.Array,      # [B, N, in] shared (layer 1) or [B, N, 2F] concat
    denom: jax.Array,    # [B, N, 1] clamped rowsum (SAGEConv's divisor)
    *,
    shared_input: bool,
) -> jax.Array:
    """Both streams' conv_i lins as ONE matmul on the concatenated stream.

    Layer 1 reads the same aggregation, so the kernels concatenate along
    the output axis ([in, 2F]). Layers 2+ read the concatenated
    aggregation, so the kernels form a block-diagonal [2F, 2F] — the zero
    off-blocks contribute exact +0.0 terms to each dot product, leaving
    every output bit-identical to the two separate matmuls while halving
    the matmul count forward AND backward (dx and dK are one op each;
    the [*, <=40]-wide matmuls here are latency-, not FLOP-, bound).
    Returns the concatenated RAW lin outputs (pre-normalize, pre-mask —
    ``_dual_tail`` consumes them).
    """
    ke, be = e_blk.lin_params(i)
    kp, bp = p_blk.lin_params(i)
    h = agg / denom
    if shared_input:
        k = jnp.concatenate([ke, kp], axis=1)
    else:
        z_ep = jnp.zeros((ke.shape[0], kp.shape[1]), ke.dtype)
        z_pe = jnp.zeros((kp.shape[0], ke.shape[1]), kp.dtype)
        k = jnp.concatenate(
            [
                jnp.concatenate([ke, z_ep], axis=1),
                jnp.concatenate([z_pe, kp], axis=1),
            ],
            axis=0,
        )
    out = h @ k.astype(h.dtype)
    if be is not None or bp is not None:
        be = be if be is not None else jnp.zeros((ke.shape[1],), jnp.float32)
        bp = bp if bp is not None else jnp.zeros((kp.shape[1],), jnp.float32)
        out = out + jnp.concatenate([be, bp]).astype(out.dtype)
    return out


import functools as _ft


@_ft.partial(jax.custom_vjp, nondiff_argnums=(1,))
def dual_l2norm_2d(cat: jax.Array, f: int) -> jax.Array:
    """Row L2-normalize each half of a [..., 2F] dual-stream concat, all 2D.

    Math of ``F.normalize(p=2, dim=-1)`` per stream with f32
    sums-of-squares (SAGEConv's precision rule), but expressed as
    lane-slice reductions instead of a [..., 2, F] reshape: the 3D f32
    intermediate tiles 2 sublanes to 8 and F=20 lanes to 128 (~17x pad),
    and its autodiff emits {0,1}->{1,0} relayout copies of the broadcast
    norm (2 x 155 us/step at 100k nuclei, round-5 slide profile).

    Returns ``cat.dtype`` (the callers cast immediately anyway — same
    rounding point), and carries a hand-written VJP: the composable
    backward materialized ~1.7 ms/step of narrow-lane f32 slice pieces
    ([n, 20/40] f32 tensors pay 3-6x lane padding); this one computes
    d_cat = g/n - y * (sum(y*g)/n) per stream in one [..., 2F]-wide pass
    with f32 internals and bf16-container IO. The max(norm, eps) kink:
    for a zero row the norm is the eps constant (zero derivative), and
    the formula degenerates to g/eps exactly like autodiff's max rule."""
    out, _ = _dual_l2norm_fwd(cat, f)
    return out


def _dual_l2norm_fwd(cat, f):
    c32 = cat.astype(jnp.float32)
    a, b = c32[..., :f], c32[..., f:]
    na = jnp.maximum(
        jnp.sqrt(jnp.sum(a * a, axis=-1, keepdims=True)), 1e-12
    )
    nb = jnp.maximum(
        jnp.sqrt(jnp.sum(b * b, axis=-1, keepdims=True)), 1e-12
    )
    out = jnp.concatenate([a / na, b / nb], axis=-1).astype(cat.dtype)
    return out, cat


def _dual_l2norm_bwd(f, cat, g):
    c32 = cat.astype(jnp.float32)
    g32 = g.astype(jnp.float32)
    a, b = c32[..., :f], c32[..., f:]
    ga, gb = g32[..., :f], g32[..., f:]
    na = jnp.maximum(
        jnp.sqrt(jnp.sum(a * a, axis=-1, keepdims=True)), 1e-12
    )
    nb = jnp.maximum(
        jnp.sqrt(jnp.sum(b * b, axis=-1, keepdims=True)), 1e-12
    )
    # d(a/na) = g/na - a * (a.g)/na^3; on the clamped branch (norm < eps,
    # na == eps constant) d(na) = 0, so only g/na survives — the second
    # term must be ZEROED there (its /eps^3 would explode for near-zero
    # rows that autodiff's max rule protects)
    ra = jnp.where(
        na > 1e-12,
        jnp.sum(a * ga, axis=-1, keepdims=True) / (na * na * na),
        0.0,
    )
    rb = jnp.where(
        nb > 1e-12,
        jnp.sum(b * gb, axis=-1, keepdims=True) / (nb * nb * nb),
        0.0,
    )
    d = jnp.concatenate([ga / na - a * ra, gb / nb - b * rb], axis=-1)
    return (d.astype(cat.dtype),)


dual_l2norm_2d.defvjp(_dual_l2norm_fwd, _dual_l2norm_bwd)


def _dual_tail(
    e_blk: GNNBlock,
    p_blk: GNNBlock,
    i: int,
    cat: jax.Array,  # [B, N, 2F] concatenated RAW lin outputs (e ++ p)
    mask: Optional[jax.Array],
    *,
    train: bool,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """l2norm -> mask -> act -> BN for an equal-width (embed, pool) conv
    pair, computed on the feature-concatenated stream in SINGLE kernels.

    The per-op cost of every [B, 5760, <=60]-wide kernel on this chip is
    latency-, not bandwidth-, bound (benchmarks/op_floor.py: ~6-10 us
    marginal vs the 33-76 us the step profile shows per op), and F=20 and
    F=40 occupy the same one-vreg row — so running the two streams' tails
    as one kernel each halves the stage's small-op tail at unchanged
    per-op cost. Math is identical to the solo ``conv_step`` chains:
    the row l2-norms reduce over each stream's own F channels
    ([B,N,2,F] reshape) and BN statistics are per-channel, so channel
    concatenation does not mix the streams. Returns
    ``(cat, e_half, p_half)`` — ``cat`` (the post-BN concatenated stream)
    feeds the next layer's shared ``adj.matvec`` directly, skipping the
    re-concat the split path needed.
    """
    f = cat.shape[-1] // 2
    dt = cat.dtype
    b, n_nodes, _ = cat.shape
    # F.normalize(p=2, dim=-1) per stream (2D lane-slice form)
    h = dual_l2norm_2d(cat, f).astype(dt)
    if mask is not None:
        h = h * mask[..., None].astype(dt)
    h = activation(e_blk.act)(h)
    # dual BN: one moments pass over the concatenated channels
    # (TorchBatchNorm.moments math, nn/layers.py)
    se, be, eps = e_blk.bn_affine(i)
    sp, bp, _ = p_blk.bn_affine(i)
    scale = jnp.concatenate([se, sp])
    bias = jnp.concatenate([be, bp])
    if train:
        xf = h.astype(jnp.float32)
        if e_blk.masked_bn and mask is not None:
            m = jnp.broadcast_to(mask.astype(jnp.float32)[..., None], h.shape)
            n = jnp.maximum(jnp.sum(m) / (2 * f), 1.0)
            mean = jnp.sum(xf * m, axis=(0, 1)) / n
            var = jnp.sum(jnp.square(xf - mean) * m, axis=(0, 1)) / n
        else:
            n = jnp.asarray(b * n_nodes, jnp.float32)
            mean = jnp.mean(xf, axis=(0, 1))
            var = jnp.mean(jnp.square(xf - mean), axis=(0, 1))
        e_blk.bn_push(i, mean[:f], var[:f], n)
        p_blk.bn_push(i, mean[f:], var[f:], n)
    else:
        me, ve = e_blk.bn_moments(i)
        mp, vp = p_blk.bn_moments(i)
        mean = jnp.concatenate([me, mp])
        var = jnp.concatenate([ve, vp])
    inv = jax.lax.rsqrt(var + eps) * scale
    out = ((h - mean) * inv + bias).astype(dt)
    return out, out[..., :f], out[..., f:]


def paired_blocks(
    embed_blk: GNNBlock,
    pool_blk: GNNBlock,
    x: jax.Array,
    adj: Adjacency,
    mask: Optional[jax.Array],
    *,
    train: bool = False,
    pool_softmax: bool | str = False,
) -> tuple[jax.Array, jax.Array | tuple[jax.Array, jax.Array]]:
    """Run an (embed, pool) block pair over one shared aggregation stream.

    Layer 1 reads the same input — one A@x serves both; layers 2-3
    concatenate the two feature streams into a single matvec and split.
    Halves the number of sparse-aggregation kernel launches vs running the
    blocks independently, with bit-identical per-block math.

    ``pool_softmax``: False -> pool block returns assign logits; True ->
    fused softmax kernel returns (S, S^T); "pre" -> the deeper fold where
    conv3's normalize/relu/BN-stats also fuse into the kernel
    (``GNNBlock.finish_folded_pre``; requires ``folds_norm``).

    Attention convolutions (GAT) cannot share an aggregation — the blocks
    run independently there.
    """
    assert not (pool_softmax and not pool_blk.folds_tail)
    pre = pool_softmax == "pre"
    assert not pre or pool_blk.folds_norm
    if "GAT" in (embed_blk.gcn_name, pool_blk.gcn_name):
        if pool_softmax:
            x1 = pool_blk.conv_step(1, x, adj, mask, train=train)
            x2 = pool_blk.conv_step(2, x1, adj, mask, train=train)
            x3 = pool_blk.conv_step(
                3, x2, adj, mask, train=train, apply_bn=False
            )
            pool_out = pool_blk.finish_folded(
                x1, x2, x3, mask, train=train, fused_softmax=True
            )
        else:
            pool_out = pool_blk(x, adj, mask, train=train)
        return embed_blk(x, adj, mask, train=train), pool_out
    fold_p = pool_blk.folds_tail
    # dual-stream tails: layers whose two streams share width, activation
    # and BN settings run their l2norm/mask/act/BN chains as single
    # concatenated-stream kernels (_dual_tail) — the [*, <=60]-wide tail
    # ops are latency-bound, so halving their count halves their time
    can_dual = (
        embed_blk.gcn_name == "SAGE"
        and pool_blk.gcn_name == "SAGE"
        and embed_blk.use_bn
        and pool_blk.use_bn
        and embed_blk.act == pool_blk.act
        and embed_blk.masked_bn == pool_blk.masked_bn
        and embed_blk.hidden_dim == pool_blk.hidden_dim
    )
    # merged lins additionally need the static fan-in declared (and right)
    can_merge = (
        can_dual
        and embed_blk.input_dim == x.shape[-1]
        and pool_blk.input_dim == x.shape[-1]
    )
    agg1 = adj.matvec(x)
    if can_dual:
        denom = jnp.clip(adj.rowsum(), min=1.0)[..., None].astype(agg1.dtype)
        if can_merge:
            r1 = _dual_lin(
                embed_blk, pool_blk, 1, agg1, denom, shared_input=True
            )
        else:
            r1 = jnp.concatenate(
                [
                    embed_blk.conv_step(
                        1, x, adj, mask, train=train, agg=agg1, raw=True
                    ),
                    pool_blk.conv_step(
                        1, x, adj, mask, train=train, agg=agg1, raw=True
                    ),
                ],
                axis=-1,
            )
        cat, e1, p1 = _dual_tail(
            embed_blk, pool_blk, 1, r1, mask, train=train
        )
        e_outs, p_outs = [e1], [p1]
        f = embed_blk.hidden_dim
        agg = adj.matvec(cat)
        if can_merge:
            r2 = _dual_lin(
                embed_blk, pool_blk, 2, agg, denom, shared_input=False
            )
        else:
            agg_e, agg_p = jnp.split(agg, [f], axis=-1)
            r2 = jnp.concatenate(
                [
                    embed_blk.conv_step(
                        2, e1, adj, mask, train=train, agg=agg_e, raw=True
                    ),
                    pool_blk.conv_step(
                        2, p1, adj, mask, train=train, agg=agg_p, raw=True
                    ),
                ],
                axis=-1,
            )
        cat, e2, p2 = _dual_tail(
            embed_blk, pool_blk, 2, r2, mask, train=train
        )
        e_outs.append(e2)
        p_outs.append(p2)
        # layer 3: output widths differ (embedding_dim vs assign dim) and
        # the pool stream usually folds into the Pallas assign head — the
        # streams run their own tails
        agg = adj.matvec(cat)
        agg_e, agg_p = jnp.split(agg, [f], axis=-1)
        e_outs.append(
            embed_blk.conv_step(3, e2, adj, mask, train=train, agg=agg_e)
        )
        p_outs.append(
            pool_blk.conv_step(
                3, p2, adj, mask, train=train, agg=agg_p,
                apply_bn=not fold_p, raw=pre,
            )
        )
    else:
        e = embed_blk.conv_step(1, x, adj, mask, train=train, agg=agg1)
        p = pool_blk.conv_step(1, x, adj, mask, train=train, agg=agg1)
        e_outs, p_outs = [e], [p]
        for i in (2, 3):
            he = e_outs[-1]
            hp = p_outs[-1]
            cat = jnp.concatenate([he, hp], axis=-1)
            agg = adj.matvec(cat)
            agg_e, agg_p = jnp.split(agg, [he.shape[-1]], axis=-1)
            e_outs.append(
                embed_blk.conv_step(i, he, adj, mask, train=train, agg=agg_e)
            )
            p_outs.append(
                pool_blk.conv_step(
                    i, hp, adj, mask, train=train, agg=agg_p,
                    apply_bn=(i != 3 or not fold_p),
                    raw=(i == 3 and pre),
                )
            )
    if pre:
        pool_out = pool_blk.finish_folded_pre(*p_outs, mask, train=train)
    elif fold_p:
        pool_out = pool_blk.finish_folded(
            *p_outs, mask, train=train, fused_softmax=bool(pool_softmax)
        )
    else:
        pool_out = pool_blk.finish(p_outs, mask)
    return embed_blk.finish(e_outs, mask), pool_out


def diff_pool(
    x: jax.Array,
    adj: Adjacency,
    assign_logits: jax.Array,
    mask: Optional[jax.Array] = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """DiffPool: S = softmax(logits); x' = S^T x; adj' = S^T A S.

    Matches reference ``_diff_pool`` (model/network.py:194-208): softmax over
    the cluster axis, row-masking of padded nodes, no auxiliary losses (the
    reference trains with classification CE only, model/network.py:288-290).

    Returns (pooled_x [B,C,F], pooled_adj [B,C,C], S [B,N,C]).
    """
    # softmax in f32 under bf16 compute (1140-wide normalization), cast back
    # so the S^T contractions stay on the bf16 MXU path
    s = jax.nn.softmax(assign_logits.astype(jnp.float32), axis=-1).astype(
        assign_logits.dtype
    )
    if mask is not None:
        s = s * mask[..., None].astype(s.dtype)
    pooled_x = jnp.einsum("bnc,bnf->bcf", s, x, preferred_element_type=x.dtype)
    pooled_adj = adj.quadform(s)
    return pooled_x, pooled_adj, s


@jax.custom_vjp
def _contract_dual_pair(
    s_t: jax.Array,  # [B, C, N] (kernel-emitted transpose of s)
    s: jax.Array,    # [B, N, C] (same values)
    x: jax.Array,    # [B, N, F]
    a_s: jax.Array,  # [B, N, C]
) -> tuple[jax.Array, jax.Array]:
    """(S^T x, S^T (A S)) as ONE feature-concatenated contraction pair.

    The caller guarantees ``s_t == swapaxes(s, 1, 2)`` (both come out of the
    fused assign kernel in one pass): forward contracts with the
    pre-transposed operand so no relayout copy precedes the matmul, and the
    backward reroutes the s_t-cotangent onto ``s`` in [B, N, C] layout.
    Both DiffPool products share every matmul pass: forward contracts S^T
    against
    [x | A S] (the F=20 columns ride the C=1140 pass ~free), and — the real
    win — backward computes d s = [x | A S] @ [ct_x | ct_adj]^T as ONE
    k=F+C matmul. Run separately, the d s contribution from the pooled-x
    product is a k=F(=20) batched matmul that costs MXU pass-granularity,
    not FLOPs (profiled 552 us/step at the canonical shape, r3 profile), and
    autodiff then adds the two [B, N, C] contributions — another S-sized
    HBM round trip. Fused, both disappear into the k=C pass.
    """
    rhs = jnp.concatenate([x, a_s], axis=-1)
    out = jnp.einsum("bcn,bnf->bcf", s_t, rhs, preferred_element_type=rhs.dtype)
    f = x.shape[-1]
    return out[..., :f], out[..., f:]


def _cdp_fwd(s_t, s, x, a_s):
    rhs = jnp.concatenate([x, a_s], axis=-1)
    out = jnp.einsum("bcn,bnf->bcf", s_t, rhs, preferred_element_type=rhs.dtype)
    f = x.shape[-1]
    return (out[..., :f], out[..., f:]), (s, rhs, f)


def _cdp_bwd(res, cts):
    s, rhs, f = res
    ct = jnp.concatenate(cts, axis=-1)                 # [B, C, F+C]
    # d s (both products' contributions in one k=F+C matmul)
    ds = jnp.einsum("bnf,bcf->bnc", rhs, ct, preferred_element_type=s.dtype)
    d_rhs = jnp.einsum("bnc,bcf->bnf", s, ct, preferred_element_type=rhs.dtype)
    zero_st = jnp.zeros((s.shape[0], s.shape[2], s.shape[1]), s.dtype)
    return zero_st, ds, d_rhs[..., :f], d_rhs[..., f:]


_contract_dual_pair.defvjp(_cdp_fwd, _cdp_bwd)


def diff_pool_from_s(
    x: jax.Array,
    adj: Adjacency,
    s: jax.Array,    # [B, N, C]
    s_t: jax.Array,  # [B, C, N] (same values — kernel-emitted transpose)
) -> tuple[jax.Array, jax.Array]:
    """DiffPool contractions for a precomputed dual-layout S (the fused
    assign-head path): the S^T operands come pre-transposed so XLA inserts
    no relayout copies, forward or backward, and the two products fuse into
    one contraction pair (``_contract_dual_pair``)."""
    a_s = adj.matvec(s)
    return _contract_dual_pair(s_t, s, x, a_s)
