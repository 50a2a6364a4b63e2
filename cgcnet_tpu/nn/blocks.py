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
    TorchLinear,
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

    def setup(self):
        # setup(): names come from the attribute names (param-tree layout
        # matches the reference module names for checkpoint transplant)
        def conv(features):
            if self.gcn_name == "SAGE":
                return SAGEConv(features, use_bias=self.use_bias)
            if self.gcn_name == "GAT":
                return GATConv(
                    features, heads=self.gat_heads, use_bias=self.use_bias
                )
            return GINConv(features, act=self.act)

        self.gcn1 = conv(self.hidden_dim)
        self.gcn2 = conv(self.hidden_dim)
        self.gcn3 = conv(self.embedding_dim)
        if self.use_bn:
            self.bn1 = TorchBatchNorm(self.hidden_dim)
            self.bn2 = TorchBatchNorm(self.hidden_dim)
            self.bn3 = TorchBatchNorm(self.embedding_dim)
        if self.use_lin:
            self.lin = TorchLinear(self.embedding_dim)

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
    ) -> jax.Array:
        """conv_i -> activation -> bn_i. ``agg`` optionally supplies the
        precomputed neighbourhood aggregation A @ x."""
        conv = (self.gcn1, self.gcn2, self.gcn3)[i - 1]
        h = conv(x, adj, mask, agg=agg)
        h = activation(self.act)(h)
        if self.use_bn:
            bn = (self.bn1, self.bn2, self.bn3)[i - 1]
            bn_mask = mask if self.masked_bn else None
            h = bn(h, use_running_average=not train, mask=bn_mask)
        return h

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
        x1 = self.conv_step(1, x, adj, mask, train=train)
        x2 = self.conv_step(2, x1, adj, mask, train=train)
        x3 = self.conv_step(3, x2, adj, mask, train=train)
        return self.finish([x1, x2, x3], mask)


def paired_blocks(
    embed_blk: GNNBlock,
    pool_blk: GNNBlock,
    x: jax.Array,
    adj: Adjacency,
    mask: Optional[jax.Array],
    *,
    train: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Run an (embed, pool) block pair over one shared aggregation stream.

    Layer 1 reads the same input — one A@x serves both; layers 2-3
    concatenate the two feature streams into a single matvec and split.
    Halves the number of sparse-aggregation kernel launches vs running the
    blocks independently, with bit-identical per-block math.

    Attention convolutions (GAT) cannot share an aggregation — the blocks
    run independently there.
    """
    if "GAT" in (embed_blk.gcn_name, pool_blk.gcn_name):
        return (
            embed_blk(x, adj, mask, train=train),
            pool_blk(x, adj, mask, train=train),
        )
    agg1 = adj.matvec(x)
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
            pool_blk.conv_step(i, hp, adj, mask, train=train, agg=agg_p)
        )
    return embed_blk.finish(e_outs, mask), pool_blk.finish(p_outs, mask)


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
