"""GNN block and DiffPool (reference ``GNN_Module`` model/network.py:57-125
and ``_diff_pool`` model/network.py:194-208)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as fnn

from cgcnet_tpu.nn.adjacency import Adjacency
from cgcnet_tpu.nn.layers import (
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
    """

    hidden_dim: int
    embedding_dim: int
    use_bias: bool = True
    use_bn: bool = True
    lin: bool = True
    gcn_name: str = "SAGE"
    act: str = "relu"
    masked_bn: bool = True

    def _conv(self, features: int, name: str):
        if self.gcn_name == "SAGE":
            return SAGEConv(features, use_bias=self.use_bias, name=name)
        return GINConv(features, act=self.act, name=name)

    @fnn.compact
    def __call__(
        self,
        x: jax.Array,
        adj: Adjacency,
        mask: Optional[jax.Array] = None,
        *,
        train: bool = False,
    ) -> jax.Array:
        act = activation(self.act)
        bn_mask = mask if self.masked_bn else None

        def bn(i, h, feats):
            if not self.use_bn:
                return h
            return TorchBatchNorm(feats, name=f"bn{i}")(
                h, use_running_average=not train, mask=bn_mask
            )

        x1 = bn(1, act(self._conv(self.hidden_dim, "gcn1")(x, adj, mask)), self.hidden_dim)
        x2 = bn(2, act(self._conv(self.hidden_dim, "gcn2")(x1, adj, mask)), self.hidden_dim)
        x3 = bn(3, act(self._conv(self.embedding_dim, "gcn3")(x2, adj, mask)), self.embedding_dim)
        out = jnp.concatenate([x1, x2, x3], axis=-1)
        if mask is not None:
            out = out * mask[..., None].astype(out.dtype)
        if self.lin:
            out = TorchLinear(self.embedding_dim, name="lin")(out)
            if mask is not None:
                out = out * mask[..., None].astype(out.dtype)
        return out


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
    s = jax.nn.softmax(assign_logits, axis=-1)
    if mask is not None:
        s = s * mask[..., None].astype(s.dtype)
    pooled_x = jnp.einsum("bnc,bnf->bcf", s, x, preferred_element_type=x.dtype)
    pooled_adj = adj.quadform(s)
    return pooled_x, pooled_adj, s
