"""CGCNet — the hierarchical soft-pooling graph classifier.

TPU-native re-design of the reference ``SoftPoolingGcnEncoder``
(model/network.py:127-291): 3 embedding GNN blocks + 2 pooling GNN blocks +
2 DiffPool stages + per-stage max readout + MLP head.

Layout strategy: stage 1 consumes the sparse :class:`CellGraph` (padded ELL,
Pallas/XLA gather aggregation — ops/ell.py); DiffPool emits dense cluster
graphs, so stages 2-3 run dense batched matmuls on the MXU (cluster counts
1140 -> 114 under the canonical config, model/network.py:142,155). The
adaptive renormalization ``_re_norm_adj`` (model/network.py:183-191) is
applied as ELL row-weights at stage 1 and densely at stages 2-3.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as fnn

from cgcnet_tpu.config import ModelConfig
from cgcnet_tpu.core.graph import CellGraph
from cgcnet_tpu.nn.adjacency import DenseAdj, EllAdj, EllAdjFactored
from cgcnet_tpu.nn.blocks import (
    GNNBlock,
    diff_pool,
    diff_pool_from_s,
    paired_blocks,
)
from cgcnet_tpu.nn.jk import DenseJK
from cgcnet_tpu.nn.layers import TorchLinear, activation
from cgcnet_tpu.ops.ell import EPS, renorm_dense, renorm_ell


def make_stage1_adj(graph: CellGraph, cfg: ModelConfig, dtype) -> EllAdj | EllAdjFactored:
    """Build the stage-1 adjacency.

    With the loader-provided transpose tables (graph.nbr_t), the factored
    form is used: backward is a gather over the transpose instead of an XLA
    scatter-add (ops.ell.ell_spmm_factored). Without them (hand-built
    graphs), the generic weighted ELL with autodiff is used. The Pallas BSR
    kernel engages per cfg.use_pallas ('auto' = TPU + metadata present).

    BSR contract: the self-loop weight is folded into the precomputed block
    values, so with norm_adj the ELL must actually carry a self slot per real
    row (the loader's loop=True nearest-mode kNN guarantees slot 0). Under
    the knn_scan_order compat mode a crowded row can drop its self edge —
    use the XLA path for that parity study.
    """
    use_pallas = cfg.use_pallas
    if use_pallas == "auto":
        use_pallas = jax.default_backend() == "tpu"
    elif use_pallas == "always":
        use_pallas = True
    elif use_pallas == "never":
        use_pallas = False
    impl = "pallas" if (use_pallas and graph.blk_cols is not None) else "xla"
    if graph.nbr_t is None:
        if cfg.norm_adj:
            w = renorm_ell(graph.nbr, graph.nbr_mask, graph.n_nodes, cfg.self_weight)
        else:
            w = graph.weights()
        return EllAdj(nbr=graph.nbr, w=w.astype(dtype), impl="xla")

    row = jnp.arange(graph.capacity, dtype=graph.nbr.dtype)[None, :, None]
    off = graph.nbr_mask * (graph.nbr != row)
    off_t = graph.nbr_t_mask * (graph.nbr_t != row)
    deg = jnp.sum(off, axis=-1)
    valid = graph.mask(dtype)
    if cfg.norm_adj:
        scale = (1.0 - cfg.self_weight) / (deg + EPS) * valid
        self_w = cfg.self_weight * valid
        # renormalized rows sum to <= 1, so SAGE's clamp(min=1) pins the
        # mean-denominator at exactly 1
        rowsum = jnp.ones_like(valid)
    else:
        # binary adjacency: only contribute a self loop if the graph actually
        # carries one (loader builds with loop=True, but hand-built graphs may
        # not — keep the factored and non-factored paths consistent)
        has_self = jnp.max(graph.nbr_mask * (graph.nbr == row), axis=-1)
        scale = valid
        self_w = has_self * valid
        rowsum = (deg + has_self) * valid
    vals = vals_t = None
    if impl == "pallas":
        # Amortized BSR: materialize A's (and A^T's) 128x128 block values
        # ONCE — the adjacency is constant across the step's ~14 matvec
        # directions, so every matvec becomes matmul-only
        # (ops/pallas/bsr_kernel.bsr_build_blocks).
        from cgcnet_tpu.ops.pallas.bsr_kernel import bsr_build_blocks

        is_self = graph.nbr_mask * (graph.nbr == row)
        # A[i,j] = scale[i]*B_off[i,j] + self_w[i]*delta_ij as ELL weights
        # (row scale — no gather needed)
        w_fwd = scale[..., None] * off + self_w[..., None] * is_self
        vals = bsr_build_blocks(
            graph.nbr, w_fwd, graph.blk_cols, graph.blk_mask, dtype
        )
        # Backward: A^T g = B_off^T (scale*g) + self_w*g — the transpose
        # blocks stay BINARY and scale multiplies the cotangent instead.
        # (Folding scale into the transpose blocks would need scale at each
        # in-neighbour: a [B,N,KT] gather that profiled at ~4 ms/step.)
        vals_t = bsr_build_blocks(
            graph.nbr_t, off_t, graph.blk_cols_t, graph.blk_mask_t, dtype
        )
    return EllAdjFactored(
        nbr=graph.nbr,
        off_mask=off.astype(dtype),
        nbr_t=graph.nbr_t,
        off_mask_t=off_t.astype(dtype),
        scale=scale.astype(dtype),
        self_w=self_w.astype(dtype),
        rowsum_=rowsum.astype(dtype),
        blk_cols=graph.blk_cols,
        blk_mask=graph.blk_mask,
        blk_cols_t=graph.blk_cols_t,
        blk_mask_t=graph.blk_mask_t,
        vals=vals,
        vals_t=vals_t,
        impl=impl,
    )


def masked_max_readout(
    x: jax.Array, mask: Optional[jax.Array], masked: bool
) -> jax.Array:
    """Max over the node axis.

    ``masked=False`` reproduces the reference's plain max over zero-padded
    rows (model/network.py:264) — which silently clips negative maxima to 0;
    ``masked=True`` uses -inf masking (TPU-build default).
    """
    if masked and mask is not None:
        neg = jnp.finfo(x.dtype).min
        x = jnp.where(mask[..., None] > 0, x, neg)
    return jnp.max(x, axis=1)


class CGCNet(fnn.Module):
    """Hierarchical cell-graph classifier. Call with a :class:`CellGraph`."""

    cfg: ModelConfig

    def _block(self, name: str, embedding: int, lin: bool) -> GNNBlock:
        c = self.cfg
        # static conv-1 fan-in per stage — lets the paired path merge the
        # two streams' lins into one matmul (blocks.py::_dual_lin)
        stage_in = c.stage_input_dims[int(name[-1]) - 1]
        return GNNBlock(
            hidden_dim=c.hidden_dim if "embed" in name else c.assign_hidden_dim,
            embedding_dim=embedding,
            use_bias=c.bias,
            use_bn=c.bn,
            use_lin=lin,
            gcn_name=c.gcn_name,
            act=c.activation,
            masked_bn=c.masked_bn,
            gat_heads=c.gat_heads,
            fold_tail=c.fold_assign_tail,
            input_dim=stage_in,
            name=name,
        )

    @fnn.compact
    def __call__(
        self,
        graph: CellGraph,
        *,
        train: bool = False,
        collect_assign: bool = False,
    ) -> jax.Array | tuple[jax.Array, list[jax.Array]]:
        c = self.cfg
        dtype = jnp.dtype(c.compute_dtype)
        x = graph.x.astype(dtype)
        mask = graph.mask(dtype)
        assign_dim1, assign_dim2 = c.assign_dims
        assigns: list[jax.Array] = []

        # ---- stage 1: sparse ELL ----
        adj = make_stage1_adj(graph, c, dtype)

        # fused assign softmax: one Pallas pass computes S in both consumer
        # layouts (ops/pallas/assign_head.py) — engaged alongside the BSR
        # kernel ('auto') when shapes tile by 128
        def tri_state(v, auto) -> bool:
            # 'auto'/'always'/'never' or a real bool — NEVER bool() a string
            # (bool("never") is True, which would invert the disable value)
            if isinstance(v, str):
                return {"auto": auto, "always": True, "never": False}[v]
            return bool(v)

        fsm = tri_state(c.fused_assign_softmax, adj.impl == "pallas")
        # the fused tail folds BN into the lin kernel — without BN there is
        # no folded tail to fuse (GNNBlock.folds_tail requires use_bn)
        fsm = fsm and c.fold_assign_tail and c.bn and graph.capacity % 128 == 0
        # deeper fold: normalize/relu/BN-stats recomputed in VMEM from the
        # raw conv3 lin output (SAGE+relu only — relies on relu's positive
        # homogeneity, nn/blocks.py::folds_norm)
        fan = tri_state(c.fused_assign_norm, fsm)
        fan = fan and fsm and c.gcn_name == "SAGE" and c.activation == "relu"
        pool_mode: bool | str = "pre" if fan else fsm

        outs = []
        # embed/pool pairs share one aggregation stream per layer (halves the
        # sparse-kernel launches; per-block math is unchanged)
        embed, assign_out = paired_blocks(
            self._block("embed1", c.embedding_dim, lin=False),
            self._block("pool1", assign_dim1, lin=True),
            x, adj, mask, train=train, pool_softmax=pool_mode,
        )
        if c.jk:
            embed = DenseJK(c.hidden_dim, 3, name="jk1")(embed)
        outs.append(masked_max_readout(embed, mask, c.masked_readout))

        if fsm:
            s, s_t = assign_out
            x, pooled_adj = diff_pool_from_s(embed, adj, s, s_t)
        else:
            x, pooled_adj, s = diff_pool(embed, adj, assign_out, mask)
        if collect_assign:
            assigns.append(s)

        # ---- stage 2: dense clusters ----
        if c.norm_adj:
            pooled_adj = renorm_dense(pooled_adj, c.self_weight)
        adj2 = DenseAdj(pooled_adj.astype(dtype))
        embed, assign_logits = paired_blocks(
            self._block("embed2", c.embedding_dim, lin=False),
            self._block("pool2", assign_dim2, lin=True),
            x, adj2, None, train=train,
        )
        if c.jk:
            embed = DenseJK(c.hidden_dim, 3, name="jk2")(embed)
        outs.append(jnp.max(embed, axis=1))

        x, pooled_adj, s = diff_pool(embed, adj2, assign_logits, None)
        if collect_assign:
            assigns.append(s)

        # ---- stage 3 ----
        if c.norm_adj:
            pooled_adj = renorm_dense(pooled_adj, c.self_weight)
        adj3 = DenseAdj(pooled_adj.astype(dtype))
        embed = self._block("embed3", c.embedding_dim, lin=False)(
            x, adj3, None, train=train
        )
        if c.jk:
            embed = DenseJK(c.hidden_dim, 3, name="jk3")(embed)
        outs.append(jnp.max(embed, axis=1))

        # ---- head ----
        # the head is [B, 60] -> tiny; run it in f32 regardless of
        # compute_dtype (bf16 buys nothing here and costs accuracy)
        out = jnp.concatenate(outs, axis=-1).astype(jnp.float32)
        act = activation(c.activation)
        h = out
        for i, hd in enumerate(c.pred_hidden_dims):
            h = act(TorchLinear(hd, name=f"pred_{i}")(h))
            if c.drop_out > 0:
                h = fnn.Dropout(rate=c.drop_out, deterministic=not train)(h)
        logits = TorchLinear(c.num_classes, name="pred_out")(h)
        logits = logits.astype(jnp.float32)
        if collect_assign:
            return logits, assigns
        return logits


def cross_entropy_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean softmax cross entropy (reference F.cross_entropy,
    model/network.py:289)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(nll)
