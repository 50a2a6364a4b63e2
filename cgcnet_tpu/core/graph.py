"""Static-shape graph containers.

The reference densifies every graph to a [B, N, N] adjacency because 2019-era
dense DiffPool demanded it (reference model/utils.py:3-37, dataflow/data.py:234).
At N=5703 with <=8 neighbours/node that wastes >700x FLOPs and HBM. The TPU
build instead keeps cell graphs in a padded ELL layout: each node stores up to
K neighbour slots. ELL with K = max_neighbours is *exact* (the radius-kNN
builder caps degree at K by construction, reference dataflow/data.py:246), so
there is zero fill waste, shapes are static for XLA, and neighbourhood
aggregation becomes a gather + small reduction that Pallas can stream through
VMEM.

Pooled stages use :class:`DenseGraph` ([B, C, C] adjacency, C in {1140, 114})
— dense batched matmuls that map straight onto the MXU.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct


def node_mask(n_nodes: jax.Array, capacity: int, dtype=jnp.float32) -> jax.Array:
    """[B] node counts -> [B, capacity] validity mask.

    Equivalent of the reference's ``construct_mask`` (model/network.py:172-180)
    but vectorized and traceable (no per-graph python loop).
    """
    idx = jnp.arange(capacity, dtype=jnp.int32)[None, :]
    return (idx < n_nodes[:, None]).astype(dtype)


@struct.dataclass
class CellGraph:
    """A batch of padded cell graphs in ELL (fixed-width neighbour-list) form.

    Attributes:
      x:        f32[B, N, F]   node features, zero-padded past ``n_nodes``.
      nbr:      i32[B, N, K]   neighbour indices into the node axis. Invalid
                               slots point at the node's own row (self-index)
                               so gathers are always in-bounds.
      nbr_mask: f32[B, N, K]   1.0 for real neighbour slots, 0.0 for padding.
      nbr_w:    optional f32[B, N, K] edge weights. ``None`` means binary
                               adjacency (all real slots weigh 1.0).
      n_nodes:  i32[B]         real node count per graph.
      y:        optional i32[B] graph labels.
      patch_idx: optional i32[B] dataset indices (for image-level metrics).

    The implied adjacency is ``adj[b, i, nbr[b, i, k]] += w`` for real slots —
    i.e. row i lists the neighbours that node i aggregates from, matching the
    reference's ``adj @ x`` row semantics (edge direction of
    torch_geometric.nn.radius_graph at dataflow/data.py:246).
    """

    x: jax.Array
    nbr: jax.Array
    nbr_mask: jax.Array
    n_nodes: jax.Array
    nbr_w: Optional[jax.Array] = None
    y: Optional[jax.Array] = None
    patch_idx: Optional[jax.Array] = None
    # Transposed adjacency (in-edge lists). Optional: only the training path
    # needs it — aggregation's VJP is aggregation over the transpose
    # (ops.ell.ell_spmm_factored).
    nbr_t: Optional[jax.Array] = None
    nbr_t_mask: Optional[jax.Array] = None
    # Block-sparse metadata for the Pallas MXU aggregation kernel
    # (ops/pallas/bsr_kernel.py): nonzero 128x128 block columns per row tile,
    # for the forward and transposed graphs. Requires spatially-sorted nodes.
    blk_cols: Optional[jax.Array] = None      # i32[B, N/128, M]
    blk_mask: Optional[jax.Array] = None      # f32[B, N/128, M]
    blk_cols_t: Optional[jax.Array] = None
    blk_mask_t: Optional[jax.Array] = None

    @property
    def batch_size(self) -> int:
        return self.x.shape[0]

    @property
    def capacity(self) -> int:
        return self.x.shape[1]

    @property
    def width(self) -> int:
        return self.nbr.shape[2]

    @property
    def num_features(self) -> int:
        return self.x.shape[2]

    def mask(self, dtype=jnp.float32) -> jax.Array:
        """[B, N] node validity mask."""
        return node_mask(self.n_nodes, self.capacity, dtype)

    def weights(self) -> jax.Array:
        """[B, N, K] effective edge weights (mask-applied)."""
        if self.nbr_w is None:
            return self.nbr_mask
        return self.nbr_w * self.nbr_mask

    def num_edges(self) -> jax.Array:
        """Total real edge count in the batch (scalar)."""
        return jnp.sum(self.nbr_mask).astype(jnp.int32)

    def with_weights(self, w: jax.Array) -> "CellGraph":
        return self.replace(nbr_w=w)


@struct.dataclass
class DenseGraph:
    """A batch of dense graphs — the post-DiffPool representation.

    Attributes:
      x:   f32[B, C, F] cluster features.
      adj: f32[B, C, C] dense (weighted) adjacency.
    """

    x: jax.Array
    adj: jax.Array

    @property
    def batch_size(self) -> int:
        return self.x.shape[0]

    @property
    def capacity(self) -> int:
        return self.x.shape[1]
