from cgcnet_tpu.ops.ell import (
    ell_gather_sum,
    ell_spmm,
    renorm_ell,
    renorm_dense,
)
from cgcnet_tpu.ops.knn import radius_knn_np, radius_knn_dense_oracle, radius_knn_jnp
from cgcnet_tpu.ops.fps import farthest_point_sample_np, fuse_sample_np, farthest_point_sample_jnp
from cgcnet_tpu.ops.segment import segment_sum, segment_softmax

__all__ = [
    "ell_gather_sum",
    "ell_spmm",
    "renorm_ell",
    "renorm_dense",
    "radius_knn_np",
    "radius_knn_dense_oracle",
    "radius_knn_jnp",
    "farthest_point_sample_np",
    "farthest_point_sample_jnp",
    "fuse_sample_np",
    "segment_sum",
    "segment_softmax",
]
