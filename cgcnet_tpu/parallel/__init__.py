from cgcnet_tpu.parallel.mesh import make_mesh, batch_sharding, replicated
from cgcnet_tpu.parallel.mega_graph import (
    ShardedGraphPartition,
    partition_graph,
    sharded_gather_sum,
    sharded_gather_sum_allgather,
    sharded_gather_sum_overlap,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "ShardedGraphPartition",
    "partition_graph",
    "sharded_gather_sum",
    "sharded_gather_sum_allgather",
    "sharded_gather_sum_overlap",
]
