"""Device mesh setup and sharding helpers.

The reference's only parallelism is single-process ``nn.DataParallel``
scatter/gather (train.py:276-287; SURVEY.md §2.4). The TPU equivalents:

- data parallelism: batch dim sharded over mesh axis ``data`` via jit
  shardings — XLA inserts the gradient all-reduce over ICI;
- graph parallelism (the sequence-parallel analog): whole-slide graphs
  node-partitioned over mesh axis ``graph`` with halo exchange
  (parallel/mega_graph.py);
- multi-host: ``jax.distributed.initialize`` then the same global mesh.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: int = 0, n_graph: int = 1, devices=None
) -> Mesh:
    """(data, graph) mesh; n_data=0 uses all remaining devices on 'data'."""
    devices = devices if devices is not None else jax.devices()
    if n_data <= 0:
        n_data = len(devices) // n_graph
    # Auto axis types: let jit propagate shardings (Explicit — the jax 0.9
    # default — rejects mixed-sharding elementwise ops like dropout masks).
    return jax.make_mesh(
        (n_data, n_graph), ("data", "graph"),
        devices=devices[: n_data * n_graph],
        axis_types=(jax.sharding.AxisType.Auto, jax.sharding.AxisType.Auto),
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis split over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def graph_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (node) axis split over 'graph'."""
    return NamedSharding(mesh, P("graph"))


def shard_batch_graph(graph, mesh: Mesh):
    """Device-put a CellGraph with its batch dim over the 'data' axis."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, s), graph)


def multihost_init(coordinator: str | None = None) -> None:
    """Bootstrap multi-process execution (one process per host)."""
    kwargs = {}
    if coordinator:
        kwargs["coordinator_address"] = coordinator
    jax.distributed.initialize(**kwargs)
