"""Sharded (multi-host) checkpointing via orbax.

`train/checkpoint.py` covers the replicated-parameter case with a single
writer (the reference's torch.save analog, common/utils.py:82-94). This
module handles pytrees that contain SHARDED jax.Arrays — mega-graph
residents, optimizer state laid out over a mesh, or any future
model-parallel parameter tree:

- every process writes exactly its own shards (orbax OCDBT fan-out), no
  host gathers the full array;
- restore takes an *abstract* target (shape/dtype/sharding), so state can
  be loaded onto a DIFFERENT mesh or sharding than it was saved with —
  resharding happens on read (checkpoint/resume across topology changes,
  SURVEY.md §5 failure/recovery).

The reference has no distributed checkpoint at all (crash = rerun,
train.py:263-274); this is the TPU-native upgrade of that surface.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_sharded(path: str | Path, state: Any) -> Path:
    """Write ``state`` (a pytree of jax.Arrays, sharded or replicated) to
    ``path`` collectively: each process persists only its addressable
    shards. Blocks until the write is durable on every host."""
    path = Path(path).absolute()
    ckptr = _checkpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    ckptr.close()
    return path


def load_sharded(path: str | Path, target: Any) -> Any:
    """Restore a pytree saved by :func:`save_sharded`.

    ``target`` fixes the restored structure/placement: a pytree of
    ``jax.ShapeDtypeStruct(shape, dtype, sharding=...)`` (or concrete
    arrays, whose specs are used). The stored state is resharded to the
    target's shardings on read — the saving and loading meshes need not
    match.
    """
    path = Path(path).absolute()

    def as_abstract(leaf):
        if isinstance(leaf, jax.ShapeDtypeStruct):
            return leaf
        arr = leaf
        return jax.ShapeDtypeStruct(arr.shape, arr.dtype, sharding=arr.sharding)

    abstract = jax.tree_util.tree_map(as_abstract, target)
    ckptr = _checkpointer()
    out = ckptr.restore(path, abstract)
    ckptr.close()
    return out
