"""Checkpoint save/load/resume.

Replaces the reference's torch.save dict {epoch, loss, state_dict, optimizer,
val_acc} with best-copy (common/utils.py:82-94, train.py:202-207) using flax
msgpack serialization — no pickle, host-portable. Multi-host runs save from
process 0 only (params are replicated; the sharded mega-graph path keeps its
own per-host loader state).
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any

import jax
from flax import serialization


def save_checkpoint(
    ckpt_dir: str | Path,
    state: Any,
    *,
    epoch: int,
    metrics: dict | None = None,
    is_best: bool = False,
    name: str = "weight",
) -> Path:
    ckpt_dir = Path(ckpt_dir)
    path = ckpt_dir / f"{name}.msgpack"
    # Multi-host: parameters/opt-state are replicated (DP), so exactly one
    # process writes; jax.device_get of addressable replicas works on every
    # host, and non-writers return the path they would have written.
    if jax.process_index() != 0:
        return path
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    host_state = jax.device_get(state)
    path.write_bytes(serialization.to_bytes(host_state))
    meta = {"epoch": epoch, "metrics": metrics or {}}
    (ckpt_dir / f"{name}.json").write_text(json.dumps(meta, indent=2))
    if is_best:
        shutil.copy(path, ckpt_dir / "model_best.msgpack")
        shutil.copy(ckpt_dir / f"{name}.json", ckpt_dir / "model_best.json")
    return path


def load_checkpoint(path: str | Path, target: Any) -> tuple[Any, dict]:
    """Restore ``target``-structured state from ``path`` (.msgpack).

    Accepts either a file path or a checkpoint dir + name stem. Returns
    (state, meta). Resume modes 'best'/'weight' mirror train.py:263-274.
    """
    path = Path(path)
    if path.is_dir():
        path = path / "model_best.msgpack"
    if not path.is_file():
        raise FileNotFoundError(f"=> No checkpoint found at '{path}'")
    state = serialization.from_bytes(target, path.read_bytes())
    meta_path = path.with_suffix(".json")
    meta = json.loads(meta_path.read_text()) if meta_path.is_file() else {}
    return state, meta


def load_partial(path: str | Path, target: Any) -> tuple[Any, list[str], list[str]]:
    """Copy matching leaves from a checkpoint into ``target``; skip missing or
    shape-mismatched entries (reference ``copy_state_dict``,
    common/utils.py:96-116). Returns (state, copied, skipped)."""
    import numpy as np
    from flax.traverse_util import flatten_dict, unflatten_dict

    path = Path(path)
    raw = serialization.msgpack_restore(path.read_bytes())
    flat_src = flatten_dict(raw, sep="/")
    state_dict = serialization.to_state_dict(target)
    flat_dst = flatten_dict(state_dict, sep="/")
    copied, skipped = [], []
    for k, v in flat_dst.items():
        if k in flat_src and np.shape(flat_src[k]) == np.shape(v):
            flat_dst[k] = flat_src[k]
            copied.append(k)
        else:
            skipped.append(k)
    restored = serialization.from_state_dict(
        target, unflatten_dict(flat_dst, sep="/")
    )
    return restored, copied, skipped


def resolve_resume_path(ckpt_dir: str | Path, resume: str) -> Path:
    ckpt_dir = Path(ckpt_dir)
    if resume == "best":
        return ckpt_dir / "model_best.msgpack"
    if resume == "weight":
        return ckpt_dir / "weight.msgpack"
    return Path(resume)
