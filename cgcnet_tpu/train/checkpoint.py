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
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    path = ckpt_dir / f"{name}.msgpack"
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


def resolve_resume_path(ckpt_dir: str | Path, resume: str) -> Path:
    ckpt_dir = Path(ckpt_dir)
    if resume == "best":
        return ckpt_dir / "model_best.msgpack"
    if resume == "weight":
        return ckpt_dir / "weight.msgpack"
    return Path(resume)
