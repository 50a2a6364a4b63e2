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
    def _mismatch(detail):
        # the most common structure mismatch: optimizer state saved with the
        # other train.flatten_opt setting (optax.flatten collapses all
        # per-leaf moments into one flat vector)
        return ValueError(
            f"checkpoint '{path}' does not match the target state structure "
            "— if it was saved with a different train.flatten_opt setting, "
            "resume with that setting (or use load_partial, which restores "
            "params/batch_stats and skips mismatched optimizer state): "
            f"{detail}"
        )

    try:
        state = serialization.from_bytes(target, path.read_bytes())
    except (ValueError, KeyError) as e:
        raise _mismatch(e) from e
    # flax from_state_dict replaces leaves WITHOUT validating them — a
    # checkpoint with differently-shaped (or dict-valued) leaves would
    # restore silently and explode later inside the optimizer. Validate
    # every leaf shape against the target up front.
    import numpy as np

    if jax.tree.structure(state) != jax.tree.structure(target):
        raise _mismatch("restored pytree structure differs from the target")
    for t_leaf, s_leaf in zip(jax.tree.leaves(target), jax.tree.leaves(state)):
        if np.shape(t_leaf) != np.shape(s_leaf):
            raise _mismatch(
                f"leaf shape {np.shape(s_leaf)} != target {np.shape(t_leaf)}"
            )
        if np.asarray(t_leaf).dtype != np.asarray(s_leaf).dtype:
            raise _mismatch(
                f"leaf dtype {np.asarray(s_leaf).dtype} != target "
                f"{np.asarray(t_leaf).dtype}"
            )
    meta_path = path.with_suffix(".json")
    meta = json.loads(meta_path.read_text()) if meta_path.is_file() else {}
    return state, meta


def load_partial(path: str | Path, target: Any) -> tuple[Any, list[str], list[str]]:
    """Copy matching leaves from a checkpoint into ``target``; skip missing or
    shape-mismatched entries (reference ``copy_state_dict``,
    common/utils.py:96-116). Returns (state, copied, skipped)."""
    import numpy as np
    from flax.traverse_util import empty_node, flatten_dict, unflatten_dict

    path = Path(path)
    raw = serialization.msgpack_restore(path.read_bytes())
    flat_src = flatten_dict(raw, sep="/")
    state_dict = serialization.to_state_dict(target)
    # keep_empty_nodes: optax chains contain EmptyState entries whose state
    # dict is {} — dropping them breaks the list-length round trip through
    # from_state_dict (opt_state is a list pytree)
    flat_dst = flatten_dict(state_dict, sep="/", keep_empty_nodes=True)
    copied, skipped = [], []
    for k, v in flat_dst.items():
        if v is empty_node:
            continue
        if k in flat_src and np.shape(flat_src[k]) == np.shape(v):
            flat_dst[k] = flat_src[k]
            copied.append(k)
        else:
            skipped.append(k)
    restored = serialization.from_state_dict(
        target, unflatten_dict(flat_dst, sep="/")
    )
    return restored, copied, skipped


def load_for_inference(path: str | Path, target: Any) -> Any:
    """Restore params + batch_stats for inference, tolerating ONLY
    optimizer-state mismatches (e.g. a checkpoint saved under the other
    train.flatten_opt layout). Every params/batch_stats leaf must copy —
    a config-mismatched checkpoint raises instead of silently serving
    mostly-random weights."""
    state, copied, skipped = load_partial(path, target)
    bad = [
        k for k in skipped
        if k.startswith(("params/", "batch_stats/"))
    ]
    if bad or not any(k.startswith("params/") for k in copied):
        raise ValueError(
            f"checkpoint '{path}' does not match the model configuration: "
            f"{len(bad)} params/batch_stats leaves missing or shape-"
            f"mismatched (first few: {bad[:5]}) — check the model/data "
            "overrides match the ones the checkpoint was trained with"
        )
    return state


def resolve_resume_path(ckpt_dir: str | Path, resume: str) -> Path:
    ckpt_dir = Path(ckpt_dir)
    if resume == "best":
        return ckpt_dir / "model_best.msgpack"
    if resume == "weight":
        return ckpt_dir / "weight.msgpack"
    return Path(resume)
