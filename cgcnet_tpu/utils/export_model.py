"""Serialized model export for serving (jax.export / StableHLO).

The reference has no deployment story beyond pickled torch checkpoints
(common/utils.py:82-94) — loading one requires the full source tree and a
matching torch/PyG install. For production serving the TPU build exports the
eval-mode forward pass as a **self-contained StableHLO artifact**: weights
baked in as constants, static input shapes, no Python/flax dependency at
load time beyond jax itself. The artifact is portable across processes,
hosts, and jax minor versions (jax.export's compatibility guarantees), and
can be exported *for* TPU from a CPU-only host (cross-platform lowering).

File format (single file):

    8-byte little-endian header length | JSON header | jax.export payload

The JSON header records the CellGraph field order the exported function
expects, plus shapes/dtypes and the producing config — enough for a serving
layer to validate inputs without deserializing the payload.

Default export uses the portable XLA-gather aggregation path
(model.use_pallas='never' semantics at trace time): Mosaic TPU kernels
lower to backend-specific custom calls that jax.export flags as
non-portable. Pass ``allow_custom_calls=True`` to bake the Pallas BSR /
assign-head kernels into a TPU-only artifact — possible only when exporting
ON a TPU-backed host (Mosaic does not cross-lower from CPU).
"""

from __future__ import annotations

import json
import struct as _struct
from pathlib import Path
from typing import Callable, Sequence

import jax
import numpy as np

from cgcnet_tpu.core.graph import CellGraph

# CellGraph fields an exported forward may consume, in canonical call order.
# Label/metrics fields (y, patch_idx) are never part of a serving signature.
_EXPORTABLE_FIELDS = (
    "x", "nbr", "nbr_mask", "n_nodes", "nbr_w", "nbr_t", "nbr_t_mask",
    "blk_cols", "blk_mask", "blk_cols_t", "blk_mask_t",
)

_MAGIC = "cgcnet_tpu.export.v1"


def export_forward(
    model,
    variables,
    graph: CellGraph,
    *,
    platforms: Sequence[str] | None = None,
    allow_custom_calls: bool = False,
    symbolic_batch: bool = False,
):
    """Export ``model.apply(variables, graph, train=False)`` -> logits.

    Returns ``(exported, header)`` where ``exported`` is a
    :class:`jax.export.Exported` taking the graph's non-None exportable
    fields as positional arrays, and ``header`` is the JSON-able metadata
    dict. ``platforms`` e.g. ``('tpu',)`` cross-lowers for TPU serving from
    any host; None exports for the current default backend.

    ``symbolic_batch`` exports with a symbolic leading (batch) dimension so
    one artifact serves any batch size; node capacity stays static (the
    TPU-first shape contract). Off by default: fully static shapes let the
    serving compiler specialize.
    """
    from jax import export as jexport

    fields = [
        f for f in _EXPORTABLE_FIELDS if getattr(graph, f) is not None
    ]
    args = [getattr(graph, f) for f in fields]

    def fwd(*arrays):
        g = CellGraph(**dict(zip(fields, arrays)))
        return model.apply(variables, g, train=False)

    if symbolic_batch:
        (b,) = jexport.symbolic_shape("b")
        specs = [
            jax.ShapeDtypeStruct((b,) + tuple(a.shape[1:]), a.dtype)
            for a in args
        ]
    else:
        specs = [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in args]
    checks = (
        [jexport.DisabledSafetyCheck.custom_call("tpu_custom_call")]
        if allow_custom_calls
        else []
    )
    exported = jexport.export(
        jax.jit(fwd),
        platforms=tuple(platforms) if platforms else None,
        disabled_checks=checks,
    )(*specs)
    header = {
        "magic": _MAGIC,
        "fields": fields,
        "inputs": {
            f: {
                "shape": (["b"] if symbolic_batch else [int(a.shape[0])])
                + [int(d) for d in a.shape[1:]],
                "dtype": str(np.dtype(a.dtype)),
            }
            for f, a in zip(fields, args)
        },
        "symbolic_batch": symbolic_batch,
        "platforms": list(exported.platforms),
        "jax_version": jax.__version__,
    }
    return exported, header


def save_exported(exported, header: dict, path: str | Path) -> Path:
    """Write header + serialized payload as one file."""
    from jax import export as jexport  # noqa: F401  (payload format owner)

    payload = exported.serialize()
    head = json.dumps(header).encode("utf-8")
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with path.open("wb") as f:
        f.write(_struct.pack("<Q", len(head)))
        f.write(head)
        f.write(bytes(payload))
    return path


def load_exported(path: str | Path) -> tuple[Callable[[CellGraph], jax.Array], dict]:
    """Load an artifact -> ``(forward(graph) -> logits, header)``.

    The returned callable pulls the recorded fields off a CellGraph (or any
    object with those attributes) and invokes the deserialized computation.
    """
    from jax import export as jexport

    raw = Path(path).read_bytes()
    (hlen,) = _struct.unpack("<Q", raw[:8])
    header = json.loads(raw[8 : 8 + hlen].decode("utf-8"))
    if header.get("magic") != _MAGIC:
        raise ValueError(f"{path}: not a {_MAGIC} artifact")
    exported = jexport.deserialize(bytearray(raw[8 + hlen :]))
    fields = header["fields"]

    def forward(graph: CellGraph) -> jax.Array:
        args = []
        for f in fields:
            a = getattr(graph, f, None)
            if a is None:
                raise ValueError(
                    f"exported model needs graph field {f!r} "
                    f"(artifact fields: {fields})"
                )
            args.append(a)
        return exported.call(*args)

    return forward, header
