"""Diagnose test_model_fused_softmax_matches_unfused: which side drifted?

Two-phase (run both; phase 2 reruns this file with CGCNET_DIAG_PHASE=2):
  phase 1 (x64 OFF — exact test conditions): compute fused ('always') and
    unfused ('never') f32 grads, dump params + grads to /tmp/diag_fused.npz.
  phase 2 (x64 ON): recompute the unfused path entirely in f64 from the SAME
    f32 params as oracle; print per-leaf |on-off| vs |on-oracle|,|off-oracle|.

Verdict rule: if |on-off| << each path's own distance to the oracle on every
leaf, the disagreement is fp reassociation (both paths equally correct) and
the test bound must be an error-model bound, not a tighter-than-roundoff atol.
"""
import dataclasses
import os
import pickle
import sys

PHASE = int(os.environ.get("CGCNET_DIAG_PHASE", "1"))
DUMP = "/tmp/diag_fused.pkl"

import jax

if PHASE == 2:
    jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import cgcnet_tpu.ops.pallas.assign_head as _ah  # noqa: E402
import cgcnet_tpu.ops.pallas.bsr_kernel as _bsr  # noqa: E402

_ah.set_interpret(True)
_bsr.set_interpret(True)

from cgcnet_tpu.config import ModelConfig  # noqa: E402
from cgcnet_tpu.nn.model import CGCNet, cross_entropy_loss  # noqa: E402
from tests.test_model import build_graph  # noqa: E402

g = build_graph(np.random.default_rng(3), batch=2, cap=256, n_lo=100)
# drop_out=0: the dropout mask realization differs between x64 on/off (the
# uniform draw widens), which would invalidate the f64 oracle — the
# reassociation question is independent of dropout.
base = ModelConfig(max_num_nodes=640, assign_ratio=0.2, use_pallas=False,
                   drop_out=0.0)


def grads(model, variables, graph):
    def loss(params):
        out, _ = model.apply(
            {**variables, "params": params}, graph, train=True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(1)},
        )
        return cross_entropy_loss(out, graph.y)
    return jax.grad(loss)(variables["params"])


if PHASE == 1:
    m_on = CGCNet(dataclasses.replace(base, fused_assign_softmax="always"))
    m_off = CGCNet(dataclasses.replace(base, fused_assign_softmax="never"))
    v = m_off.init(jax.random.key(0), g, train=False)
    g_on = jax.tree.map(np.asarray, grads(m_on, v, g))
    g_off = jax.tree.map(np.asarray, grads(m_off, v, g))
    with open(DUMP, "wb") as f:
        pickle.dump({"v": jax.tree.map(np.asarray, v),
                     "g_on": g_on, "g_off": g_off}, f)
    print("phase 1 dumped", DUMP)
    os.environ["CGCNET_DIAG_PHASE"] = "2"
    os.execv(sys.executable, [sys.executable] + sys.argv)

with open(DUMP, "rb") as f:
    d = pickle.load(f)
v64 = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64)
                   if np.issubdtype(a.dtype, np.floating) else jnp.asarray(a),
                   d["v"])
g64 = dataclasses.replace(g, x=jnp.asarray(np.asarray(g.x), jnp.float64))
m_f64 = CGCNet(dataclasses.replace(
    base, fused_assign_softmax="never", compute_dtype="float64"))
g_orc = grads(m_f64, v64, g64)

flat_on = jax.tree_util.tree_leaves_with_path(d["g_on"])
flat_off = jax.tree.leaves(d["g_off"])
flat_orc = jax.tree.leaves(jax.tree.map(np.asarray, g_orc))

print(f"{'leaf':60s} {'|on-off|max':>12s} {'|on-orc|max':>12s} "
      f"{'|off-orc|max':>12s}")
worst, ratios = None, []
for (path, a), b, o in zip(flat_on, flat_off, flat_orc):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    d_ab = np.abs(a - b).max()
    d_ao = np.abs(a - o).max()
    d_bo = np.abs(b - o).max()
    name = jax.tree_util.keystr(path)
    print(f"{name:60s} {d_ab:12.3e} {d_ao:12.3e} {d_bo:12.3e}")
    if d_ab > 0:
        ratios.append((d_ab / max(d_ao, d_bo, 1e-300), name, d_ab, d_ao, d_bo))
    if worst is None or d_ab > worst[1]:
        worst = (name, d_ab, d_ao, d_bo)

ratios.sort(reverse=True)
print("\nworst |on-off| leaf:", worst)
print("max (on-off)/(path-to-oracle) ratio:", ratios[0][:2] if ratios else None)
