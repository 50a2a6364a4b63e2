"""Sharded checkpoint save/restore on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.sharding import NamedSharding, PartitionSpec as P

from cgcnet_tpu.parallel.mesh import make_mesh
from cgcnet_tpu.train.checkpoint_sharded import load_sharded, save_sharded


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8, 1)


def _sharded_state(mesh):
    sh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    x = jax.device_put(
        np.arange(8 * 16, dtype=np.float32).reshape(8, 16), sh
    )
    w = jax.device_put(np.linspace(0, 1, 24, dtype=np.float32), rep)
    step = jax.device_put(np.int32(7), rep)
    return {"x": x, "nested": {"w": w, "step": step}}


def test_save_restore_same_sharding(tmp_path, mesh):
    state = _sharded_state(mesh)
    path = save_sharded(tmp_path / "ckpt", state)
    out = load_sharded(path, state)
    for a, b in zip(jax.tree_util.tree_leaves(out),
                    jax.tree_util.tree_leaves(state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert a.sharding == b.sharding


def test_restore_resharded(tmp_path, mesh):
    """State saved data-sharded restores onto a DIFFERENT layout (replicated
    here) — topology-change resume."""
    state = _sharded_state(mesh)
    path = save_sharded(tmp_path / "ckpt", state)
    rep = NamedSharding(mesh, P())
    target = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=rep), state
    )
    out = load_sharded(path, target)
    np.testing.assert_array_equal(
        np.asarray(out["x"]), np.asarray(state["x"])
    )
    assert out["x"].sharding.is_fully_replicated


def test_restore_into_train_state_pytree(tmp_path, mesh):
    """Round-trip a realistic params/opt-state pytree (replicated leaves) —
    the flagship training state shape."""
    rep = NamedSharding(mesh, P())
    params = {
        "embed1": {"kernel": jnp.ones((18, 20)), "bias": jnp.zeros(20)},
        "lstm": {"w_ih": jnp.full((4, 8), 0.5)},
    }
    params = jax.device_put(params, rep)
    path = save_sharded(tmp_path / "p", params)
    out = load_sharded(path, params)
    for a, b in zip(jax.tree_util.tree_leaves(out),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
