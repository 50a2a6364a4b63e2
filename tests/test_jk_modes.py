import numpy as np

import jax
import jax.numpy as jnp

from cgcnet_tpu.nn.jk import DenseJK


def test_cat_mode_identity(rng):
    xs = jnp.asarray(rng.normal(size=(2, 5, 12)).astype(np.float32))
    jk = DenseJK(4, 3, mode="cat")
    v = jk.init(jax.random.key(0), xs)
    np.testing.assert_array_equal(np.asarray(jk.apply(v, xs)), np.asarray(xs))
    assert not v.get("params", {})  # no parameters


def test_max_mode(rng):
    xs = jnp.asarray(rng.normal(size=(2, 5, 12)).astype(np.float32))
    jk = DenseJK(4, 3, mode="max")
    v = jk.init(jax.random.key(0), xs)
    out = np.asarray(jk.apply(v, xs))
    ref = np.max(np.stack(np.split(np.asarray(xs), 3, axis=-1)), axis=0)
    np.testing.assert_array_equal(out, ref)
    assert out.shape == (2, 5, 4)
