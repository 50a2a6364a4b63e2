"""Partial checkpoint loading + bf16 compute path."""

import numpy as np

import jax
import jax.numpy as jnp

from cgcnet_tpu.train.checkpoint import load_partial, save_checkpoint


def test_load_partial(tmp_path, rng):
    src = {
        "a": jnp.asarray(rng.normal(size=(3, 3)).astype(np.float32)),
        "b": jnp.asarray(rng.normal(size=(2,)).astype(np.float32)),
    }
    save_checkpoint(tmp_path, src, epoch=0)
    target = {
        "a": jnp.zeros((3, 3)),          # matching -> copied
        "b": jnp.zeros((5,)),            # shape mismatch -> skipped
        "c": jnp.ones((1,)),             # missing in ckpt -> skipped
    }
    restored, copied, skipped = load_partial(tmp_path / "weight.msgpack", target)
    np.testing.assert_array_equal(np.asarray(restored["a"]), np.asarray(src["a"]))
    np.testing.assert_array_equal(np.asarray(restored["b"]), np.zeros(5))
    assert copied == ["a"] and sorted(skipped) == ["b", "c"]


def test_load_partial_across_optimizer_layouts(tmp_path, rng):
    """A checkpoint saved under one train.flatten_opt setting must still
    yield its params/batch_stats into a state built under the other setting
    (inference CLIs restore via load_partial for exactly this)."""
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _example_graph
    from cgcnet_tpu.config import Config
    from cgcnet_tpu.train.checkpoint import load_checkpoint
    from cgcnet_tpu.train.optim import make_optimizer
    from cgcnet_tpu.train.state import create_train_state

    graph = _example_graph(batch=2, cap=128, bsr_blocks=0)
    states = {}
    for flat in (True, False):
        cfg = Config().apply_overrides(
            ["model.max_num_nodes=256",
             f"train.flatten_opt={'true' if flat else 'false'}"]
        )
        tx = make_optimizer(cfg.train, steps_per_epoch=1)
        _, states[flat] = create_train_state(cfg, tx, graph)
    save_checkpoint(tmp_path, states[False], epoch=3)

    # full restore into the other layout fails with a CLEAR error
    try:
        load_checkpoint(tmp_path / "weight.msgpack", states[True])
        raise AssertionError("expected a structure-mismatch error")
    except ValueError as e:
        assert "flatten_opt" in str(e)

    # partial restore carries every param/batch_stat across layouts
    restored, copied, _ = load_partial(tmp_path / "weight.msgpack", states[True])
    assert any(k.startswith("params/") for k in copied)
    for a, b in zip(
        jax.tree.leaves(restored.params), jax.tree.leaves(states[False].params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree.leaves(restored.batch_stats),
        jax.tree.leaves(states[False].batch_stats),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_for_inference_rejects_config_mismatch(tmp_path, rng):
    """A checkpoint from a DIFFERENT model configuration must raise, not
    silently serve the few leaves that happen to match shapes."""
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _example_graph
    from cgcnet_tpu.config import Config
    from cgcnet_tpu.train.checkpoint import load_for_inference
    from cgcnet_tpu.train.optim import make_optimizer
    from cgcnet_tpu.train.state import create_train_state

    graph = _example_graph(batch=2, cap=128, bsr_blocks=0)

    def make_state(hidden):
        cfg = Config().apply_overrides(
            ["model.max_num_nodes=256", f"model.hidden_dim={hidden}",
             f"model.embedding_dim={hidden}"]
        )
        tx = make_optimizer(cfg.train, steps_per_epoch=1)
        return create_train_state(cfg, tx, graph)[1]

    save_checkpoint(tmp_path, make_state(20), epoch=0)
    target = make_state(24)  # different hidden_dim -> param shapes differ
    try:
        load_for_inference(tmp_path / "weight.msgpack", target)
        raise AssertionError("expected a config-mismatch error")
    except ValueError as e:
        assert "model configuration" in str(e)
    # and the matching config restores fine
    load_for_inference(tmp_path / "weight.msgpack", make_state(20))


def test_bf16_forward(rng):
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _example_graph
    from cgcnet_tpu.config import ModelConfig
    from cgcnet_tpu.nn.model import CGCNet

    graph = _example_graph(batch=2, cap=64)
    cfg32 = ModelConfig(max_num_nodes=128, use_pallas=False, drop_out=0.0)
    cfg16 = ModelConfig(
        max_num_nodes=128, use_pallas=False, drop_out=0.0,
        compute_dtype="bfloat16",
    )
    model32, model16 = CGCNet(cfg32), CGCNet(cfg16)
    v = model32.init({"params": jax.random.key(0)}, graph, train=False)
    out32 = np.asarray(model32.apply(v, graph, train=False))
    out16 = np.asarray(model16.apply(v, graph, train=False))
    assert out16.dtype == np.float32  # logits cast back to f32
    # bf16 matmuls: loose agreement only
    np.testing.assert_allclose(out16, out32, atol=0.1, rtol=0.1)
