"""Serving-export tests: jax.export round-trip parity and the export CLI."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cgcnet_tpu.config import ModelConfig
from cgcnet_tpu.nn.model import CGCNet
from cgcnet_tpu.utils.export_model import (
    export_forward,
    load_exported,
    save_exported,
)

from tests.test_model import build_graph


@pytest.fixture(scope="module")
def small_model(rng_module):
    cfg = ModelConfig(max_num_nodes=120, assign_ratio=0.2, use_pallas=False)
    g = build_graph(rng_module, batch=2, cap=64, n_lo=20, n_hi=60)
    model = CGCNet(cfg)
    variables = model.init(jax.random.key(0), g, train=False)
    return model, variables, g


@pytest.fixture(scope="module")
def rng_module():
    return np.random.default_rng(7)


def test_export_roundtrip_matches_apply(small_model, tmp_path_factory):
    model, variables, g = small_model
    want = np.asarray(model.apply(variables, g, train=False))

    exported, header = export_forward(model, variables, g)
    assert header["fields"][0] == "x"
    assert "n_nodes" in header["fields"]

    path = tmp_path_factory.mktemp("exp") / "model.cgexp"
    save_exported(exported, header, path)
    fwd, header2 = load_exported(path)
    assert header2["fields"] == header["fields"]

    got = np.asarray(fwd(g))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_symbolic_batch_serves_any_batch(small_model, tmp_path_factory, rng):
    """One artifact exported with a symbolic batch dim must serve batch 1
    and 3 with logits matching model.apply."""
    model, variables, g = small_model
    exported, header = export_forward(
        model, variables, g, symbolic_batch=True
    )
    assert header["symbolic_batch"] and header["inputs"]["x"]["shape"][0] == "b"
    path = tmp_path_factory.mktemp("exp") / "model_sb.cgexp"
    save_exported(exported, header, path)
    fwd, _ = load_exported(path)
    for bs in (1, 3):
        gb = build_graph(rng, batch=bs, cap=g.capacity, n_lo=20, n_hi=60)
        got = np.asarray(fwd(gb))
        want = np.asarray(model.apply(variables, gb, train=False))
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_export_is_shape_checked(small_model, tmp_path_factory):
    model, variables, g = small_model
    exported, header = export_forward(model, variables, g)
    path = tmp_path_factory.mktemp("exp") / "model.cgexp"
    save_exported(exported, header, path)
    fwd, _ = load_exported(path)

    bad = g.replace(x=jnp.zeros((2, 128, g.x.shape[2]), g.x.dtype))
    with pytest.raises(Exception):
        fwd(bad)


def test_export_missing_field_raises(small_model, tmp_path_factory):
    model, variables, g = small_model
    exported, header = export_forward(model, variables, g)
    path = tmp_path_factory.mktemp("exp") / "model.cgexp"
    save_exported(exported, header, path)
    fwd, _ = load_exported(path)

    class _Bare:
        x = g.x  # everything else absent

    with pytest.raises(ValueError, match="needs graph field"):
        fwd(_Bare())


def test_export_bad_magic_rejected(tmp_path):
    p = tmp_path / "junk.cgexp"
    head = json.dumps({"magic": "nope"}).encode()
    import struct as _s

    p.write_bytes(_s.pack("<Q", len(head)) + head + b"payload")
    with pytest.raises(ValueError, match="not a"):
        load_exported(p)


def test_pallas_export_rejected_on_cpu_host():
    """--pallas needs Mosaic lowering, which only the TPU backend provides —
    the CLI must fail fast with a clear message, not write a silent
    XLA-path artifact."""
    from cgcnet_tpu.cli.export import main as export_main

    with pytest.raises(SystemExit):
        export_main(["--ckpt", "x.msgpack", "-o", "y.cgexp", "--pallas"])


def test_pallas_serving_graph_carries_bsr_signature():
    """pallas=True serving graphs must expose transpose tables + BSR
    metadata so the exported signature accepts loader-built metadata."""
    from cgcnet_tpu.cli.export import _serving_graph
    from cgcnet_tpu.config import Config

    cfg = Config().apply_overrides(["data.max_num_nodes=512"])
    g = _serving_graph(cfg, 2, pallas=True)
    assert g.nbr_t is not None and g.blk_cols is not None
    assert g.blk_cols.shape[1] == g.capacity // 128
    assert g.blk_cols.shape[2] == cfg.data.bsr_blocks
    g0 = _serving_graph(cfg, 2, pallas=False)
    assert g0.nbr_t is None and g0.blk_cols is None


def test_portable_artifact_serves_loader_batches(tmp_path, rng):
    """The full serving pipeline: synthetic dataset -> GraphLoader batch
    (which carries transpose tables + BSR metadata the portable signature
    does not take) -> artifact forward must match model.apply bit-for-bit
    on the same weights."""
    from cgcnet_tpu.cli.export import _serving_graph
    from cgcnet_tpu.config import Config
    from cgcnet_tpu.dataflow.dataset import NucleiGraphDataset
    from cgcnet_tpu.dataflow.loader import GraphLoader
    from cgcnet_tpu.dataflow.synthetic import generate_dataset
    from cgcnet_tpu.nn.model import CGCNet

    root = tmp_path / "data"
    generate_dataset(str(root), patches_per_image=2, images_per_grade=1,
                     n_nodes=(80, 150), seed=5)
    cfg = Config().apply_overrides([
        f"data.root={root}", "data.max_num_nodes=512",
        "model.max_num_nodes=512", "data.num_workers=1",
        "model.use_pallas=never",
    ])
    ds = NucleiGraphDataset(cfg.data, "train")
    loader = GraphLoader(ds, 2, shuffle=False, num_workers=1, wire=False)
    batch = next(iter(loader.epoch(0)))
    assert batch.nbr_t is not None  # loader batches carry the extra fields

    model = CGCNet(cfg.model)
    example = _serving_graph(cfg, 2)
    assert example.capacity == batch.capacity  # same padding rule
    variables = model.init(jax.random.key(0), example, train=False)

    exported, header = export_forward(model, variables, example)
    path = tmp_path / "m.cgexp"
    save_exported(exported, header, path)
    fwd, _ = load_exported(path)

    got = np.asarray(fwd(batch))
    want = np.asarray(model.apply(variables, batch, train=False))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_export_cli_end_to_end(tmp_path, rng):
    """Train 1 synthetic epoch -> export the checkpoint -> serve logits that
    match a fresh model.apply with the same weights."""
    from cgcnet_tpu.cli.train import main as train_main

    train_main([
        "--synthetic",
        "train.num_epochs=1",
        f"train.ckpt_dir={tmp_path}/runs",
        "data.num_workers=1",
        "train.test_epoch=1",
    ])
    ckpt = next((tmp_path / "runs").rglob("model_best.msgpack"))

    from cgcnet_tpu.cli.export import main as export_main

    out = tmp_path / "model.cgexp"
    # synthetic training pins data.max_num_nodes=512 (cli/train.py:61);
    # the export config must rebuild the same model dims to load the ckpt
    res = export_main([
        "--ckpt", str(ckpt), "-o", str(out), "--batch", "2",
        "data.max_num_nodes=512",
    ])
    assert out.exists() and res["bytes"] > 0

    fwd, header = load_exported(out)
    b, cap, f = header["inputs"]["x"]["shape"]
    k = header["inputs"]["nbr"]["shape"][2]
    assert b == 2 and cap % 128 == 0

    g = build_graph(np.random.default_rng(3), batch=2, cap=cap, feat=f,
                    k=k, n_lo=20, n_hi=min(cap, 100))
    logits = np.asarray(fwd(g))
    assert logits.shape == (2, 3)
    assert np.isfinite(logits).all()
