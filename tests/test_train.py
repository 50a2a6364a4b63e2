"""Training-layer tests: optimizer parity with torch, metrics, checkpointing,
and the synthetic end-to-end integration (SURVEY.md §4.5)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
import optax

from cgcnet_tpu.config import Config, TrainConfig
from cgcnet_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from cgcnet_tpu.train.metrics import ImageLevelMetric, image_stem
from cgcnet_tpu.train.optim import make_optimizer, step_lr_schedule


# ---------------------------------------------------------------------------
# optimizer parity vs torch
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name", ["adam", "sgd", "rmsprop"])
def test_optimizer_matches_torch(name, rng):
    w0 = rng.normal(size=(5, 3)).astype(np.float32)
    cfg = TrainConfig(optim=name, lr=0.01, weight_decay=1e-2, step_size=0)
    tx = make_optimizer(cfg, steps_per_epoch=1)

    # torch side
    wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    if name == "adam":
        opt = torch.optim.Adam([wt], lr=0.01, weight_decay=1e-2)
    elif name == "sgd":
        opt = torch.optim.SGD([wt], lr=0.01, momentum=0.9, weight_decay=1e-2)
    else:
        opt = torch.optim.RMSprop([wt], lr=0.01, momentum=0.9, weight_decay=1e-2)

    params = {"w": jnp.asarray(w0)}
    opt_state = tx.init(params)
    for step in range(5):
        g = rng.normal(size=(5, 3)).astype(np.float32)
        # torch
        opt.zero_grad()
        wt.grad = torch.from_numpy(g.copy())
        opt.step()
        # jax
        updates, opt_state = tx.update({"w": jnp.asarray(g)}, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        np.testing.assert_allclose(
            np.asarray(params["w"]), wt.detach().numpy(), atol=1e-5,
            err_msg=f"{name} diverged at step {step}",
        )


@pytest.mark.parametrize("name", ["adam", "sgd", "rmsprop"])
def test_flatten_opt_bit_identical(name, rng):
    """optax.flatten (train.flatten_opt) must not change values at all:
    every transform in the chain is elementwise, so running the optimizer
    on one concatenated vector is bit-identical to per-leaf updates."""
    params = {
        "a": jnp.asarray(rng.normal(size=(7, 3)).astype(np.float32)),
        "b": {"w": jnp.asarray(rng.normal(size=(4,)).astype(np.float32)),
              "v": jnp.asarray(rng.normal(size=(2, 2, 2)).astype(np.float32))},
    }
    grads_seq = [
        jax.tree.map(
            lambda p: jnp.asarray(
                rng.normal(size=p.shape).astype(np.float32)
            ),
            params,
        )
        for _ in range(4)
    ]
    outs = []
    for flat in (False, True):
        cfg = TrainConfig(
            optim=name, lr=0.01, weight_decay=1e-2, step_size=2,
            flatten_opt=flat,
        )
        tx = make_optimizer(cfg, steps_per_epoch=2)
        p = params
        st = tx.init(p)
        for g in grads_seq:
            up, st = tx.update(g, st, p)
            p = jax.tree.map(lambda x, u: x + u, p, up)
        outs.append(p)
    for a, b in zip(jax.tree.leaves(outs[0]), jax.tree.leaves(outs[1])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_step_lr_schedule():
    sched = step_lr_schedule(1.0, step_size=2, gamma=0.1, steps_per_epoch=10)
    assert sched(0) == 1.0
    assert sched(19) == 1.0          # epoch 1
    assert np.isclose(sched(20), 0.1)   # epoch 2
    assert np.isclose(sched(45), 0.01)  # epoch 4
    flat = step_lr_schedule(1.0, step_size=0, gamma=0.1, steps_per_epoch=10)
    assert flat(1000) == 1.0


def test_step_lr_matches_torch():
    wt = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([wt], lr=0.5)
    sch = torch.optim.lr_scheduler.StepLR(opt, step_size=3, gamma=0.5)
    sched = step_lr_schedule(0.5, 3, 0.5, steps_per_epoch=4)
    for epoch in range(10):
        for step in range(4):
            assert np.isclose(
                sched(epoch * 4 + step), opt.param_groups[0]["lr"]
            ), (epoch, step)
        sch.step()


# ---------------------------------------------------------------------------
# image-level metric
# ---------------------------------------------------------------------------

def test_image_stem():
    assert image_stem("fold_1/1_normal/imgA_grade_1_3") == "imgA"
    assert image_stem("imgB_grade_2_0") == "imgB"


def test_image_level_majority_vote():
    m = ImageLevelMetric()
    # imgA (label 0): patches vote 0,0,1 -> 0 correct
    m.add_batch(["f/imgA_grade_1_0", "f/imgA_grade_1_1", "f/imgA_grade_1_2"],
                [0, 0, 1], [0, 0, 0])
    # imgB (label 2): votes 1,1 -> predicts 1: wrong 3-class, right binary
    m.add_batch(["f/imgB_grade_3_0", "f/imgB_grade_3_1"], [1, 1], [2, 2])
    r = m.result()
    assert np.isclose(r["img_acc"], 0.5)
    assert np.isclose(r["binary_acc"], 1.0)


# ---------------------------------------------------------------------------
# checkpointing
# ---------------------------------------------------------------------------

def test_checkpoint_roundtrip(tmp_path, rng):
    state = {
        "params": {"w": jnp.asarray(rng.normal(size=(3, 3)).astype(np.float32))},
        "step": jnp.asarray(7),
    }
    save_checkpoint(tmp_path, state, epoch=4, metrics={"acc": 0.5}, is_best=True)
    target = jax.tree.map(jnp.zeros_like, state)
    restored, meta = load_checkpoint(tmp_path / "weight.msgpack", target)
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w"]), np.asarray(state["params"]["w"])
    )
    assert int(restored["step"]) == 7
    assert meta["epoch"] == 4
    # best copy exists and loads the same
    best, _ = load_checkpoint(tmp_path, target)
    np.testing.assert_array_equal(
        np.asarray(best["params"]["w"]), np.asarray(state["params"]["w"])
    )


def test_checkpoint_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_checkpoint(tmp_path / "nope.msgpack", {})


# ---------------------------------------------------------------------------
# end-to-end: synthetic training reaches high accuracy; resume is exact
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    from cgcnet_tpu.cli.train import main

    root = tmp_path_factory.mktemp("synth_e2e")
    ckpt = tmp_path_factory.mktemp("runs")
    from cgcnet_tpu.dataflow.synthetic import generate_dataset

    generate_dataset(
        str(root), patches_per_image=3, images_per_grade=2,
        n_nodes=(100, 200), seed=0,
    )
    overrides = [
        f"data.root={root}",
        "data.max_num_nodes=256",
        "data.sample_ratio=1.0",
        "data.batch_size=6",
        "data.num_workers=2",
        "model.hidden_dim=16",
        "model.embedding_dim=16",
        "model.assign_hidden_dim=16",
        "model.drop_out=0.0",
        "train.num_epochs=12",
        "train.eval_every_batches=0",
        "train.lr=0.005",
        "train.step_size=30",
        f"train.ckpt_dir={ckpt}",
        "train.log_every=100",
    ]
    final = main(overrides)
    return final, overrides


def test_synthetic_training_learns(trained):
    final, _ = trained
    assert final["patch_acc"] >= 0.85, final
    assert final["img_acc"] >= 0.85, final


def test_resume_restores_exactly(trained):
    _, overrides = trained
    from cgcnet_tpu.cli.train import main

    # eval-only resume from best must reproduce the trained accuracy
    final2 = main(overrides + ["train.resume=best", "--eval-only"])
    assert final2["patch_acc"] >= 0.85


def test_crossval_driver_runs(tmp_path):
    """3-fold cross-validation driver aggregates per-fold results."""
    from cgcnet_tpu.cli.crossval import main as cv_main
    from cgcnet_tpu.dataflow.synthetic import generate_dataset

    root = tmp_path / "cvdata"
    generate_dataset(
        str(root), patches_per_image=2, images_per_grade=1,
        n_nodes=(80, 140), seed=9,
    )
    out = cv_main([
        f"data.root={root}", "data.max_num_nodes=160", "data.sample_ratio=1.0",
        "data.batch_size=3", "data.num_workers=1",
        "model.hidden_dim=8", "model.embedding_dim=8",
        "model.assign_hidden_dim=8", "model.drop_out=0.0",
        "train.num_epochs=1", "train.eval_every_batches=0",
        f"train.ckpt_dir={tmp_path/'cvruns'}", "train.log_every=100",
    ])
    assert set(out["folds"]) == {1, 2, 3}
    assert 0.0 <= out["mean"]["img_acc"] <= 1.0


def test_mid_epoch_validation_and_best_ckpt(tmp_path):
    """eval_every_batches > 0: mid-epoch val records stream to JSONL and the
    best checkpoint is written (reference train.py:185-207 behaviour)."""
    import json as _json

    from cgcnet_tpu.cli.train import main
    from cgcnet_tpu.dataflow.synthetic import generate_dataset

    root = tmp_path / "mv"
    generate_dataset(
        str(root), patches_per_image=2, images_per_grade=1,
        n_nodes=(80, 140), seed=4,
    )
    main([
        f"data.root={root}", "data.max_num_nodes=160", "data.sample_ratio=1.0",
        "data.batch_size=2", "data.num_workers=1",
        "model.hidden_dim=8", "model.embedding_dim=8",
        "model.assign_hidden_dim=8", "model.drop_out=0.0",
        "train.num_epochs=1", "train.eval_every_batches=2",
        f"train.ckpt_dir={tmp_path/'runs'}", "train.log_every=100",
    ])
    runs = list((tmp_path / "runs").glob("*/metrics.jsonl"))
    assert runs
    records = [_json.loads(l) for l in runs[0].read_text().splitlines()]
    vals = [r for r in records if r.get("kind") == "val"]
    # 6 train patches / batch 2 = 3 batches -> at least one mid-epoch val
    # plus the end-of-epoch one
    assert len(vals) >= 2
    assert (runs[0].parent / "model_best.msgpack").exists()
