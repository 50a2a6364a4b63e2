"""predict CLI: checkpoint -> per-patch predictions + image-level summary."""

import json

import numpy as np


def test_predict_cli_roundtrip(tmp_path):
    from cgcnet_tpu.cli.train import main as train_main
    from cgcnet_tpu.cli.predict import main as predict_main
    from cgcnet_tpu.dataflow.synthetic import generate_dataset

    root = tmp_path / "data"
    generate_dataset(
        str(root), patches_per_image=2, images_per_grade=1,
        n_nodes=(100, 180), seed=2,
    )
    overrides = [
        f"data.root={root}", "data.max_num_nodes=200", "data.sample_ratio=1.0",
        "data.batch_size=3", "data.num_workers=1",
        "model.hidden_dim=8", "model.embedding_dim=8",
        "model.assign_hidden_dim=8", "model.drop_out=0.0",
        "train.num_epochs=1", "train.eval_every_batches=0",
        f"train.ckpt_dir={tmp_path/'runs'}", "train.log_every=100",
    ]
    train_main(overrides)
    ckpts = list((tmp_path / "runs").glob("*/model_best.msgpack"))
    assert ckpts, "training left no best checkpoint"
    out = tmp_path / "pred.jsonl"
    result = predict_main(
        ["--ckpt", str(ckpts[0]), "--out", str(out), "--reps", "1"]
        + overrides
    )
    assert set(result) >= {"img_acc", "binary_acc", "patch_acc"}
    lines = [json.loads(l) for l in out.read_text().splitlines()]
    recs = [l for l in lines if "patch" in l]
    assert len(recs) == 6  # valid split: fold_3, 2 patches x 3 grades
    for r in recs:
        assert r["pred"] in (0, 1, 2) and len(r["logits"]) == 3
        assert np.isfinite(r["logits"]).all()
    assert lines[-1]["summary"]["patch_acc"] == result["patch_acc"]
