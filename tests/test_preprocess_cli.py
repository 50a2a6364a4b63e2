"""End-to-end preprocessing CLI: masks + images -> protos -> trainable data."""

import numpy as np
from pathlib import Path
import pytest

from cgcnet_tpu.dataflow.proto import list_protos, load_proto


@pytest.fixture(scope="module")
def mask_tree(tmp_path_factory):
    """Instance masks + matching images in the reference directory layout."""
    rng = np.random.default_rng(0)
    root = tmp_path_factory.mktemp("raw")
    masks = root / "masks"
    images = root / "images"
    try:
        import cv2
    except ImportError:
        pytest.skip("cv2 required")
    names = []
    for fold in ("fold_1", "fold_3"):
        for gdir, grade in (("1_normal", 0), ("3_high_grade", 2)):
            d = masks / fold / gdir
            d.mkdir(parents=True)
            (images / fold / gdir).mkdir(parents=True)
            h = w = 96
            mask = np.zeros((h, w), np.int64)
            lab = 1
            for cy in range(12, h, 24):
                for cx in range(12, w, 24):
                    y, x = np.ogrid[:h, :w]
                    mask[(y - cy) ** 2 + (x - cx) ** 2 <= 25] = lab
                    lab += 1
            name = f"img0_grade_{grade + 1}_0"
            np.save(d / f"{name}.npy", mask)
            img = rng.integers(40, 200, (h, w, 3)).astype(np.uint8)
            cv2.imwrite(str(images / fold / gdir / f"{name}.png"), img)
            names.append(f"{fold}/{gdir}/{name}")
    return root, names


def test_features_cli_end_to_end(mask_tree, tmp_path):
    from cgcnet_tpu.cli.preprocess import main

    root, names = mask_tree
    out = tmp_path / "data"
    rc = main([
        "features",
        "--masks", str(root / "masks"),
        "--images", str(root / "images"),
        "--out", str(out),
        "--processes", "1",
    ])
    assert rc == 0
    found = list_protos(out, ["fold_1", "fold_3"])
    assert sorted(found) == sorted(names)
    p = load_proto(out, names[0])
    assert p.features.shape[1] == 16 and p.coords.shape[1] == 2
    assert p.num_nodes == 16  # 4x4 planted nuclei
    assert np.isfinite(p.features).all()
    assert p.label in (0, 2)
    # grade from directory (reference prepare_cv_dataset.py:64-69)
    high = [n for n in names if "high" in n][0]
    assert load_proto(out, high).label == 2


def test_fixed_cli(mask_tree, tmp_path):
    from cgcnet_tpu.cli.preprocess import main
    from cgcnet_tpu.dataflow.fixed_epochs import load_fixed_choice
    from cgcnet_tpu.config import DataConfig

    root, names = mask_tree
    out = tmp_path / "data2"
    main([
        "features", "--masks", str(root / "masks"),
        "--out", str(out), "--processes", "1",
    ])
    rc = main([
        "fixed", "--root", str(out), "--epochs", "2", "--processes", "1",
        "data.sample_ratio=0.5", "data.min_nodes_no_subsample=4",
    ])
    assert rc == 0
    cfg = DataConfig(root=str(out), sample_ratio=0.5, min_nodes_no_subsample=4)
    c = load_fixed_choice(cfg, names[0], 0)
    assert c is not None and len(c) == 8  # 50% of 16 nuclei


class _FakeData:
    """Stands in for a torch_geometric Data pickle (x, pos, y attrs)."""

    def __init__(self, x, pos, y):
        self.x, self.pos, self.y = x, pos, y


class TestImportReference:
    def test_npy_tree_roundtrip(self, tmp_path, rng):
        from cgcnet_tpu.cli.preprocess import main
        from cgcnet_tpu.dataflow.proto import load_proto

        src, names = self._make_ref_tree_npy(tmp_path, rng)
        dst = tmp_path / "out"
        rc = main(["import-reference", "--src", str(src), "--dst", str(dst)])
        assert rc == 0
        rel, feats, coords = names[0]
        proto = load_proto(dst, rel)
        np.testing.assert_allclose(proto.features, feats, atol=0)
        np.testing.assert_allclose(proto.coords, coords, atol=0)
        assert proto.label == 0
        # trains: dataset layer picks the protos up directly
        from cgcnet_tpu.config import DataConfig
        from cgcnet_tpu.dataflow.dataset import NucleiGraphDataset

        cfg = DataConfig(root=str(dst), max_num_nodes=128, sample_ratio=1.0,
                         min_nodes_no_subsample=10)
        ds = NucleiGraphDataset(cfg, "train")
        s = ds.get(0)
        assert s.n_nodes > 0 and np.isfinite(s.x).all()

    def _make_ref_tree_npy(self, tmp_path, rng):
        src = tmp_path / "refdata"
        names = []
        for fold in ("fold_1", "fold_3"):
            for grade in ("1_normal", "2_low_grade", "3_high_grade"):
                for i in range(2):
                    n = int(rng.integers(60, 120))
                    feats = rng.normal(size=(n, 16)).astype(np.float32)
                    coords = rng.uniform(0, 3584, (n, 2)).astype(np.float32)
                    rel = Path(fold) / grade / f"img{i}_grade_x_0"
                    fp = src / "proto" / "feature" / "colorectal" / rel
                    cp = src / "proto" / "coordinate" / "colorectal" / rel
                    fp.parent.mkdir(parents=True, exist_ok=True)
                    cp.parent.mkdir(parents=True, exist_ok=True)
                    np.save(str(fp) + ".npy", feats)
                    np.save(str(cp) + ".npy", coords)
                    names.append((str(rel), feats, coords))
        return src, names

    def test_pt_tree(self, tmp_path, rng):
        import torch
        from cgcnet_tpu.cli.preprocess import main
        from cgcnet_tpu.dataflow.proto import load_proto

        src = tmp_path / "pts"
        n = 80
        feats = rng.normal(size=(n, 16)).astype(np.float32)
        coords = rng.uniform(0, 3584, (n, 2)).astype(np.float32)
        x = np.concatenate([feats, coords], -1)  # raw-proto convention
        d = _FakeData(torch.from_numpy(x), torch.from_numpy(coords),
                 torch.tensor([2]))
        rel = Path("fold_2") / "3_high_grade" / "imgZ_grade_3_0"
        p = src / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        torch.save(d, str(p) + ".pt")
        dst = tmp_path / "out2"
        rc = main(["import-reference", "--src", str(src), "--dst", str(dst)])
        assert rc == 0
        proto = load_proto(dst, str(rel))
        np.testing.assert_allclose(proto.features, feats, atol=0)
        np.testing.assert_allclose(proto.coords, coords, atol=0)
        assert proto.label == 2
