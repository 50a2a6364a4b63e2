"""Feature-extraction, GEXF, fixed-epoch, and native-library tests."""

import numpy as np
import pytest

from cgcnet_tpu.preprocess.features import (
    extract_patch_features,
    glcm_stats,
    local_entropy,
    nucleus_intensity_stats,
    remove_small_instances,
)


def disk_mask(h, w, cy, cx, r, label):
    y, x = np.ogrid[:h, :w]
    return np.where((y - cy) ** 2 + (x - cx) ** 2 <= r * r, label, 0)


class TestFeatures:
    def test_intensity_stats(self):
        mask = np.array([[1, 1], [0, 0]], np.uint8)
        inten = np.array([[10, 20], [30, 40]], np.uint8)
        mean_in, diff, var, skew = nucleus_intensity_stats(mask, inten)
        assert np.isclose(mean_in, 15.0, atol=1e-4)
        assert np.isclose(diff, 20.0, atol=1e-4)
        assert np.isclose(var, 25.0)

    def test_glcm_uniform_region(self):
        # constant intensity inside mask -> homogeneity/energy/ASM = 1-ish
        mask = np.ones((8, 8), np.uint8)
        inten = np.full((8, 8), 100, np.uint8)
        contrast, dis, hom, ene, asm = glcm_stats(mask, inten)
        assert contrast == 0.0 and dis == 0.0
        assert np.isclose(hom, 1.0) and np.isclose(ene, 1.0) and np.isclose(asm, 1.0)

    def test_glcm_background_filtered(self):
        # all-zero (background) image -> empty filtered GLCM -> zeros
        assert glcm_stats(np.zeros((4, 4), np.uint8), np.zeros((4, 4), np.uint8)) == (
            0.0, 0.0, 0.0, 0.0, 0.0,
        )

    def test_local_entropy_flat_vs_noisy(self, rng):
        flat = np.full((32, 32), 7, np.uint8)
        noisy = rng.integers(0, 256, (32, 32)).astype(np.uint8)
        assert local_entropy(flat).max() < 1e-9
        assert local_entropy(noisy).mean() > 3.0

    def test_remove_small_instances(self):
        mask = np.zeros((20, 20), np.int64)
        mask[0, 0] = 1           # 1px instance -> dropped
        mask[5:15, 5:15] = 2     # 100px -> kept
        out = remove_small_instances(mask, min_size=10)
        assert (out == 1).sum() == 0 and (out == 2).sum() == 100

    def test_extract_patch(self, rng):
        h = w = 64
        mask = disk_mask(h, w, 16, 16, 6, 1) + disk_mask(h, w, 45, 40, 8, 2)
        gray = rng.integers(0, 256, (h, w)).astype(np.uint8)
        gray[mask > 0] = 200  # bright nuclei
        feats, coords = extract_patch_features(mask, gray)
        assert feats.shape == (2, 16) and coords.shape == (2, 2)
        # centroids near the planted centres
        np.testing.assert_allclose(coords[0], [16, 16], atol=1.0)
        np.testing.assert_allclose(coords[1], [45, 40], atol=1.0)
        # mean inside intensity ~200, area ~ pi r^2
        assert 180 < feats[0, 0] <= 210
        assert 80 < feats[0, 10] < 140   # area of r=6 disk
        assert 150 < feats[1, 10] < 230  # area of r=8 disk
        assert np.isfinite(feats).all()

    def test_empty_patch(self):
        feats, coords = extract_patch_features(
            np.zeros((16, 16), np.int64), np.zeros((16, 16), np.uint8)
        )
        assert feats.shape == (0, 16) and coords.shape == (0, 2)


class TestGexf:
    def test_roundtrip(self, tmp_path, rng):
        from cgcnet_tpu.ops.knn import radius_knn_np
        from cgcnet_tpu.utils.gexf import assignments_to_gexf

        n = 20
        pos = rng.uniform(0, 100, (n, 2)).astype(np.float32)
        nbr, mask = radius_knn_np(pos, 50.0, 4)
        s1 = rng.normal(size=(n, 5))
        s2 = rng.normal(size=(5, 2))
        path = tmp_path / "g.gexf"
        assignments_to_gexf(pos, nbr, mask, [s1, s2], path)
        import networkx as nx

        g = nx.read_gexf(path)
        assert len(g) == n
        a1 = {int(v) for _, v in g.nodes(data="assign_1")}
        assert a1 <= set(range(5))
        a2 = {int(v) for _, v in g.nodes(data="assign_2")}
        assert a2 <= {0, 1}
        # composition: assign_2 = argmax(s2)[assign_1]
        hard1, hard2 = np.argmax(s1, 1), np.argmax(s2, 1)
        for node, v in g.nodes(data="assign_2"):
            assert int(v) == hard2[hard1[int(node)]]


class TestFixedEpochs:
    def test_generate_and_replay(self, tmp_path):
        from cgcnet_tpu.config import DataConfig
        from cgcnet_tpu.dataflow.fixed_epochs import (
            generate_fixed_epochs,
            load_fixed_choice,
        )
        from cgcnet_tpu.dataflow.dataset import NucleiGraphDataset
        from cgcnet_tpu.dataflow.synthetic import generate_dataset

        generate_dataset(
            str(tmp_path), patches_per_image=1, images_per_grade=1,
            n_nodes=(120, 160), seed=0,
        )
        cfg = DataConfig(
            root=str(tmp_path), max_num_nodes=256, sample_ratio=0.5,
            min_nodes_no_subsample=10, seed=3,
        )
        generate_fixed_epochs(cfg, num_epochs=2, processes=1)
        ds_names = NucleiGraphDataset(cfg, "train").names
        c0 = load_fixed_choice(cfg, ds_names[0], 0)
        c1 = load_fixed_choice(cfg, ds_names[0], 1)
        assert c0 is not None and len(set(c0)) == len(c0)
        assert not np.array_equal(c0, c1)
        # replay matches online sampling (same seed fn)
        online = NucleiGraphDataset(cfg, "train").get(0, epoch=0)
        cfg_fixed = DataConfig(**{**cfg.__dict__, "use_fixed": True})
        fixed = NucleiGraphDataset(cfg_fixed, "train").get(0, epoch=0)
        np.testing.assert_array_equal(online.x, fixed.x)
        np.testing.assert_array_equal(online.nbr, fixed.nbr)


class TestNative:
    def test_native_matches_numpy(self, rng):
        from cgcnet_tpu.dataflow import native

        if not native.available():
            pytest.skip("native lib not built")
        from cgcnet_tpu.core.convert import transpose_ell_np
        from cgcnet_tpu.ops.knn import radius_knn_np

        pos = rng.uniform(0, 500, (300, 2)).astype(np.float32)
        nbr_c, mask_c = native.radius_knn(pos, 100.0, 8)
        nbr_p, mask_p = radius_knn_np(pos, 100.0, 8)
        for i in range(300):
            assert set(nbr_c[i][mask_c[i] > 0]) == set(nbr_p[i][mask_p[i] > 0])
        tc = native.transpose_ell(nbr_c, mask_c, 40)
        tp = transpose_ell_np(nbr_p, mask_p, 40)
        assert tc[2] == tp[2]

    def test_native_knn_exact_battery(self, rng):
        """The y-sorted window kNN must match the numpy oracle EXACTLY
        (slot order, ties by lower index) across density regimes — incl.
        the clumped-nuclei worst case the window search exists for."""
        from cgcnet_tpu.dataflow import native

        if not native.available():
            pytest.skip("native lib not built")
        from cgcnet_tpu.ops.knn import radius_knn_np

        centers = rng.uniform(0, 2000, (6, 2))
        cases = [
            ("uniform", rng.uniform(0, 2000, (3000, 2)), 100.0, 8),
            (
                "clumped",
                (centers[rng.integers(0, 6, 4000)]
                 + rng.normal(0, 60, (4000, 2))).clip(0, 1999),
                100.0, 8,
            ),
            ("coincident", np.zeros((24, 2)), 50.0, 8),
            ("line", np.stack([np.arange(300.0) * 7, np.zeros(300)], 1),
             100.0, 8),
            ("quantized", rng.integers(0, 40, (2000, 2)) * 8.0, 30.0, 8),
            ("k>deg", rng.uniform(0, 400, (500, 2)), 60.0, 32),
        ]
        for label, pts, radius, k in cases:
            pts = np.ascontiguousarray(pts, np.float32)
            nbr_c, mask_c = native.radius_knn(pts, radius, k)
            nbr_p, mask_p = radius_knn_np(pts, radius, k)
            np.testing.assert_array_equal(nbr_c, nbr_p, err_msg=label)
            np.testing.assert_array_equal(
                mask_c, mask_p.astype(np.float32), err_msg=label
            )

    def test_native_fps_table_parity(self, rng):
        from cgcnet_tpu.dataflow import native

        if not native.available():
            pytest.skip("native lib not built")
        from cgcnet_tpu.ops.fps import farthest_point_sample_np

        pos = rng.uniform(0, 100, (200, 2)).astype(np.float32)
        d = native.distance_table(pos)
        a = native.fps_table(d, 50, np.random.default_rng(5))
        b = farthest_point_sample_np(d, 50, np.random.default_rng(5))
        np.testing.assert_array_equal(a, b)


class TestNativeEntropy:
    def test_matches_numpy_convolution(self, rng):
        from cgcnet_tpu.dataflow import native
        from cgcnet_tpu.preprocess.features import disk_footprint

        if not native.available():
            pytest.skip("native lib not built")
        import cv2

        gray = rng.normal(120, 50, (80, 80)).clip(0, 255).astype(np.uint8)
        fast = native.local_entropy_u8(gray, 3)
        fp = disk_footprint(3)
        area = fp.sum()
        ent = np.zeros(gray.shape, np.float64)
        for lv in np.unique(gray):
            plane = (gray == lv).astype(np.float32)
            cnt = cv2.filter2D(plane, -1, fp, borderType=cv2.BORDER_REFLECT)
            p = np.clip(cnt / area, 1e-12, 1.0)
            ent -= np.where(cnt > 0, p * np.log2(p), 0.0)
        np.testing.assert_allclose(fast, ent, atol=1e-4)
