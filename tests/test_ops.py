"""Unit tests for sparse aggregation, renormalization, kNN and FPS ops."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cgcnet_tpu.core.convert import (
    coo_to_ell_np,
    dense_to_ell,
    dense_to_ell_np,
    ell_to_dense,
)
from cgcnet_tpu.core.graph import CellGraph, node_mask
from cgcnet_tpu.ops.ell import ell_gather_sum, renorm_dense, renorm_ell
from cgcnet_tpu.ops.fps import (
    farthest_point_sample_jnp,
    farthest_point_sample_np,
    fuse_sample_np,
)
from cgcnet_tpu.ops.knn import radius_knn_dense_oracle, radius_knn_jnp, radius_knn_np


def random_ell(rng, b=3, n=24, k=5, f=7):
    nbr = rng.integers(0, n, size=(b, n, k)).astype(np.int32)
    mask = (rng.uniform(size=(b, n, k)) < 0.7).astype(np.float32)
    x = rng.normal(size=(b, n, f)).astype(np.float32)
    w = rng.normal(size=(b, n, k)).astype(np.float32) * mask
    return jnp.asarray(nbr), jnp.asarray(mask), jnp.asarray(w), jnp.asarray(x)


class TestEllGatherSum:
    def test_matches_dense_matmul(self, rng):
        nbr, mask, w, x = random_ell(rng)
        out = ell_gather_sum(nbr, w, x)
        # dense oracle: sum duplicate slots (unlike ell_to_dense's max)
        b, n, k = nbr.shape
        adj = np.zeros((b, n, n), np.float32)
        for bi in range(b):
            for i in range(n):
                for ki in range(k):
                    adj[bi, i, int(nbr[bi, i, ki])] += float(w[bi, i, ki])
        ref = np.einsum("bij,bjf->bif", adj, np.asarray(x))
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_grad_matches_dense(self, rng):
        nbr, mask, w, x = random_ell(rng, b=2, n=10, k=3, f=4)
        g = jnp.asarray(rng.normal(size=(2, 10, 4)).astype(np.float32))

        def f_sparse(x_):
            return jnp.sum(ell_gather_sum(nbr, w, x_) * g)

        adj = np.asarray(ell_to_dense(CellGraph(
            x=x, nbr=nbr, nbr_mask=mask, nbr_w=w / jnp.maximum(mask, 1e-9),
            n_nodes=jnp.full((2,), 10, jnp.int32))))

        # build sum-duplicates dense for grad oracle
        b, n, k = nbr.shape
        adj = np.zeros((b, n, n), np.float32)
        for bi in range(b):
            for i in range(n):
                for ki in range(k):
                    adj[bi, i, int(nbr[bi, i, ki])] += float(w[bi, i, ki])

        def f_dense(x_):
            return jnp.sum(jnp.einsum("bij,bjf->bif", jnp.asarray(adj), x_) * g)

        gs = jax.grad(f_sparse)(x)
        gd = jax.grad(f_dense)(x)
        np.testing.assert_allclose(np.asarray(gs), np.asarray(gd), atol=1e-5)


class TestRenorm:
    def test_ell_matches_dense(self, rng):
        # build a real graph (unique neighbour slots incl. self)
        n, k, b = 30, 6, 2
        nbrs, masks, nns = [], [], []
        for _ in range(b):
            nn_ = int(rng.integers(20, n + 1))
            pos = rng.uniform(0, 200, (nn_, 2)).astype(np.float32)
            nbr, m = radius_knn_np(pos, 80.0, k)
            nbrp = np.tile(np.arange(n, dtype=np.int32)[:, None], (1, k))
            mp = np.zeros((n, k), np.float32)
            nbrp[:nn_], mp[:nn_] = nbr, m
            nbrs.append(nbrp); masks.append(mp); nns.append(nn_)
        nbr = jnp.asarray(np.stack(nbrs))
        mask = jnp.asarray(np.stack(masks))
        n_nodes = jnp.asarray(np.array(nns, np.int32))
        g = CellGraph(
            x=jnp.zeros((b, n, 1)), nbr=nbr, nbr_mask=mask, n_nodes=n_nodes
        )
        w = renorm_ell(nbr, mask, n_nodes, 0.4)
        dense_w = np.asarray(ell_to_dense(g.replace(nbr_w=w / jnp.maximum(mask, 1e-9))))
        adj = np.asarray(ell_to_dense(g))
        ref = np.asarray(
            renorm_dense(jnp.asarray(adj), 0.4, node_mask(n_nodes, n))
        )
        np.testing.assert_allclose(dense_w, ref, atol=1e-6)


class TestConvert:
    def test_coo_ell_roundtrip(self, rng):
        n, width = 12, 4
        adj = (rng.uniform(size=(n, n)) < 0.2).astype(np.float32)
        # cap row degree at width
        for i in range(n):
            cols = np.nonzero(adj[i])[0]
            adj[i, cols[width:]] = 0
        src, dst = [], []
        for i in range(n):
            for j in np.nonzero(adj[i])[0]:
                dst.append(i); src.append(j)
        nbr, mask = coo_to_ell_np(np.array(src), np.array(dst), n, width)
        g = CellGraph(
            x=jnp.zeros((1, n, 1)),
            nbr=jnp.asarray(nbr)[None],
            nbr_mask=jnp.asarray(mask)[None],
            n_nodes=jnp.asarray([n], jnp.int32),
        )
        np.testing.assert_array_equal(np.asarray(ell_to_dense(g))[0], adj)

    def test_dense_to_ell_jnp_matches_np(self, rng):
        n, width = 10, 3
        adj = (rng.uniform(size=(n, n)) < 0.25).astype(np.float32)
        for i in range(n):
            cols = np.nonzero(adj[i])[0]
            adj[i, cols[width:]] = 0
        nbr_np, mask_np = dense_to_ell_np(adj, width)
        nbr_j, mask_j = dense_to_ell(jnp.asarray(adj)[None], width)
        np.testing.assert_array_equal(np.asarray(nbr_j)[0], nbr_np)
        np.testing.assert_array_equal(np.asarray(mask_j)[0], mask_np)


class TestKnn:
    def test_self_loop_first(self, rng):
        pos = rng.uniform(0, 100, (20, 2)).astype(np.float32)
        nbr, mask = radius_knn_np(pos, 50.0, 5)
        np.testing.assert_array_equal(nbr[:, 0], np.arange(20))
        assert (mask[:, 0] == 1).all()

    def test_radius_respected(self, rng):
        pos = rng.uniform(0, 300, (40, 2)).astype(np.float32)
        nbr, mask = radius_knn_np(pos, 90.0, 6)
        d = np.linalg.norm(pos[:, None] - pos[None], axis=-1)
        for i in range(40):
            for kk in range(6):
                if mask[i, kk]:
                    assert d[i, nbr[i, kk]] <= 90.0 + 1e-4

    def test_nearest_selection(self):
        # collinear points spaced 10 apart: node 0 must pick 0,1,2 (k=3, r=25)
        pos = np.array([[0, 0], [10, 0], [20, 0], [30, 0]], np.float32)
        nbr, mask = radius_knn_np(pos, 25.0, 3)
        assert set(nbr[0][mask[0] > 0]) == {0, 1, 2}

    def test_jnp_matches_np(self, rng):
        n = 30
        # integer coords keep distance gaps >> tie-break bias
        pos = rng.integers(0, 200, size=(n, 2)).astype(np.float32)
        nbr_np, mask_np = radius_knn_np(pos, 70.0, 5)
        nbr_j, mask_j = radius_knn_jnp(
            jnp.asarray(pos), jnp.asarray(n), 70.0, 5
        )
        # compare as neighbour sets per row
        for i in range(n):
            a = set(np.asarray(nbr_j)[i][np.asarray(mask_j)[i] > 0].tolist())
            b = set(nbr_np[i][mask_np[i] > 0].tolist())
            assert a == b, f"row {i}: {a} vs {b}"

    def test_jnp_padding_ignored(self, rng):
        pos = rng.uniform(0, 100, (16, 2)).astype(np.float32)
        padded = np.zeros((24, 2), np.float32)
        padded[:16] = pos
        nbr_a, mask_a = radius_knn_jnp(jnp.asarray(padded), jnp.asarray(16), 60.0, 4)
        nbr_b, mask_b = radius_knn_np(pos, 60.0, 4)
        for i in range(16):
            a = set(np.asarray(nbr_a)[i][np.asarray(mask_a)[i] > 0].tolist())
            b = set(nbr_b[i][mask_b[i] > 0].tolist())
            assert a == b
        assert (np.asarray(mask_a)[16:] == 0).all()

    def test_scan_order_compat(self):
        # reference torch-cluster takes FIRST k within radius in index order
        pos = np.array([[0, 0], [1, 0], [2, 0], [0.5, 0]], np.float32)
        nbr, mask = radius_knn_np(pos, 10.0, 3, scan_order=True)
        assert nbr[0][mask[0] > 0].tolist() == [0, 1, 2]  # not the 3 nearest
        nbr2, _ = radius_knn_np(pos, 10.0, 3, scan_order=False)
        assert set(nbr2[0].tolist()) == {0, 1, 3}  # nearest picks 0.5 away pt


class TestFps:
    def test_matches_reference_semantics(self, rng):
        # greedy max-min over the distance table, argmax-first-on-ties
        pos = rng.uniform(0, 100, (40, 2))
        d = np.linalg.norm(pos[:, None] - pos[None], axis=-1)
        idx = farthest_point_sample_np(d, 10, np.random.default_rng(7))
        # re-simulate
        r2 = np.random.default_rng(7)
        start = r2.integers(40)
        assert idx[0] == start
        running = d[start].copy()
        for i in range(1, 10):
            expect = np.argmax(running)
            assert idx[i] == expect
            running = np.minimum(running, d[expect])
        assert len(set(idx.tolist())) == 10  # no duplicates

    def test_deterministic_given_seed(self, rng):
        pos = rng.uniform(0, 100, (50, 2))
        d = np.linalg.norm(pos[:, None] - pos[None], axis=-1)
        a = farthest_point_sample_np(d, 20, np.random.default_rng(3))
        b = farthest_point_sample_np(d, 20, np.random.default_rng(3))
        np.testing.assert_array_equal(a, b)

    def test_fuse_split(self, rng):
        pos = rng.uniform(0, 100, (60, 2))
        d = np.linalg.norm(pos[:, None] - pos[None], axis=-1)
        idx = fuse_sample_np(d, 30, np.random.default_rng(5), far_fraction=0.7)
        assert len(idx) == 30
        assert len(set(idx.tolist())) == 30
        far = farthest_point_sample_np(d, 21, np.random.default_rng(5))
        np.testing.assert_array_equal(idx[:21], far)  # 70% FPS prefix

    def test_jnp_fps_covers_extremes(self, rng):
        # FPS from any start must include the two extreme corners early
        pos = np.zeros((20, 2), np.float32)
        pos[0] = [0, 0]
        pos[1] = [1000, 1000]
        pos[2:] = rng.uniform(400, 600, (18, 2))
        got = np.asarray(
            farthest_point_sample_jnp(
                jnp.asarray(pos), jnp.asarray(20), 4, jax.random.key(0)
            )
        )
        assert {0, 1} <= set(got.tolist())


def test_node_mask():
    m = np.asarray(node_mask(jnp.asarray([0, 2, 5]), 5))
    np.testing.assert_array_equal(m, [[0]*5, [1,1,0,0,0], [1]*5])
