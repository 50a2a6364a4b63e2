"""Unit coverage for the two remaining untested utility modules:
dataflow/random_graph.py (reference random_sample_graph2 semantics,
graph_sampler.py:5-45) and ops/segment.py (torch-scatter analogs)."""

import numpy as np
import jax.numpy as jnp

from cgcnet_tpu.dataflow.random_graph import random_distance_graph_ell
from cgcnet_tpu.ops.segment import (
    coo_spmm,
    segment_max,
    segment_softmax,
    segment_sum,
)


def _coords(n, seed=0, scale=100.0):
    return np.random.default_rng(seed).uniform(0, scale, (n, 2)).astype(
        np.float32
    )


class TestRandomDistanceGraph:
    def test_deterministic_under_same_rng(self):
        c = _coords(60)
        a = random_distance_graph_ell(c, 30.0, 4, np.random.default_rng(7))
        b = random_distance_graph_ell(c, 30.0, 4, np.random.default_rng(7))
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[1], b[1])

    def test_self_first_and_edges_within_radius(self):
        c = _coords(50)
        r = 25.0
        nbr, mask = random_distance_graph_ell(
            c, r, 3, np.random.default_rng(1)
        )
        n = len(c)
        assert nbr.shape == mask.shape == (n, 7)  # 2*n_sample + 1 default
        # self-edge occupies slot 0 of every row (kNN-builder contract)
        np.testing.assert_array_equal(nbr[:, 0], np.arange(n))
        assert (mask[:, 0] == 1.0).all()
        d = np.sqrt(((c[:, None] - c[None]) ** 2).sum(-1))
        for i in range(n):
            cols = nbr[i, mask[i] > 0]
            assert (d[i, cols] <= r + 1e-5).all()

    def test_symmetry_with_generous_width(self):
        # sampled edges are symmetrized before ELL packing; with width >= n
        # no truncation can hide the mirror edge
        c = _coords(24, seed=3, scale=40.0)
        nbr, mask = random_distance_graph_ell(
            c, 30.0, 3, np.random.default_rng(5), width=24
        )
        adj = np.zeros((24, 24), bool)
        for i in range(24):
            adj[i, nbr[i, mask[i] > 0]] = True
        np.testing.assert_array_equal(adj, adj.T)

    def test_isolated_point_keeps_only_self(self):
        c = np.array([[0.0, 0.0], [1.0, 0.0], [500.0, 500.0]], np.float32)
        nbr, mask = random_distance_graph_ell(
            c, 5.0, 2, np.random.default_rng(0)
        )
        assert mask[2].sum() == 1.0 and nbr[2, 0] == 2


class TestSegmentOps:
    def test_segment_sum_max_vs_numpy(self):
        rng = np.random.default_rng(2)
        data = rng.normal(size=(40,)).astype(np.float32)
        seg = rng.integers(0, 6, size=40)
        s = np.asarray(segment_sum(jnp.asarray(data), jnp.asarray(seg), 6))
        m = np.asarray(segment_max(jnp.asarray(data), jnp.asarray(seg), 6))
        for k in range(6):
            sel = data[seg == k]
            np.testing.assert_allclose(s[k], sel.sum(), rtol=1e-6)
            if len(sel):
                assert m[k] == sel.max()

    def test_segment_softmax_normalizes_and_is_stable(self):
        rng = np.random.default_rng(3)
        # huge logits: unshifted exp would overflow to inf
        logits = rng.normal(size=(30,)).astype(np.float32) * 300.0
        seg = np.sort(rng.integers(0, 5, size=30))
        p = np.asarray(
            segment_softmax(jnp.asarray(logits), jnp.asarray(seg), 5)
        )
        assert np.isfinite(p).all() and (p >= 0).all()
        for k in np.unique(seg):
            np.testing.assert_allclose(p[seg == k].sum(), 1.0, atol=1e-5)

    def test_coo_spmm_matches_dense(self):
        rng = np.random.default_rng(4)
        n, e, f = 12, 50, 5
        src = rng.integers(0, n, e)
        dst = rng.integers(0, n, e)
        w = rng.normal(size=e).astype(np.float32)
        x = rng.normal(size=(n, f)).astype(np.float32)
        out = np.asarray(
            coo_spmm(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w),
                     jnp.asarray(x), n)
        )
        dense = np.zeros((n, n), np.float32)
        np.add.at(dense, (dst, src), w)
        np.testing.assert_allclose(out, dense @ x, rtol=1e-5, atol=1e-5)
