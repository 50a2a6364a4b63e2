"""Block-sparse Pallas kernel tests (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import cgcnet_tpu.ops.pallas.bsr_kernel as bk
from cgcnet_tpu.ops.ell import ell_gather_sum


@pytest.fixture(autouse=True)
def interpret_mode():
    bk.set_interpret(True)
    yield
    bk.set_interpret(False)


def banded_graph(rng, n, k=6):
    from cgcnet_tpu.ops.knn import radius_knn_np

    xs = np.sort(rng.uniform(0, n * 2.5, n))
    pos = np.stack([xs, rng.uniform(0, 60, n)], -1).astype(np.float32)
    return radius_knn_np(pos, 100.0, k)


class TestBlockMeta:
    def test_covers_all_edges(self, rng):
        nbr, mask = banded_graph(rng, 256)
        cols, cmask, need = bk.bsr_block_meta(nbr, mask, 6)
        assert need <= 6
        for ri in range(cols.shape[0]):
            listed = set(cols[ri][cmask[ri] > 0])
            rows = slice(ri * 128, (ri + 1) * 128)
            for ct in np.unique(nbr[rows][mask[rows] > 0] // 128):
                assert ct in listed

    def test_overflow_raises(self, rng):
        # scrambled (unsorted) nodes blow the block budget
        nbr = rng.integers(0, 512, (512, 6)).astype(np.int32)
        mask = np.ones((512, 6), np.float32)
        with pytest.raises(ValueError, match="column tiles"):
            bk.bsr_block_meta(nbr, mask, 2)


class TestKernel:
    @pytest.mark.parametrize("f", [20, 96])
    def test_matches_gather(self, rng, f):
        b, n, k = 2, 384, 6
        nbrs, ws, cs, ms = [], [], [], []
        for _ in range(b):
            nbr, mask = banded_graph(rng, n, k)
            w = mask * rng.uniform(0.5, 1.5, mask.shape).astype(np.float32)
            c, m, _ = bk.bsr_block_meta(nbr, mask, 5)
            nbrs.append(nbr); ws.append(w); cs.append(c); ms.append(m)
        nbr = jnp.asarray(np.stack(nbrs)); w = jnp.asarray(np.stack(ws))
        cols = jnp.asarray(np.stack(cs)); cmask = jnp.asarray(np.stack(ms))
        x = jnp.asarray(rng.normal(size=(b, n, f)).astype(np.float32))
        out = bk.bsr_gather_sum(nbr, w, cols, cmask, x)
        ref = ell_gather_sum(nbr, w, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


class TestModelBsrPath:
    def test_model_pallas_matches_xla(self, rng):
        import sys

        sys.path.insert(0, "/root/repo")
        from __graft_entry__ import _example_graph
        from cgcnet_tpu.config import ModelConfig
        from cgcnet_tpu.nn.model import CGCNet, cross_entropy_loss

        graph = _example_graph(batch=2, cap=256, kt=24, bsr_blocks=6)
        assert graph.blk_cols is not None
        cfg_x = ModelConfig(max_num_nodes=512, assign_ratio=0.1,
                            drop_out=0.0, use_pallas=False)
        cfg_p = ModelConfig(max_num_nodes=512, assign_ratio=0.1,
                            drop_out=0.0, use_pallas=True)
        model_x, model_p = CGCNet(cfg_x), CGCNet(cfg_p)
        v = model_x.init(jax.random.key(0), graph, train=False)
        out_x = np.asarray(model_x.apply(v, graph, train=False))
        out_p = np.asarray(model_p.apply(v, graph, train=False))
        np.testing.assert_allclose(out_p, out_x, atol=2e-5)

        def loss(params, model):
            logits, _ = model.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                graph, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.key(1)},
            )
            return cross_entropy_loss(logits, graph.y)

        g_x = jax.grad(loss)(v["params"], model_x)
        g_p = jax.grad(loss)(v["params"], model_p)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-4, rtol=2e-3
            ),
            g_x, g_p,
        )


class TestAmortized:
    """bsr_build_blocks + bsr_matmul: blocks built once, matmul-only matvecs."""

    @pytest.mark.parametrize("f", [20, 96])
    def test_build_then_matmul_matches_gather(self, rng, f):
        b, n, k = 2, 384, 6
        nbrs, ws, cs, ms = [], [], [], []
        for _ in range(b):
            nbr, mask = banded_graph(rng, n, k)
            w = mask * rng.uniform(0.5, 1.5, mask.shape).astype(np.float32)
            c, m, _ = bk.bsr_block_meta(nbr, mask, 5)
            nbrs.append(nbr); ws.append(w); cs.append(c); ms.append(m)
        nbr = jnp.asarray(np.stack(nbrs)); w = jnp.asarray(np.stack(ws))
        cols = jnp.asarray(np.stack(cs)); cmask = jnp.asarray(np.stack(ms))
        x = jnp.asarray(rng.normal(size=(b, n, f)).astype(np.float32))
        vals = bk.bsr_build_blocks(nbr, w, cols, cmask)
        assert vals.shape == (b, n // 128, 5, 128, 128)
        out = bk.bsr_matmul(vals, cols, x)
        ref = ell_gather_sum(nbr, w, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def test_streamed_variant_matches(self, rng):
        # force the large-F streamed path by shrinking the resident limit
        b, n, k, f = 1, 256, 5, 64
        nbr, mask = banded_graph(rng, n, k)
        w = mask.copy()
        c, m, _ = bk.bsr_block_meta(nbr, mask, 4)
        nbr = jnp.asarray(nbr)[None]; w = jnp.asarray(w)[None]
        cols = jnp.asarray(c)[None]; cmask = jnp.asarray(m)[None]
        x = jnp.asarray(rng.normal(size=(b, n, f)).astype(np.float32))
        vals = bk.bsr_build_blocks(nbr, w, cols, cmask)
        old = bk._RESIDENT_LIMIT
        try:
            bk._RESIDENT_LIMIT = 0
            out = bk.bsr_matmul(vals, cols, x)
        finally:
            bk._RESIDENT_LIMIT = old
        ref = ell_gather_sum(nbr, w, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def test_streamed_f_split_matches(self, rng):
        """The scoped-VMEM guard splits the streamed call along F (lane-
        aligned) when the double-buffered operand stack would exceed
        Mosaic's 16 MB limit — at f32 F=1140 M=12 the unsplit call is
        16.12 MB and fails AOT compile on the real chip (2026-08-20 f32
        patch-step backward). Values must be exactly the unsplit result:
        the split only re-reads vals per part."""
        b, n, k, f = 1, 256, 5, 256
        nbr, mask = banded_graph(rng, n, k)
        w = mask.copy()
        c, m, _ = bk.bsr_block_meta(nbr, mask, 4)
        nbr = jnp.asarray(nbr)[None]; w = jnp.asarray(w)[None]
        cols = jnp.asarray(c)[None]; cmask = jnp.asarray(m)[None]
        x = jnp.asarray(rng.normal(size=(b, n, f)).astype(np.float32))
        vals = bk.bsr_build_blocks(nbr, w, cols, cmask)
        old_res, old_budget = bk._RESIDENT_LIMIT, bk._SCOPED_VMEM_BUDGET
        try:
            bk._RESIDENT_LIMIT = 0          # force the streamed path
            unsplit = bk.bsr_matmul(vals, cols, x)
            bk._SCOPED_VMEM_BUDGET = 1      # force the F split
            split = bk.bsr_matmul(vals, cols, x)
        finally:
            bk._RESIDENT_LIMIT = old_res
            bk._SCOPED_VMEM_BUDGET = old_budget
        np.testing.assert_array_equal(np.asarray(split), np.asarray(unsplit))
        ref = ell_gather_sum(nbr, w, x)
        np.testing.assert_allclose(np.asarray(split), np.asarray(ref),
                                   atol=1e-4)

    def test_precomp_adjacency_in_model(self, rng):
        """make_stage1_adj with pallas impl must carry vals and produce the
        same matvec/quadform as the XLA factored path."""
        import sys

        sys.path.insert(0, "/root/repo")
        from __graft_entry__ import _example_graph
        from cgcnet_tpu.config import ModelConfig
        from cgcnet_tpu.nn.model import make_stage1_adj

        graph = _example_graph(batch=2, cap=256, kt=24, bsr_blocks=6)
        for norm_adj in (True, False):
            cfg_p = ModelConfig(max_num_nodes=512, norm_adj=norm_adj,
                                use_pallas=True)
            cfg_x = ModelConfig(max_num_nodes=512, norm_adj=norm_adj,
                                use_pallas=False)
            adj_p = make_stage1_adj(graph, cfg_p, jnp.float32)
            adj_x = make_stage1_adj(graph, cfg_x, jnp.float32)
            assert adj_p.vals is not None and adj_p.vals_t is not None
            x = jnp.asarray(rng.normal(size=(2, 256, 12)).astype(np.float32))
            np.testing.assert_allclose(
                np.asarray(adj_p.matvec(x)), np.asarray(adj_x.matvec(x)),
                atol=2e-5,
            )
            # backward runs the transposed blocks
            g = jnp.asarray(rng.normal(size=(2, 256, 12)).astype(np.float32))
            f_p = lambda v, a=adj_p: jnp.sum(a.matvec(v) * g)
            f_x = lambda v, a=adj_x: jnp.sum(a.matvec(v) * g)
            np.testing.assert_allclose(
                np.asarray(jax.grad(f_p)(x)), np.asarray(jax.grad(f_x)(x)),
                atol=2e-5,
            )
