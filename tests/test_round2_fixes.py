"""Round-2 correctness fixes: gexf level slicing, knn tie-breaks, eval
voting semantics, binary factored self-loop contract."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cgcnet_tpu.config import ModelConfig
from cgcnet_tpu.core.graph import CellGraph


# ---------------------------------------------------------------------------
# gexf: deeper-level assignment matrices must not be sliced to n_nodes
# ---------------------------------------------------------------------------

def test_gexf_deeper_levels_not_sliced(tmp_path, rng):
    n, cap, c1, c2 = 3, 6, 4, 3
    coords = rng.uniform(0, 10, (cap, 2)).astype(np.float32)
    nbr = np.tile(np.arange(cap, dtype=np.int32)[:, None], (1, 2))
    mask = np.zeros((cap, 2), np.float32)
    # level-1 is per-node [cap, c1]; force node 0 into the LAST cluster so a
    # truncated level-2 matrix would be indexed out of bounds
    a1 = np.zeros((cap, c1), np.float32)
    a1[0, c1 - 1] = 1.0
    a1[1, 0] = 1.0
    a1[2, 1] = 1.0
    # level-2 is a [c1, c2] cluster matrix (c1 > n) — slicing it to n rows
    # used to raise IndexError here
    a2 = rng.uniform(size=(c1, c2)).astype(np.float32)

    from cgcnet_tpu.utils.gexf import assignments_to_gexf

    out = tmp_path / "g.gexf"
    assignments_to_gexf(coords, nbr, mask, [a1, a2], out, n_nodes=n)
    assert out.exists()

    import networkx as nx

    g = nx.read_gexf(str(out))
    assert g.nodes["0"]["assign_1"] == c1 - 1
    assert g.nodes["0"]["assign_2"] == int(np.argmax(a2, axis=1)[c1 - 1])


# ---------------------------------------------------------------------------
# radius_knn_jnp: exact tie-breaking vs the NumPy builder at n >= 4096
# ---------------------------------------------------------------------------

def test_radius_knn_jnp_ties_match_np_large():
    from cgcnet_tpu.ops.knn import radius_knn_jnp, radius_knn_np

    # integer grid -> masses of exactly-equal distances; tie-break must be
    # by index, bit-for-bit identical to the NumPy lexsort
    side = 64
    xs, ys = np.meshgrid(np.arange(side), np.arange(side))
    pos = np.stack([xs.ravel() * 10.0, ys.ravel() * 10.0], -1).astype(np.float32)
    n = pos.shape[0]
    assert n == 4096
    nbr_np, mask_np = radius_knn_np(pos, 25.0, 8)
    nbr_j, mask_j = jax.jit(
        lambda p: radius_knn_jnp(p, jnp.int32(n), 25.0, 8)
    )(jnp.asarray(pos))
    np.testing.assert_array_equal(np.asarray(mask_j), mask_np)
    np.testing.assert_array_equal(np.asarray(nbr_j), nbr_np)


def test_radius_knn_jnp_ties_random(rng):
    from cgcnet_tpu.ops.knn import radius_knn_jnp, radius_knn_np

    # random but quantized coordinates (ties common), with padding rows
    pos = rng.integers(0, 40, (700, 2)).astype(np.float32) * 7.0
    padded = np.zeros((768, 2), np.float32)
    padded[:700] = pos
    nbr_np, mask_np = radius_knn_np(pos, 50.0, 6)
    nbr_j, mask_j = jax.jit(
        lambda p: radius_knn_jnp(p, jnp.int32(700), 50.0, 6)
    )(jnp.asarray(padded))
    np.testing.assert_array_equal(np.asarray(mask_j)[:700], mask_np)
    np.testing.assert_array_equal(np.asarray(nbr_j)[:700], nbr_np)


def test_radius_knn_self_first_with_coincident_points(rng):
    """k+ points at identical coordinates must not displace the self edge
    from slot 0 (the BSR path folds the self weight into that slot) — in
    the NumPy builder, the jnp builder, AND the native C++ builder."""
    from cgcnet_tpu.dataflow import native
    from cgcnet_tpu.ops.knn import radius_knn_jnp, radius_knn_np

    k = 4
    # 8 coincident points + a few scattered ones
    pos = np.concatenate(
        [np.full((8, 2), 50.0, np.float32),
         rng.uniform(0, 100, (8, 2)).astype(np.float32)]
    )
    n = len(pos)
    nbr_np, mask_np = radius_knn_np(pos, 30.0, k)
    assert (nbr_np[:, 0] == np.arange(n)).all()   # self in slot 0, every row
    assert (mask_np[:, 0] == 1.0).all()

    nbr_j, mask_j = jax.jit(
        lambda p: radius_knn_jnp(p, jnp.int32(n), 30.0, k)
    )(jnp.asarray(pos))
    np.testing.assert_array_equal(np.asarray(nbr_j), nbr_np)
    np.testing.assert_array_equal(np.asarray(mask_j), mask_np)

    if native.available():
        nbr_c, mask_c = native.radius_knn(pos, 30.0, k)
        np.testing.assert_array_equal(nbr_c, nbr_np)
        np.testing.assert_array_equal(mask_c, mask_np)


# ---------------------------------------------------------------------------
# evaluate(): per-repeat image voting (reference train.py:32-57) vs
# mean-logits voting, against a scripted oracle
# ---------------------------------------------------------------------------

class _StubDataset:
    names = ["img1_grade_2_0"]


class _StubLoader:
    """One patch, logits encoded in x[:, 0, :3]; rep 0 shouts class 0,
    reps 1-2 quietly prefer class 1. Per-repeat majority -> class 1;
    mean logits -> class 0."""

    dataset = _StubDataset()

    def __init__(self):
        self.rep_logits = [
            np.array([[9.0, 0.0, 0.0]], np.float32),
            np.array([[0.0, 1.0, 0.0]], np.float32),
            np.array([[0.0, 1.0, 0.0]], np.float32),
        ]

    def epoch(self, rep):
        logits = self.rep_logits[rep]
        x = np.zeros((1, 4, 3), np.float32)
        x[:, 0, :] = logits
        yield CellGraph(
            x=jnp.asarray(x),
            nbr=jnp.zeros((1, 4, 2), jnp.int32),
            nbr_mask=jnp.zeros((1, 4, 2), jnp.float32),
            n_nodes=jnp.asarray([4], jnp.int32),
            y=jnp.asarray([1], jnp.int32),
            patch_idx=jnp.asarray([0], jnp.int32),
        )


def _stub_eval_step(state, graph):
    return graph.x[:, 0, :3]


@pytest.mark.parametrize("per_repeat,expected_img_acc", [(True, 1.0), (False, 0.0)])
def test_evaluate_vote_semantics(per_repeat, expected_img_acc):
    from cgcnet_tpu.train.loop import evaluate

    out = evaluate(
        None, None, _StubLoader(),
        test_time=3,
        eval_step=_stub_eval_step,
        vote_per_repeat=per_repeat,
    )
    # ground truth is class 1; per-repeat majority vote predicts 1 (2 of 3
    # repeats), mean logits predict 0
    assert out["img_acc"] == expected_img_acc
    # patch accuracy always uses mean logits -> argmax 0 != 1
    assert out["patch_acc"] == 0.0


def test_evaluate_max_num_examples():
    from cgcnet_tpu.train.loop import evaluate

    class _TwoBatchLoader(_StubLoader):
        dataset = type("D", (), {"names": ["a_grade_1_0", "b_grade_1_0"]})()

        def epoch(self, rep):
            for pidx in range(2):
                x = np.zeros((1, 4, 3), np.float32)
                x[:, 0, 1] = 5.0
                yield CellGraph(
                    x=jnp.asarray(x),
                    nbr=jnp.zeros((1, 4, 2), jnp.int32),
                    nbr_mask=jnp.zeros((1, 4, 2), jnp.float32),
                    n_nodes=jnp.asarray([4], jnp.int32),
                    y=jnp.asarray([1], jnp.int32),
                    patch_idx=jnp.asarray([pidx], jnp.int32),
                )

    out = evaluate(
        None, None, _TwoBatchLoader(),
        test_time=1,
        eval_step=_stub_eval_step,
        max_num_examples=1,
    )
    # truncated after the first batch: only patch 0 seen
    assert out["img_acc"] == 1.0


# ---------------------------------------------------------------------------
# binary (norm_adj=False) factored path: no phantom self-loops
# ---------------------------------------------------------------------------

def test_binary_factored_no_phantom_self_loop(rng):
    """A hand-built graph WITHOUT self-edges must produce the same stage-1
    aggregation whether or not transpose tables are present."""
    from cgcnet_tpu.core.convert import transpose_ell_np
    from cgcnet_tpu.nn.model import make_stage1_adj

    cap, k = 16, 3
    # ring graph, no self loops
    nbr = np.zeros((cap, k), np.int32)
    mask = np.zeros((cap, k), np.float32)
    for i in range(cap):
        nbr[i, 0] = (i + 1) % cap
        nbr[i, 1] = (i - 1) % cap
        nbr[i, 2] = i          # padding slot: self index, mask 0
        mask[i, :2] = 1.0
    x = rng.normal(size=(1, cap, 5)).astype(np.float32)
    cfg = ModelConfig(norm_adj=False, use_pallas=False)

    g_plain = CellGraph(
        x=jnp.asarray(x), nbr=jnp.asarray(nbr)[None],
        nbr_mask=jnp.asarray(mask)[None],
        n_nodes=jnp.asarray([cap], jnp.int32),
    )
    nt, mt, _ = transpose_ell_np(nbr, mask, 8)
    g_fact = g_plain.replace(
        nbr_t=jnp.asarray(nt)[None], nbr_t_mask=jnp.asarray(mt)[None]
    )

    out_plain = np.asarray(
        make_stage1_adj(g_plain, cfg, jnp.float32).matvec(jnp.asarray(x))
    )
    out_fact = np.asarray(
        make_stage1_adj(g_fact, cfg, jnp.float32).matvec(jnp.asarray(x))
    )
    np.testing.assert_allclose(out_fact, out_plain, atol=1e-6)
    # and the rowsums (SAGE mean denominators) agree too
    rs_p = np.asarray(make_stage1_adj(g_plain, cfg, jnp.float32).rowsum())
    rs_f = np.asarray(make_stage1_adj(g_fact, cfg, jnp.float32).rowsum())
    np.testing.assert_allclose(rs_f, rs_p, atol=1e-6)


# ---------------------------------------------------------------------------
# full-graph test dataset mode (reference NucleiDatasetTest, data.py:281-316)
# ---------------------------------------------------------------------------

def test_full_test_graph_mode(tmp_path):
    from cgcnet_tpu.config import DataConfig
    from cgcnet_tpu.dataflow.dataset import NucleiGraphDataset
    from cgcnet_tpu.dataflow.loader import GraphLoader
    from cgcnet_tpu.dataflow.proto import load_proto
    from cgcnet_tpu.dataflow.synthetic import generate_dataset

    generate_dataset(
        str(tmp_path), patches_per_image=2, images_per_grade=1,
        n_nodes=(120, 200), seed=3,
    )
    cfg = DataConfig(
        root=str(tmp_path), max_num_nodes=200, sample_ratio=0.5,
        num_workers=1, full_test_graph=True,
    )
    sampled = NucleiGraphDataset(cfg, "valid")
    full = NucleiGraphDataset(cfg, "valid", full_graph=True)
    # full-graph capacity covers the unsampled maximum
    assert full.capacity == 256 and sampled.capacity == 128
    for idx in range(len(full)):
        proto = load_proto(cfg.root, full.names[idx], cfg.dataset)
        s_full = full.get(idx, epoch=0)
        s_sub = sampled.get(idx, epoch=0)
        assert s_full.n_nodes == proto.num_nodes          # untouched
        assert s_sub.n_nodes <= proto.num_nodes // 2 + 1  # subsampled
    loader = GraphLoader(full, 1, shuffle=False, num_workers=1)
    g = next(iter(loader.epoch(0)))
    assert g.batch_size == 1 and g.capacity == 256
