"""MegaCGCNet (node-sharded whole-slide path) vs CGCNet parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cgcnet_tpu.config import ModelConfig
from cgcnet_tpu.core.graph import CellGraph
from cgcnet_tpu.nn.model import CGCNet
from cgcnet_tpu.ops.knn import radius_knn_np
from cgcnet_tpu.parallel.mega_graph import partition_graph
from cgcnet_tpu.parallel.mega_model import mega_forward, prepare_mega_inputs
from cgcnet_tpu.parallel.mesh import make_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs virtual devices"
)


def build(rng, n_real, cap, feat=18, k=6):
    # spatially sorted band of nuclei (sorted x) so contiguous partition has
    # small halo
    xs_coord = np.sort(rng.uniform(0, n_real * 3.0, n_real))
    pos = np.stack([xs_coord, rng.uniform(0, 80, n_real)], -1).astype(np.float32)
    nbr, mask = radius_knn_np(pos, 100.0, k)
    nbr_p = np.tile(np.arange(cap, dtype=np.int32)[:, None], (1, k))
    mask_p = np.zeros((cap, k), np.float32)
    nbr_p[:n_real], mask_p[:n_real] = nbr, mask
    x = np.zeros((cap, feat), np.float32)
    x[:n_real] = rng.normal(size=(n_real, feat)).astype(np.float32)
    return x, nbr_p, mask_p


@pytest.mark.parametrize(
    "norm_adj,jk,self_weight",
    [(True, True, 0.4), (False, False, 0.4), (True, False, 0.55)],
)
def test_matches_cellgraph_model(rng, norm_adj, jk, self_weight):
    n_real, cap, d = 110, 128, 4
    x, nbr, mask = build(rng, n_real, cap)
    cfg = ModelConfig(
        input_dim=18, max_num_nodes=160, assign_ratio=0.2,
        hidden_dim=8, embedding_dim=8, assign_hidden_dim=8,
        drop_out=0.0, norm_adj=norm_adj, jk=jk, use_pallas=False,
        self_weight=self_weight,
    )

    g = CellGraph(
        x=jnp.asarray(x)[None],
        nbr=jnp.asarray(nbr)[None],
        nbr_mask=jnp.asarray(mask)[None],
        n_nodes=jnp.asarray([n_real], jnp.int32),
    )
    model = CGCNet(cfg)
    variables = model.init({"params": jax.random.key(0)}, g, train=False)
    ref = np.asarray(model.apply(variables, g, train=False))[0]

    mesh = make_mesh(1, d, devices=jax.devices()[:d])
    part = partition_graph(nbr, mask, d)
    inputs = prepare_mega_inputs(x, part, mesh, n_real=n_real)
    out = np.asarray(
        jax.jit(
            lambda v: mega_forward(v, cfg, inputs, mesh, train=False)
        )(variables)
    )
    np.testing.assert_allclose(out, ref, atol=3e-5, rtol=1e-4)


def test_shard_count_invariance(rng):
    """Same slide, 2 vs 8 shards -> identical logits."""
    n_real, cap = 120, 128
    x, nbr, mask = build(rng, n_real, cap)
    cfg = ModelConfig(
        input_dim=18, max_num_nodes=160, assign_ratio=0.2,
        hidden_dim=8, embedding_dim=8, assign_hidden_dim=8,
        drop_out=0.0, use_pallas=False,
    )
    g = CellGraph(
        x=jnp.asarray(x)[None], nbr=jnp.asarray(nbr)[None],
        nbr_mask=jnp.asarray(mask)[None],
        n_nodes=jnp.asarray([n_real], jnp.int32),
    )
    variables = CGCNet(cfg).init({"params": jax.random.key(1)}, g, train=False)
    outs = []
    for d in (2, 8):
        mesh = make_mesh(1, d, devices=jax.devices()[:d])
        part = partition_graph(nbr, mask, d)
        inputs = prepare_mega_inputs(x, part, mesh, n_real=n_real)
        outs.append(
            np.asarray(
                jax.jit(
                    lambda v, m=mesh, i=inputs: mega_forward(
                        v, cfg, i, m, train=False
                    )
                )(variables)
            )
        )
    np.testing.assert_allclose(outs[0], outs[1], atol=2e-5)


def test_gradients_flow_sharded(rng):
    n_real, cap, d = 96, 128, 4
    x, nbr, mask = build(rng, n_real, cap)
    cfg = ModelConfig(
        input_dim=18, max_num_nodes=160, assign_ratio=0.2,
        hidden_dim=8, embedding_dim=8, assign_hidden_dim=8,
        drop_out=0.0, use_pallas=False,
    )
    g = CellGraph(
        x=jnp.asarray(x)[None], nbr=jnp.asarray(nbr)[None],
        nbr_mask=jnp.asarray(mask)[None],
        n_nodes=jnp.asarray([n_real], jnp.int32),
    )
    variables = CGCNet(cfg).init({"params": jax.random.key(2)}, g, train=False)
    mesh = make_mesh(1, d, devices=jax.devices()[:d])
    part = partition_graph(nbr, mask, d)
    inputs = prepare_mega_inputs(x, part, mesh, n_real=n_real)

    def loss(params):
        v = {"params": params, "batch_stats": variables["batch_stats"]}
        logits = mega_forward(v, cfg, inputs, mesh, train=True)
        return -jax.nn.log_softmax(logits)[1]

    grads = jax.jit(jax.grad(loss))(variables["params"])
    leaves = jax.tree.leaves(jax.device_get(grads))
    assert all(np.isfinite(l).all() for l in leaves)
    assert sum(float(np.abs(l).sum()) for l in leaves) > 0


def test_halo_overlap_matches_plain(rng):
    """halo_overlap=True restructures the aggregation but must be
    numerically identical to the plain exchange."""
    n_real, cap, d = 120, 128, 4
    x, nbr, mask = build(rng, n_real, cap)
    cfg = ModelConfig(
        input_dim=18, max_num_nodes=160, assign_ratio=0.2,
        hidden_dim=8, embedding_dim=8, assign_hidden_dim=8,
        drop_out=0.0, use_pallas=False,
    )
    g = CellGraph(
        x=jnp.asarray(x)[None], nbr=jnp.asarray(nbr)[None],
        nbr_mask=jnp.asarray(mask)[None],
        n_nodes=jnp.asarray([n_real], jnp.int32),
    )
    variables = CGCNet(cfg).init({"params": jax.random.key(3)}, g, train=False)
    mesh = make_mesh(1, d, devices=jax.devices()[:d])
    part = partition_graph(nbr, mask, d)
    inputs = prepare_mega_inputs(x, part, mesh, n_real=n_real)
    outs = [
        np.asarray(
            jax.jit(
                lambda v, ov=ov: mega_forward(
                    v, cfg, inputs, mesh, train=False, halo_overlap=ov
                )
            )(variables)
        )
        for ov in (False, True)
    ]
    np.testing.assert_allclose(outs[0], outs[1], atol=2e-5)


def test_slide_training_tracks_bn_stats(rng):
    from cgcnet_tpu.parallel.mega_train import train_slides

    n_real, cap, d = 96, 128, 2
    x, nbr, mask = build(rng, n_real, cap)
    cfg = ModelConfig(
        input_dim=18, max_num_nodes=160, assign_ratio=0.2,
        hidden_dim=8, embedding_dim=8, assign_hidden_dim=8,
        drop_out=0.0, use_pallas=False,
    )
    g = CellGraph(
        x=jnp.asarray(x)[None], nbr=jnp.asarray(nbr)[None],
        nbr_mask=jnp.asarray(mask)[None],
        n_nodes=jnp.asarray([n_real], jnp.int32),
    )
    variables = CGCNet(cfg).init({"params": jax.random.key(4)}, g, train=False)
    mesh = make_mesh(1, d, devices=jax.devices()[:d])
    part = partition_graph(nbr, mask, d)
    inputs = prepare_mega_inputs(x, part, mesh, n_real=n_real)
    new_vars, losses = train_slides(
        cfg, variables, [(inputs, 1)], mesh, lr=1e-3, epochs=2
    )
    assert len(losses) == 2 and all(np.isfinite(losses))
    old = variables["batch_stats"]["embed1"]["bn1"]["mean"]
    new = new_vars["batch_stats"]["embed1"]["bn1"]["mean"]
    # running stats moved toward the observed batch statistics
    assert not np.allclose(np.asarray(old), np.asarray(new))
    # every BN'd block got an update
    for blk in ("embed1", "embed2", "embed3", "pool1", "pool2"):
        assert "bn1" in new_vars["batch_stats"][blk]


def test_bsr_mega_path_matches_gather(rng):
    """mega_forward with BSR tables (Pallas interpret mode) must match the
    XLA-gather path, forward and gradient."""
    import cgcnet_tpu.ops.pallas.bsr_kernel as bk
    from cgcnet_tpu.parallel.mega_graph import build_bsr_tables

    n_real, cap, d = 200, 256, 2   # Ns = 128 per shard
    x, nbr, mask = build(rng, n_real, cap)
    cfg = ModelConfig(
        input_dim=18, max_num_nodes=320, assign_ratio=0.2,
        hidden_dim=8, embedding_dim=8, assign_hidden_dim=8,
        drop_out=0.0, use_pallas=False,
    )
    g = CellGraph(
        x=jnp.asarray(x)[None], nbr=jnp.asarray(nbr)[None],
        nbr_mask=jnp.asarray(mask)[None],
        n_nodes=jnp.asarray([n_real], jnp.int32),
    )
    variables = CGCNet(cfg).init({"params": jax.random.key(5)}, g, train=False)
    mesh = make_mesh(1, d, devices=jax.devices()[:d])
    part = partition_graph(nbr, mask, d)
    tables = build_bsr_tables(part)
    assert tables is not None and tables.nc % 128 == 0
    plain = prepare_mega_inputs(x, part, mesh, n_real=n_real)
    bsr = prepare_mega_inputs(x, part, mesh, n_real=n_real, bsr=tables)

    bk.set_interpret(True)
    try:
        out_p = np.asarray(
            jax.jit(lambda v: mega_forward(v, cfg, plain, mesh, train=False))(
                variables
            )
        )
        out_b = np.asarray(
            jax.jit(lambda v: mega_forward(v, cfg, bsr, mesh, train=False))(
                variables
            )
        )
        np.testing.assert_allclose(out_b, out_p, atol=3e-5)

        def loss(params, inp):
            v = {"params": params, "batch_stats": variables["batch_stats"]}
            return -jax.nn.log_softmax(
                mega_forward(v, cfg, inp, mesh, train=True)
            )[1]

        g_p = jax.jit(jax.grad(loss))(variables["params"], plain)
        g_b = jax.jit(jax.grad(loss))(variables["params"], bsr)
        # path-vs-path grad tolerance: BSR and gather aggregation round
        # differently (~1e-6 on activations), and the max readouts make the
        # backward DISCRETE in that noise — a near-tie winner flip reroutes
        # an O(activation)-sized grad contribution between nodes (observed:
        # 9/144 elements at 8e-3 after the round-5 2D _jk shifted rounding,
        # while same-path old-vs-new grads agree to 9e-6). The tight
        # correctness pins are the forward comparison above and the
        # same-path kernel-grad tests (tests/test_bsr.py, tests/test_ops.py);
        # this check guards against structural divergence only.
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-2, rtol=2e-2
            ),
            g_p, g_b,
        )
    finally:
        bk.set_interpret(False)


def test_gat_matches_cellgraph_model(rng):
    """Sharded GAT (halo-exchanged k/v + remapped ELL scores) must match the
    single-device CGCNet GAT branch."""
    n_real, cap, d = 110, 128, 4
    x, nbr, mask = build(rng, n_real, cap)
    cfg = ModelConfig(
        input_dim=18, max_num_nodes=160, assign_ratio=0.2,
        hidden_dim=8, embedding_dim=8, assign_hidden_dim=8,
        drop_out=0.0, gcn_name="GAT", gat_heads=2, use_pallas=False,
    )
    g = CellGraph(
        x=jnp.asarray(x)[None],
        nbr=jnp.asarray(nbr)[None],
        nbr_mask=jnp.asarray(mask)[None],
        n_nodes=jnp.asarray([n_real], jnp.int32),
    )
    model = CGCNet(cfg)
    variables = model.init({"params": jax.random.key(6)}, g, train=False)
    ref = np.asarray(model.apply(variables, g, train=False))[0]

    mesh = make_mesh(1, d, devices=jax.devices()[:d])
    part = partition_graph(nbr, mask, d)
    inputs = prepare_mega_inputs(x, part, mesh, n_real=n_real)
    out = np.asarray(
        jax.jit(
            lambda v: mega_forward(v, cfg, inputs, mesh, train=False)
        )(variables)
    )
    np.testing.assert_allclose(out, ref, atol=3e-5, rtol=1e-4)

    def loss(params):
        v = {"params": params, "batch_stats": variables["batch_stats"]}
        logits = mega_forward(v, cfg, inputs, mesh, train=True)
        return -jax.nn.log_softmax(logits)[1]

    grads = jax.jit(jax.grad(loss))(variables["params"])
    leaves = jax.tree.leaves(jax.device_get(grads))
    assert all(np.isfinite(l).all() for l in leaves)
    assert sum(float(np.abs(l).sum()) for l in leaves) > 0


def test_head_dropout_fires_in_training(rng):
    """mega_forward's prediction-head dropout: train+rng changes logits,
    rng=None and eval mode leave them untouched (parity with CGCNet's
    Dropout placement, nn/model.py:250-252)."""
    n_real, cap, d = 110, 128, 2
    x, nbr, mask = build(rng, n_real, cap)
    cfg = ModelConfig(
        input_dim=18, max_num_nodes=160, assign_ratio=0.2,
        hidden_dim=8, embedding_dim=8, assign_hidden_dim=8,
        drop_out=0.5, use_pallas=False,
    )
    g = CellGraph(
        x=jnp.asarray(x)[None],
        nbr=jnp.asarray(nbr)[None],
        nbr_mask=jnp.asarray(mask)[None],
        n_nodes=jnp.asarray([n_real], jnp.int32),
    )
    model = CGCNet(cfg)
    variables = model.init({"params": jax.random.key(0)}, g, train=False)
    mesh = make_mesh(1, d, devices=jax.devices()[:d])
    part = partition_graph(nbr, mask, d)
    inputs = prepare_mega_inputs(x, part, mesh, n_real=n_real)

    # three traces only — each shard_map compile is ~1-2 min on this host
    plain, _ = mega_forward(
        variables, cfg, inputs, mesh, train=True, return_stats=True
    )
    step = jax.jit(
        lambda key: mega_forward(
            variables, cfg, inputs, mesh, train=True, return_stats=True,
            dropout_rng=key,
        )[0]
    )
    dropped = step(jax.random.key(3))
    assert not np.allclose(np.asarray(dropped), np.asarray(plain))
    # same key -> same mask (pure function); different key -> different mask
    np.testing.assert_array_equal(
        np.asarray(dropped), np.asarray(step(jax.random.key(3)))
    )
    assert not np.allclose(
        np.asarray(dropped), np.asarray(step(jax.random.key(4)))
    )


def test_bsr_capped_tables_match_uncapped(rng):
    """Sticky-cap padded BSR tables (multi-slide streaming,
    slide_setup.SlideCaps) must be numerically identical to minimal tables:
    padded block slots carry zero values/masks and padded transpose slots
    zero weights."""
    import cgcnet_tpu.ops.pallas.bsr_kernel as bk
    from cgcnet_tpu.parallel.mega_graph import build_bsr_tables

    n_real, cap, d = 200, 256, 2
    x, nbr, mask = build(rng, n_real, cap)
    cfg = ModelConfig(
        input_dim=18, max_num_nodes=320, assign_ratio=0.2,
        hidden_dim=8, embedding_dim=8, assign_hidden_dim=8,
        drop_out=0.0, use_pallas=False,
    )
    g = CellGraph(
        x=jnp.asarray(x)[None], nbr=jnp.asarray(nbr)[None],
        nbr_mask=jnp.asarray(mask)[None],
        n_nodes=jnp.asarray([n_real], jnp.int32),
    )
    variables = CGCNet(cfg).init({"params": jax.random.key(5)}, g, train=False)
    mesh = make_mesh(1, d, devices=jax.devices()[:d])

    part_min = partition_graph(nbr, mask, d)
    t_min = build_bsr_tables(part_min)
    p_cap = -(-part_min.halo_capacity // 64) * 64
    part_cap = partition_graph(nbr, mask, d, halo_capacity=p_cap)
    t_cap = build_bsr_tables(
        part_cap,
        kt_cap=t_min.nbr_t.shape[-1] + 3,
        m_cap=min(t_min.blk_cols.shape[-1] + 2, 16),
        mt_cap=min(t_min.blk_cols_t.shape[-1] + 2, 16),
    )
    assert t_cap.blk_cols.shape[-1] > t_min.blk_cols.shape[-1]
    in_min = prepare_mega_inputs(x, part_min, mesh, n_real=n_real, bsr=t_min)
    in_cap = prepare_mega_inputs(x, part_cap, mesh, n_real=n_real, bsr=t_cap)

    bk.set_interpret(True)
    try:
        out_min = np.asarray(jax.jit(
            lambda v: mega_forward(v, cfg, in_min, mesh, train=False)
        )(variables))
        out_cap = np.asarray(jax.jit(
            lambda v: mega_forward(v, cfg, in_cap, mesh, train=False)
        )(variables))
        np.testing.assert_allclose(out_cap, out_min, atol=3e-5)
    finally:
        bk.set_interpret(False)


def test_remat_pool1_matches_plain(rng):
    """mesh.remat (jax.checkpoint of the pool-1 segment) must leave logits,
    gradients and BN stat updates bit-compatible with the stored-activation
    path — it only changes WHEN tensors are computed."""
    n_real, cap, d = 200, 256, 2
    x, nbr, mask = build(rng, n_real, cap)
    cfg = ModelConfig(
        input_dim=18, max_num_nodes=320, assign_ratio=0.2,
        hidden_dim=8, embedding_dim=8, assign_hidden_dim=8,
        drop_out=0.0, use_pallas=False,
    )
    g = CellGraph(
        x=jnp.asarray(x)[None], nbr=jnp.asarray(nbr)[None],
        nbr_mask=jnp.asarray(mask)[None],
        n_nodes=jnp.asarray([n_real], jnp.int32),
    )
    variables = CGCNet(cfg).init({"params": jax.random.key(7)}, g, train=False)
    mesh = make_mesh(1, d, devices=jax.devices()[:d])
    part = partition_graph(nbr, mask, d)
    inp = prepare_mega_inputs(x, part, mesh, n_real=n_real)

    def run(remat):
        out = jax.jit(lambda v: mega_forward(
            v, cfg, inp, mesh, train=False, remat=remat
        ))(variables)

        def loss(params):
            v = {"params": params, "batch_stats": variables["batch_stats"]}
            logits, st = mega_forward(
                v, cfg, inp, mesh, train=True, remat=remat,
                return_stats=True,
            )
            return -jax.nn.log_softmax(logits)[1], st

        (l, st), grads = jax.jit(
            jax.value_and_grad(loss, has_aux=True)
        )(variables["params"])
        return out, l, grads, st

    o0, l0, g0, s0 = run(False)
    o1, l1, g1, s1 = run(True)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o0), atol=1e-6)
    np.testing.assert_allclose(float(l1), float(l0), atol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4
        ),
        (g0, s0), (g1, s1),
    )


def test_fused_assign_tail_matches_unfused(rng):
    """The Pallas psum assign tail (mega_forward fused_tail) must match the
    unfused XLA chain: forward, gradients, and the bn3 running-stat update.
    Differences are single-pass-variance rounding only."""
    import cgcnet_tpu.ops.pallas.bsr_kernel as bk

    n_real, cap, d = 200, 256, 2   # 128 rows/shard -> fused gate tiles
    x, nbr, mask = build(rng, n_real, cap)
    g = CellGraph(
        x=jnp.asarray(x)[None], nbr=jnp.asarray(nbr)[None],
        nbr_mask=jnp.asarray(mask)[None],
        n_nodes=jnp.asarray([n_real], jnp.int32),
    )

    def cfg_with(fused):
        return ModelConfig(
            input_dim=18, max_num_nodes=320, assign_ratio=0.2,
            hidden_dim=8, embedding_dim=8, assign_hidden_dim=8,
            drop_out=0.0, use_pallas=False,
            fused_assign_softmax=fused, fused_assign_norm=fused,
        )

    variables = CGCNet(cfg_with("never")).init(
        {"params": jax.random.key(5)}, g, train=False
    )
    mesh = make_mesh(1, d, devices=jax.devices()[:d])
    part = partition_graph(nbr, mask, d)
    inp = prepare_mega_inputs(x, part, mesh, n_real=n_real)

    bk.set_interpret(True)  # assign-head kernel follows this toggle
    try:
        outs, grads, stats = {}, {}, {}
        for fused in ("never", "always"):
            cfg = cfg_with(fused)
            outs[fused] = np.asarray(
                jax.jit(
                    lambda v: mega_forward(v, cfg, inp, mesh, train=False)
                )(variables)
            )

            def loss(params):
                v = {"params": params,
                     "batch_stats": variables["batch_stats"]}
                logits, new_stats = mega_forward(
                    v, cfg, inp, mesh, train=True, return_stats=True
                )
                return -jax.nn.log_softmax(logits)[1], new_stats

            (l, st), gr = jax.jit(
                jax.value_and_grad(loss, has_aux=True)
            )(variables["params"])
            grads[fused], stats[fused] = gr, st
        np.testing.assert_allclose(outs["always"], outs["never"], atol=3e-5)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-4, rtol=2e-3
            ),
            grads["always"], grads["never"],
        )
        np.testing.assert_allclose(
            np.asarray(stats["always"]["pool1"]["bn3"]["mean"]),
            np.asarray(stats["never"]["pool1"]["bn3"]["mean"]),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(stats["always"]["pool1"]["bn3"]["var"]),
            np.asarray(stats["never"]["pool1"]["bn3"]["var"]),
            atol=1e-5, rtol=1e-5,
        )
    finally:
        bk.set_interpret(False)


def test_chunked_assign_tail_matches_plain_mega(rng):
    """cfg.assign_tail_chunk on the mega path: identical loss/grads/bn3
    stats to the unchunked psum tail (the backward differs only in f32
    chunk-accumulation order). This is the 1M-nuclei capacity path's
    correctness gate (round-3 VERDICT Next #3)."""
    import cgcnet_tpu.ops.pallas.bsr_kernel as bk

    n_real, cap, d = 420, 512, 2   # 256 rows/shard -> 2 chunks of 128
    x, nbr, mask = build(rng, n_real, cap)
    g = CellGraph(
        x=jnp.asarray(x)[None], nbr=jnp.asarray(nbr)[None],
        nbr_mask=jnp.asarray(mask)[None],
        n_nodes=jnp.asarray([n_real], jnp.int32),
    )

    def cfg_with(chunk, fused="always"):
        return ModelConfig(
            input_dim=18, max_num_nodes=640, assign_ratio=0.2,
            hidden_dim=8, embedding_dim=8, assign_hidden_dim=8,
            drop_out=0.0, use_pallas=False,
            fused_assign_softmax=fused, fused_assign_norm=fused,
            assign_tail_chunk=chunk,
        )

    # init with the unfused config (same param tree; avoids compiling the
    # Pallas head before the interpret toggle below)
    variables = CGCNet(cfg_with(0, fused="never")).init(
        {"params": jax.random.key(5)}, g, train=False
    )
    mesh = make_mesh(1, d, devices=jax.devices()[:d])
    part = partition_graph(nbr, mask, d)
    inp = prepare_mega_inputs(x, part, mesh, n_real=n_real)

    bk.set_interpret(True)
    try:
        grads, stats, losses = {}, {}, {}
        for chunk in (0, 128):
            cfg = cfg_with(chunk)

            def loss(params):
                v = {"params": params,
                     "batch_stats": variables["batch_stats"]}
                logits, new_stats = mega_forward(
                    v, cfg, inp, mesh, train=True, return_stats=True
                )
                return -jax.nn.log_softmax(logits)[1], new_stats

            (l, st), gr = jax.jit(
                jax.value_and_grad(loss, has_aux=True)
            )(variables["params"])
            grads[chunk], stats[chunk], losses[chunk] = gr, st, float(l)
        np.testing.assert_allclose(losses[128], losses[0], atol=1e-6)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4
            ),
            grads[128], grads[0],
        )
        np.testing.assert_allclose(
            np.asarray(stats[128]["pool1"]["bn3"]["var"]),
            np.asarray(stats[0]["pool1"]["bn3"]["var"]),
            atol=1e-6, rtol=1e-6,
        )
    finally:
        bk.set_interpret(False)


def test_remat_stage1_grads_match(rng):
    """mesh remat_stage1 (checkpointed paired stage-1 segment) must be
    numerically invisible: identical loss/grads/stats to the stored-
    activation path (jax.checkpoint recomputes the same ops)."""
    import cgcnet_tpu.ops.pallas.bsr_kernel as bk

    n_real, cap, d = 420, 512, 2
    x, nbr, mask = build(rng, n_real, cap)
    cfg = ModelConfig(
        input_dim=18, max_num_nodes=640, assign_ratio=0.2,
        hidden_dim=8, embedding_dim=8, assign_hidden_dim=8,
        drop_out=0.0, use_pallas=False,
        fused_assign_softmax="always", fused_assign_norm="always",
    )
    g = CellGraph(
        x=jnp.asarray(x)[None], nbr=jnp.asarray(nbr)[None],
        nbr_mask=jnp.asarray(mask)[None],
        n_nodes=jnp.asarray([n_real], jnp.int32),
    )
    variables = CGCNet(
        ModelConfig(**{**cfg.__dict__, "fused_assign_softmax": "never",
                       "fused_assign_norm": "never"})
    ).init({"params": jax.random.key(5)}, g, train=False)
    mesh = make_mesh(1, d, devices=jax.devices()[:d])
    part = partition_graph(nbr, mask, d)
    inp = prepare_mega_inputs(x, part, mesh, n_real=n_real)

    bk.set_interpret(True)
    try:
        out = {}
        for r1 in (False, True):
            def loss(params):
                v = {"params": params,
                     "batch_stats": variables["batch_stats"]}
                logits, st = mega_forward(
                    v, cfg, inp, mesh, train=True, remat_stage1=r1,
                    return_stats=True,
                )
                return -jax.nn.log_softmax(logits)[1], st

            (l, st), gr = jax.jit(
                jax.value_and_grad(loss, has_aux=True)
            )(variables["params"])
            out[r1] = (float(l), gr, st)
        np.testing.assert_allclose(out[True][0], out[False][0], atol=0)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-6
            ),
            out[True][1], out[False][1],
        )
    finally:
        bk.set_interpret(False)
