"""Fused assign-head kernel (ops/pallas/assign_head) vs jnp oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import cgcnet_tpu.ops.pallas.assign_head as ah


def oracle(x12, h3a, k12, k3f, const, mask):
    """The unfused op order: folded-lin logits -> mask -> f32 softmax -> mask
    (GNNBlock.finish_folded + nn.blocks.diff_pool)."""
    dt = h3a.dtype
    logits = x12 @ k12.astype(dt) + h3a @ k3f.astype(dt) + const.astype(dt)
    logits = logits * mask[..., None].astype(dt)
    s = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(dt)
    s = s * mask[..., None].astype(dt)
    return s, jnp.swapaxes(s, 1, 2)


@pytest.fixture(autouse=True)
def _interp():
    ah.set_interpret(True)
    yield
    ah.set_interpret(False)


def make_inputs(rng, b=2, n=256, c=36, f12=8):
    x12 = jnp.asarray(rng.normal(size=(b, n, f12)).astype(np.float32))
    h3a = jnp.asarray(
        np.abs(rng.normal(size=(b, n, c))).astype(np.float32)
    )
    k12 = jnp.asarray(rng.normal(size=(f12, c)).astype(np.float32))
    k3f = jnp.asarray(rng.normal(size=(c, c)).astype(np.float32) * 0.2)
    const = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    mask = np.zeros((b, n), np.float32)
    for bi, nn in enumerate(rng.integers(n // 2, n, size=b)):
        mask[bi, :nn] = 1.0
    mask = jnp.asarray(mask)
    # masked inputs, like the conv outputs the model feeds in
    x12 = x12 * mask[..., None]
    h3a = h3a * mask[..., None]
    return x12, h3a, k12, k3f, const, mask


def test_forward_matches_oracle(rng):
    args = make_inputs(rng)
    s, s_t = ah.assign_head_softmax(*args)
    so, sto = oracle(*args)
    np.testing.assert_allclose(np.asarray(s), np.asarray(so), atol=2e-6)
    np.testing.assert_allclose(np.asarray(s_t), np.asarray(sto), atol=2e-6)
    # transposed output really is the transpose
    np.testing.assert_array_equal(
        np.asarray(s_t), np.asarray(jnp.swapaxes(s, 1, 2))
    )


def test_grads_match_oracle(rng):
    args = make_inputs(rng)
    w1 = jnp.asarray(rng.normal(size=args[1].shape[:2] + (36,)).astype(np.float32))
    w2 = jnp.swapaxes(w1, 1, 2) * 0.3

    def loss_fused(x12, h3a, k12, k3f, const, mask):
        s, s_t = ah.assign_head_softmax(x12, h3a, k12, k3f, const, mask)
        return jnp.sum(s * w1) + jnp.sum(s_t * w2 * w2)

    def loss_oracle(x12, h3a, k12, k3f, const, mask):
        s, s_t = oracle(x12, h3a, k12, k3f, const, mask)
        return jnp.sum(s * w1) + jnp.sum(s_t * w2 * w2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(*args)
    go = jax.grad(loss_oracle, argnums=(0, 1, 2, 3, 4))(*args)
    for a, b in zip(gf, go):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4
        )


def _l2relu(p, mask):
    """Oracle for the fused normalize+relu chain: the unfused conv3 tail
    (SAGEConv normalize -> mask -> relu)."""
    norm = jnp.linalg.norm(p, axis=-1, keepdims=True)
    out = p / jnp.maximum(norm, 1e-12)
    out = out * mask[..., None]
    return jax.nn.relu(out)


def make_pre_inputs(rng, b=2, n=256, c=36, f12=8):
    x12 = jnp.asarray(rng.normal(size=(b, n, f12)).astype(np.float32))
    p = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    k12 = jnp.asarray(rng.normal(size=(f12, c)).astype(np.float32))
    k3f = jnp.asarray(rng.normal(size=(c, c)).astype(np.float32) * 0.2)
    const = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    mask = np.zeros((b, n), np.float32)
    for bi, nn in enumerate(rng.integers(n // 2, n, size=b)):
        mask[bi, :nn] = 1.0
    mask = jnp.asarray(mask)
    x12 = x12 * mask[..., None]
    return x12, p, k12, k3f, const, mask


def test_stats_kernel_matches_oracle(rng):
    _, p, _, _, _, mask = make_pre_inputs(rng)

    def oracle_sums(p, mask):
        h = _l2relu(p, mask)
        return jnp.sum(h, axis=(0, 1)), jnp.sum(h * h, axis=(0, 1))

    ssum, ssq = ah.l2relu_stats(p, mask)
    osum, osq = oracle_sums(p, mask)
    np.testing.assert_allclose(np.asarray(ssum), np.asarray(osum), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ssq), np.asarray(osq), atol=1e-4)

    u = jnp.asarray(rng.normal(size=(36,)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(36,)).astype(np.float32))

    def loss_f(fn):
        def loss(p):
            a, b = fn(p, mask)
            return jnp.sum(a * u) + jnp.sum(b * w)
        return loss

    gf = jax.grad(loss_f(ah.l2relu_stats))(p)
    go = jax.grad(loss_f(oracle_sums))(p)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(go),
                               atol=5e-5, rtol=1e-4)


def test_pre_forward_and_grads_match_oracle(rng):
    args = make_pre_inputs(rng)

    def oracle_pre(x12, p, k12, k3f, const, mask):
        return oracle(x12, _l2relu(p, mask), k12, k3f, const, mask)

    s, s_t = ah.assign_head_softmax_pre(*args)
    so, sto = oracle_pre(*args)
    np.testing.assert_allclose(np.asarray(s), np.asarray(so), atol=2e-6)
    np.testing.assert_allclose(np.asarray(s_t), np.asarray(sto), atol=2e-6)

    w1 = jnp.asarray(
        rng.normal(size=args[1].shape[:2] + (36,)).astype(np.float32)
    )
    w2 = jnp.swapaxes(w1, 1, 2) * 0.3

    def mkloss(fn):
        def loss(x12, p, k12, k3f, const, mask):
            s, s_t = fn(x12, p, k12, k3f, const, mask)
            return jnp.sum(s * w1) + jnp.sum(s_t * w2 * w2)
        return loss

    gf = jax.grad(mkloss(ah.assign_head_softmax_pre), argnums=(0, 1, 2, 3, 4))(*args)
    go = jax.grad(mkloss(oracle_pre), argnums=(0, 1, 2, 3, 4))(*args)
    for a, b in zip(gf, go):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4
        )


def test_model_fused_norm_matches_unfused(rng):
    """CGCNet with fused_assign_norm='always' (interpret) must match the
    plain folded path: logits, grads, batch stats (single-pass variance
    tolerance)."""
    import dataclasses

    from cgcnet_tpu.config import ModelConfig
    from cgcnet_tpu.nn.model import CGCNet, cross_entropy_loss
    from tests.test_model import build_graph

    g = build_graph(np.random.default_rng(5), batch=2, cap=256, n_lo=100)
    base = ModelConfig(max_num_nodes=640, assign_ratio=0.2, use_pallas=False)
    m_on = CGCNet(dataclasses.replace(
        base, fused_assign_softmax="always", fused_assign_norm="always"
    ))
    m_off = CGCNet(dataclasses.replace(
        base, fused_assign_softmax="never", fused_assign_norm="never"
    ))
    v = m_off.init(jax.random.key(0), g, train=False)
    np.testing.assert_allclose(
        np.asarray(m_on.apply(v, g, train=False)),
        np.asarray(m_off.apply(v, g, train=False)),
        atol=2e-5,
    )

    def loss(params, model):
        out, mut = model.apply(
            {**v, "params": params}, g, train=True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(1)},
        )
        return cross_entropy_loss(out, g.y), mut["batch_stats"]

    (l_on, bs_on), g_on = jax.value_and_grad(loss, has_aux=True)(
        v["params"], m_on
    )
    (l_off, bs_off), g_off = jax.value_and_grad(loss, has_aux=True)(
        v["params"], m_off
    )
    np.testing.assert_allclose(float(l_on), float(l_off), atol=2e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4
        ),
        bs_on, bs_off,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=6e-4
        ),
        g_on, g_off,
    )


def test_model_fused_softmax_matches_unfused(rng):
    """CGCNet with fused_assign_softmax='always' (interpret) must match the
    unfused folded path: logits, grads, batch stats.

    Grad-bound error model (diagnosed round 4, scripts/diag_fused_grad.py):
    the two paths are algebraically identical but reassociate f32 reductions
    differently, so their disagreement is bounded by each path's own roundoff
    vs an f64 oracle — measured at up to 2.1e-3 abs on the worst leaf
    (embed2.gcn1.lin.bias, |grad| ~ 16, rel 5.6e-5). The drift is backend-
    partitioning-dependent (4.5e-5 on 1 CPU device vs 8.9e-4 on the conftest
    8-device build of the SAME program), i.e. pure summation-order noise, not
    a fused-backward defect: vs the f64 oracle the fused path sits at 2.1e-3
    and the unfused at 1.3e-3 — the same order, neither systematically off.
    Hence the grad check is rtol=2e-4 (covers the measured rel 5.6e-5 with
    3.5x margin) + atol=5e-4 for near-zero leaves; a pure atol tighter than
    f32 roundoff at |grad|~16 was demanding better-than-roundoff agreement.
    """
    import dataclasses

    from cgcnet_tpu.config import ModelConfig
    from cgcnet_tpu.nn.model import CGCNet, cross_entropy_loss
    from tests.test_model import build_graph

    g = build_graph(np.random.default_rng(3), batch=2, cap=256, n_lo=100)
    base = ModelConfig(max_num_nodes=640, assign_ratio=0.2, use_pallas=False)
    m_on = CGCNet(dataclasses.replace(base, fused_assign_softmax="always"))
    m_off = CGCNet(dataclasses.replace(base, fused_assign_softmax="never"))
    v = m_off.init(jax.random.key(0), g, train=False)
    np.testing.assert_allclose(
        np.asarray(m_on.apply(v, g, train=False)),
        np.asarray(m_off.apply(v, g, train=False)),
        atol=2e-5,
    )

    def loss(params, model):
        out, mut = model.apply(
            {**v, "params": params}, g, train=True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(1)},
        )
        return cross_entropy_loss(out, g.y), mut["batch_stats"]

    (l_on, bs_on), g_on = jax.value_and_grad(loss, has_aux=True)(
        v["params"], m_on
    )
    (l_off, bs_off), g_off = jax.value_and_grad(loss, has_aux=True)(
        v["params"], m_off
    )
    np.testing.assert_allclose(float(l_on), float(l_off), atol=2e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4
        ),
        bs_on, bs_off,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=5e-4
        ),
        g_on, g_off,
    )


def test_never_actually_disables_fusion(rng):
    """'never' is a string — bool("never") is True, so the tri-state must be
    decoded explicitly: with fused_assign_softmax='never' the model must run
    the UNFUSED tail (here: on CPU without interpret mode, where the fused
    Pallas kernel cannot even compile on a 128-multiple capacity)."""
    from cgcnet_tpu.config import ModelConfig
    from cgcnet_tpu.nn.model import CGCNet
    from tests.test_model import build_graph

    g = build_graph(rng, batch=1, cap=128, n_lo=40, n_hi=100)
    cfg = ModelConfig(
        max_num_nodes=256, use_pallas=False,
        fused_assign_softmax="never", fused_assign_norm="never",
    )
    model = CGCNet(cfg)
    v = model.init(jax.random.key(0), g, train=False)
    out = np.asarray(model.apply(v, g, train=False))
    assert np.isfinite(out).all()


def test_fusion_requires_bn(rng):
    """model.bn=false must fall back to the unfused tail (folds_tail needs
    BN), not trip paired_blocks' assert at trace time."""
    import cgcnet_tpu.ops.pallas.assign_head as _ah
    import cgcnet_tpu.ops.pallas.bsr_kernel as _bsr
    from cgcnet_tpu.config import ModelConfig
    from cgcnet_tpu.nn.model import CGCNet
    from tests.test_model import build_graph

    g = build_graph(rng, batch=1, cap=128, n_lo=40, n_hi=100)
    cfg = ModelConfig(
        max_num_nodes=256, use_pallas=False, bn=False,
        fused_assign_softmax="always",
    )
    model = CGCNet(cfg)
    v = model.init(jax.random.key(0), g, train=False)
    out = np.asarray(model.apply(v, g, train=False))
    assert np.isfinite(out).all()


def test_psum_tail_matches_single_device(rng):
    """assign_tail_train_psum under a 2-shard shard_map == single-device
    assign_tail_train on the concatenated rows: forward (S, mean, var) AND
    gradients — dp needs the GLOBAL stats cotangents while the replicated
    kernel grads must stay local contributions (shard_map psums them)."""
    import numpy as np
    from jax.sharding import Mesh, PartitionSpec as P

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    b, n, c, f12 = 1, 256, 36, 8
    x12 = jnp.asarray(rng.normal(size=(b, n, f12)).astype(np.float32))
    p = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    k12 = jnp.asarray(rng.normal(size=(f12, c)).astype(np.float32))
    k3 = jnp.asarray(rng.normal(size=(c, c)).astype(np.float32) * 0.2)
    lb = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    sc = jnp.ones((c,), jnp.float32)
    bi = jnp.zeros((c,), jnp.float32)
    mask = jnp.ones((b, n), jnp.float32)
    mesh = Mesh(np.array(jax.devices()[:2]), ("graph",))

    def sharded(x12v, pv, k3v):
        def run(x12s, ps, masks, k3s):
            n_glob = jax.lax.psum(jnp.sum(masks), "graph")
            return ah.assign_tail_train_psum(
                x12s, ps, k12, k3s, lb, sc, bi, masks, n_glob, 1e-5, "graph"
            )

        return jax.shard_map(
            run, mesh=mesh,
            in_specs=(P(None, "graph"), P(None, "graph"),
                      P(None, "graph"), P()),
            out_specs=(P(None, "graph"), P(None, None, "graph"), P(), P()),
            check_vma=False,
        )(x12v, pv, mask, k3v)

    s_sh, _, mean_sh, var_sh = sharded(x12, p, k3)
    s0, _, mean0, var0 = ah.assign_tail_train(
        x12, p, k12, k3, lb, sc, bi, mask, jnp.float32(b * n), 1e-5
    )
    np.testing.assert_allclose(np.asarray(s_sh), np.asarray(s0), atol=2e-5)
    np.testing.assert_allclose(np.asarray(mean_sh), np.asarray(mean0),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(var_sh), np.asarray(var0),
                               atol=1e-5)

    loss_sh = lambda pv, kv: jnp.sum(
        sharded(x12, pv, kv)[0].astype(jnp.float32) ** 2
    )
    loss_0 = lambda pv, kv: jnp.sum(
        ah.assign_tail_train(
            x12, pv, k12, kv, lb, sc, bi, mask, jnp.float32(b * n), 1e-5
        )[0].astype(jnp.float32) ** 2
    )
    gp, gk = jax.grad(loss_sh, argnums=(0, 1))(p, k3)
    gp0, gk0 = jax.grad(loss_0, argnums=(0, 1))(p, k3)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gp0),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk0),
                               atol=1e-3, rtol=1e-3)


def test_chunked_tail_matches_unchunked(rng):
    """assign_tail_train_chunked == assign_tail_train: forward outputs are
    bit-comparable (same kernels) and all nine gradients agree up to the f32
    chunk-reassociation of the [C]-class accumulators. Single device
    (axis=None) — the capacity contract of round-3 VERDICT Next #3."""
    b, n, c, f12, ch = 1, 512, 36, 8, 128
    x12 = jnp.asarray(rng.normal(size=(b, n, f12)).astype(np.float32))
    p = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    k12 = jnp.asarray(rng.normal(size=(f12, c)).astype(np.float32))
    k3 = jnp.asarray(rng.normal(size=(c, c)).astype(np.float32) * 0.2)
    lb = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    sc = jnp.ones((c,), jnp.float32)
    bi = jnp.zeros((c,), jnp.float32)
    mask = np.ones((b, n), np.float32)
    mask[0, 400:] = 0.0
    mask = jnp.asarray(mask)
    nn = jnp.float32(400)

    ref = ah.assign_tail_train(x12, p, k12, k3, lb, sc, bi, mask, nn, 1e-5)
    chk = ah.assign_tail_train_chunked(
        x12, p, k12, k3, lb, sc, bi, mask, nn, 1e-5, None, ch
    )
    for a, b_ in zip(ref, chk):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-6)

    # non-dividing chunk: 512 = 1 full 384-chunk + one 128-row remainder
    g384 = jax.grad(
        lambda pv: jnp.sum(ah.assign_tail_train_chunked(
            x12, pv, k12, k3, lb, sc, bi, mask, nn, 1e-5, None, 384
        )[0].astype(jnp.float32) ** 2)
    )(p)
    g0 = jax.grad(
        lambda pv: jnp.sum(ah.assign_tail_train(
            x12, pv, k12, k3, lb, sc, bi, mask, nn, 1e-5
        )[0].astype(jnp.float32) ** 2)
    )(p)
    np.testing.assert_allclose(np.asarray(g384), np.asarray(g0),
                               atol=5e-5, rtol=1e-4)

    def loss(fn, extra):
        def run(x12v, pv, k3v, lbv, scv, biv):
            s, s_t, mean, var = fn(
                x12v, pv, k12, k3v, lbv, scv, biv, mask, nn, 1e-5, *extra
            )
            # touch every output so all cotangent paths are exercised
            return (
                jnp.sum(s.astype(jnp.float32) ** 2)
                + jnp.sum(s_t.astype(jnp.float32) * 0.1)
                + jnp.sum(mean * var)
            )
        return run

    args = (x12, p, k3, lb, sc, bi)
    g_ref = jax.grad(loss(ah.assign_tail_train, ()), argnums=tuple(range(6)))(
        *args
    )
    g_chk = jax.grad(
        loss(ah.assign_tail_train_chunked, (None, ch)),
        argnums=tuple(range(6)),
    )(*args)
    for gr, gc in zip(g_ref, g_chk):
        np.testing.assert_allclose(
            np.asarray(gr), np.asarray(gc), atol=5e-5, rtol=1e-4
        )


def test_chunked_tail_psum_matches_single_device(rng):
    """Chunked variant under a 2-shard shard_map (chunk < shard rows) ==
    single-device unchunked tail on the concatenated rows — the >500k-sharded
    deployment configuration's correctness artifact."""
    from jax.sharding import Mesh, PartitionSpec as P

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    b, n, c, f12, ch = 1, 512, 36, 8, 128
    x12 = jnp.asarray(rng.normal(size=(b, n, f12)).astype(np.float32))
    p = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    k12 = jnp.asarray(rng.normal(size=(f12, c)).astype(np.float32))
    k3 = jnp.asarray(rng.normal(size=(c, c)).astype(np.float32) * 0.2)
    lb = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    sc = jnp.ones((c,), jnp.float32)
    bi = jnp.zeros((c,), jnp.float32)
    mask = jnp.ones((b, n), jnp.float32)
    mesh = Mesh(np.array(jax.devices()[:2]), ("graph",))

    def sharded(x12v, pv, k3v):
        def run(x12s, ps, masks, k3s):
            n_glob = jax.lax.psum(jnp.sum(masks), "graph")
            return ah.assign_tail_train_chunked(
                x12s, ps, k12, k3s, lb, sc, bi, masks, n_glob, 1e-5,
                "graph", ch,
            )

        return jax.shard_map(
            run, mesh=mesh,
            in_specs=(P(None, "graph"), P(None, "graph"),
                      P(None, "graph"), P()),
            out_specs=(P(None, "graph"), P(None, None, "graph"), P(), P()),
            check_vma=False,
        )(x12v, pv, mask, k3v)

    s_sh, _, mean_sh, var_sh = sharded(x12, p, k3)
    s0, _, mean0, var0 = ah.assign_tail_train(
        x12, p, k12, k3, lb, sc, bi, mask, jnp.float32(b * n), 1e-5
    )
    np.testing.assert_allclose(np.asarray(s_sh), np.asarray(s0), atol=2e-5)
    np.testing.assert_allclose(np.asarray(mean_sh), np.asarray(mean0),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(var_sh), np.asarray(var0),
                               atol=1e-5)

    loss_sh = lambda pv, kv: jnp.sum(
        sharded(x12, pv, kv)[0].astype(jnp.float32) ** 2
    )
    loss_0 = lambda pv, kv: jnp.sum(
        ah.assign_tail_train(
            x12, pv, k12, kv, lb, sc, bi, mask, jnp.float32(b * n), 1e-5
        )[0].astype(jnp.float32) ** 2
    )
    gp, gk = jax.grad(loss_sh, argnums=(0, 1))(p, k3)
    gp0, gk0 = jax.grad(loss_0, argnums=(0, 1))(p, k3)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gp0),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk0),
                               atol=1e-3, rtol=1e-3)


def test_chunked_lin_tail_matches_composed(rng):
    """assign_tail_train_chunked_lin(x12, x3, kc3, b3, ...) == the composed
    reference lin -> assign_tail_train: forward outputs and ALL gradients
    (including the absorbed conv3-lin's dkc3/db3/dx3) agree up to the f32
    chunk-reassociation of the accumulators. This is the 1M-capacity path
    where p = x3 @ kc3 never materializes (benchmarks/slide_step_r4.json)."""
    b, n, c, f12, f3, ch = 1, 512, 36, 8, 12, 128
    x12 = jnp.asarray(rng.normal(size=(b, n, f12)).astype(np.float32))
    x3 = jnp.asarray(rng.normal(size=(b, n, f3)).astype(np.float32))
    kc3 = jnp.asarray(rng.normal(size=(f3, c)).astype(np.float32) * 0.5)
    b3 = jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.1)
    k12 = jnp.asarray(rng.normal(size=(f12, c)).astype(np.float32))
    k3 = jnp.asarray(rng.normal(size=(c, c)).astype(np.float32) * 0.2)
    lb = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    sc = jnp.ones((c,), jnp.float32)
    bi = jnp.zeros((c,), jnp.float32)
    mask = np.ones((b, n), np.float32)
    mask[0, 400:] = 0.0
    mask = jnp.asarray(mask)
    nn = jnp.float32(400)

    def composed(x12v, x3v, kc3v, b3v, k3v, lbv, scv, biv):
        p = x3v @ kc3v + b3v[None, None, :]
        return ah.assign_tail_train(
            x12v, p, k12, k3v, lbv, scv, biv, mask, nn, 1e-5
        )

    def fused(x12v, x3v, kc3v, b3v, k3v, lbv, scv, biv):
        return ah.assign_tail_train_chunked_lin(
            x12v, x3v, kc3v, b3v, k12, k3v, lbv, scv, biv, mask, nn,
            1e-5, None, ch,
        )

    args = (x12, x3, kc3, b3, k3, lb, sc, bi)
    ref = composed(*args)
    out = fused(*args)
    for a, b_ in zip(ref, out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-6)

    def loss(fn):
        def run(*a):
            s, s_t, mean, var = fn(*a)
            return (
                jnp.sum(s.astype(jnp.float32) ** 2)
                + jnp.sum(s_t.astype(jnp.float32) * 0.1)
                + jnp.sum(mean * var)
            )
        return run

    g_ref = jax.grad(loss(composed), argnums=tuple(range(8)))(*args)
    g_out = jax.grad(loss(fused), argnums=tuple(range(8)))(*args)
    for gr, go in zip(g_ref, g_out):
        np.testing.assert_allclose(
            np.asarray(gr), np.asarray(go), atol=5e-5, rtol=1e-4
        )

    # non-dividing chunk: 512 = 384 + 128 remainder
    g384 = jax.grad(loss(lambda *a: ah.assign_tail_train_chunked_lin(
        a[0], a[1], a[2], a[3], k12, a[4], a[5], a[6], a[7], mask, nn,
        1e-5, None, 384,
    )), argnums=(1, 2))(*args)
    for gr, go in zip((g_ref[1], g_ref[2]), g384):
        np.testing.assert_allclose(
            np.asarray(gr), np.asarray(go), atol=5e-5, rtol=1e-4
        )


def test_psum_tail_padded_emission_matches_narrow(rng):
    """assign_tail_train_psum(c_out=C_pad) == the narrow call zero-padded:
    forward S (pad columns exactly zero) and ALL gradients, with wide
    cotangents flowing through the padded backward (the banded-kernel
    lane-pad elimination path, round 5)."""
    from jax.sharding import Mesh, PartitionSpec as P

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    b, n, c, f12, co = 1, 512, 36, 8, 64
    x12 = jnp.asarray(rng.normal(size=(b, n, f12)).astype(np.float32))
    p = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    k12 = jnp.asarray(rng.normal(size=(f12, c)).astype(np.float32))
    k3 = jnp.asarray(rng.normal(size=(c, c)).astype(np.float32) * 0.2)
    lb = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    sc = jnp.ones((c,), jnp.float32)
    bi = jnp.zeros((c,), jnp.float32)
    mask = jnp.ones((b, n), jnp.float32)
    mesh = Mesh(np.array(jax.devices()[:2]), ("graph",))

    def run(c_out):
        def inner(x12s, ps, masks, k3s):
            n_glob = jax.lax.psum(jnp.sum(masks), "graph")
            return ah.assign_tail_train_psum(
                x12s, ps, k12, k3s, lb, sc, bi, masks, n_glob, 1e-5,
                "graph", c_out,
            )

        out_spec_s = P(None, "graph")
        return jax.shard_map(
            inner, mesh=mesh,
            in_specs=(P(None, "graph"), P(None, "graph"),
                      P(None, "graph"), P()),
            out_specs=(out_spec_s, P(None, None, "graph"), P(), P()),
            check_vma=False,
        )

    s_w, _, mean_w, var_w = run(co)(x12, p, mask, k3)
    s_n, _, mean_n, var_n = run(None)(x12, p, mask, k3)
    assert s_w.shape == (b, n, co)
    np.testing.assert_array_equal(np.asarray(s_w[..., c:]), 0.0)
    np.testing.assert_array_equal(np.asarray(s_w[..., :c]), np.asarray(s_n))
    np.testing.assert_array_equal(np.asarray(mean_w), np.asarray(mean_n))
    np.testing.assert_array_equal(np.asarray(var_w), np.asarray(var_n))

    # grads: drive the WIDE output with a cotangent that also touches the
    # pad columns (their effect must vanish — pad cols of S are constant 0)
    w_probe = jnp.asarray(rng.normal(size=(b, n, co)).astype(np.float32))
    loss_w = lambda pv, kv: jnp.sum(
        run(co)(x12, pv, mask, kv)[0] * w_probe
    )
    loss_n = lambda pv, kv: jnp.sum(
        run(None)(x12, pv, mask, kv)[0] * w_probe[..., :c]
    )
    gw = jax.grad(loss_w, argnums=(0, 1))(p, k3)
    gn = jax.grad(loss_n, argnums=(0, 1))(p, k3)
    for name, a, b_ in zip(("dp", "dk3"), gw, gn):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=1e-5, rtol=1e-5,
            err_msg=name,
        )


def test_chunked_lin_tail_psum_matches_single_device(rng):
    """Lin-absorbing chunked variant under a 2-shard shard_map == the
    single-device composed reference (conv3 lin -> unchunked tail) on the
    concatenated rows — values AND gradients. Pins the cross-shard cotangent
    routing at assign_head.py::assign_tail_train_chunked_lin's axis!=None
    path: replicated-param grads (kc3/b3/k3) must stay LOCAL (the shard_map
    transpose psums them) while the BN-stats cotangents are psum'd inside —
    the exact double-count spot test_psum_tail_matches_single_device pins
    for the non-lin tail."""
    from jax.sharding import Mesh, PartitionSpec as P

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    b, n, c, f12, f3, ch = 1, 512, 36, 8, 12, 128
    x12 = jnp.asarray(rng.normal(size=(b, n, f12)).astype(np.float32))
    x3 = jnp.asarray(rng.normal(size=(b, n, f3)).astype(np.float32))
    kc3 = jnp.asarray(rng.normal(size=(f3, c)).astype(np.float32) * 0.5)
    b3 = jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.1)
    k12 = jnp.asarray(rng.normal(size=(f12, c)).astype(np.float32))
    k3 = jnp.asarray(rng.normal(size=(c, c)).astype(np.float32) * 0.2)
    lb = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    sc = jnp.ones((c,), jnp.float32)
    bi = jnp.zeros((c,), jnp.float32)
    mask = jnp.ones((b, n), jnp.float32)
    mesh = Mesh(np.array(jax.devices()[:2]), ("graph",))

    def sharded(x3v, kc3v, b3v, k3v):
        def run(x12s, x3s, masks, kc3s, b3s, k3s):
            n_glob = jax.lax.psum(jnp.sum(masks), "graph")
            return ah.assign_tail_train_chunked_lin(
                x12s, x3s, kc3s, b3s, k12, k3s, lb, sc, bi, masks,
                n_glob, 1e-5, "graph", ch,
            )

        return jax.shard_map(
            run, mesh=mesh,
            in_specs=(P(None, "graph"), P(None, "graph"),
                      P(None, "graph"), P(), P(), P()),
            out_specs=(P(None, "graph"), P(None, None, "graph"), P(), P()),
            check_vma=False,
        )(x12, x3v, mask, kc3v, b3v, k3v)

    def composed(x3v, kc3v, b3v, k3v):
        p = x3v @ kc3v + b3v[None, None, :]
        return ah.assign_tail_train(
            x12, p, k12, k3v, lb, sc, bi, mask, jnp.float32(b * n), 1e-5
        )

    args = (x3, kc3, b3, k3)
    s_sh, _, mean_sh, var_sh = sharded(*args)
    s0, _, mean0, var0 = composed(*args)
    np.testing.assert_allclose(np.asarray(s_sh), np.asarray(s0), atol=2e-5)
    np.testing.assert_allclose(np.asarray(mean_sh), np.asarray(mean0),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(var_sh), np.asarray(var0),
                               atol=1e-5)

    def loss(fn):
        return lambda *a: jnp.sum(fn(*a)[0].astype(jnp.float32) ** 2)

    g_sh = jax.grad(loss(sharded), argnums=(0, 1, 2, 3))(*args)
    g0 = jax.grad(loss(composed), argnums=(0, 1, 2, 3))(*args)
    for name, gs, gr in zip(("dx3", "dkc3", "db3", "dk3"), g_sh, g0):
        np.testing.assert_allclose(
            np.asarray(gs), np.asarray(gr), atol=1e-3, rtol=1e-3,
            err_msg=name,
        )


def test_chunked_pool_contract_matches_direct(rng):
    """parallel.mega_model._chunked_pool_contract == the direct einsum pair,
    values and gradients (the capacity path's contraction backward keeps one
    ds accumulator instead of three co-live contributions)."""
    from cgcnet_tpu.parallel.mega_model import _chunked_pool_contract

    n, c, f = 512, 36, 12
    s = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))
    pe = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    a_s = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))

    def direct(sv, pv, av):
        return (jnp.einsum("nc,nf->cf", sv, pv),
                jnp.einsum("nc,nd->cd", sv, av))

    for chunk in (128, 384):   # 384 exercises the remainder path
        out = _chunked_pool_contract(s, pe, a_s, chunk)
        ref = direct(s, pe, a_s)
        for a, b_ in zip(ref, out):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=1e-4, rtol=1e-5)

        def loss(fn):
            return lambda sv, pv, av: sum(
                jnp.sum(o.astype(jnp.float32) ** 2) for o in fn(sv, pv, av)
            )

        g_ref = jax.grad(loss(direct), argnums=(0, 1, 2))(s, pe, a_s)
        g_out = jax.grad(
            loss(lambda sv, pv, av: _chunked_pool_contract(
                sv, pv, av, chunk
            )), argnums=(0, 1, 2),
        )(s, pe, a_s)
        for gr, go in zip(g_ref, g_out):
            np.testing.assert_allclose(
                np.asarray(gr), np.asarray(go), atol=5e-4, rtol=1e-4
            )
