"""Distributed tests on the 8-device virtual CPU mesh (SURVEY.md §4.4):
halo exchange vs single-device oracle, DP step equivalence, dryrun."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from cgcnet_tpu.ops.ell import ell_gather_sum
from cgcnet_tpu.ops.knn import radius_knn_np
from cgcnet_tpu.parallel.mega_graph import (
    partition_graph,
    sharded_gather_sum,
    sharded_gather_sum_allgather,
)
from cgcnet_tpu.parallel.mesh import make_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def spatial_graph(rng, n, k=4, radius=60.0):
    """Spatially sorted band graph (what the mega-graph partitioner expects)."""
    pos = np.sort(rng.uniform(0, n * 2.0, (n, 1)), axis=0)
    pos = np.concatenate([pos, rng.uniform(0, 50, (n, 1))], 1).astype(np.float32)
    nbr, mask = radius_knn_np(pos, radius, k)
    return nbr, mask


class TestPartition:
    def test_remap_roundtrip(self, rng):
        n, d = 64, 4
        nbr, mask = spatial_graph(rng, n)
        part = partition_graph(nbr, mask, d)
        ns = n // d
        # masks preserved
        np.testing.assert_array_equal(
            part.nbr_mask.reshape(n, -1), mask
        )
        # every remapped local index resolves back to the original global id
        p = part.halo_capacity
        for shard in range(d):
            # recv layout: [e * p + slot] -> global id  req_idx[e, shard, slot]
            for i in range(ns):
                for kk in range(nbr.shape[1]):
                    if mask[shard * ns + i, kk] <= 0:
                        continue
                    j = part.nbr_remap[shard, i, kk]
                    want = nbr[shard * ns + i, kk]
                    if j < ns:
                        assert shard * ns + j == want
                    else:
                        slot = j - ns
                        e, s = slot // p, slot % p
                        got = e * ns + part.req_idx[e, shard, s]
                        assert got == want

    def test_capacity_overflow_raises(self, rng):
        nbr, mask = spatial_graph(rng, 64)
        with pytest.raises(ValueError, match="halo capacity"):
            partition_graph(nbr, mask, 4, halo_capacity=0 + 0)


class TestShardedAggregation:
    @pytest.mark.parametrize("d", [2, 4, 8])
    def test_halo_matches_single_device(self, rng, d):
        n, k, f = 128, 4, 8
        nbr, mask = spatial_graph(rng, n, k)
        x = rng.normal(size=(n, f)).astype(np.float32)
        ref = np.asarray(
            ell_gather_sum(
                jnp.asarray(nbr)[None],
                jnp.asarray(mask)[None],
                jnp.asarray(x)[None],
            )
        )[0]

        mesh = make_mesh(1, d, devices=jax.devices()[:d])
        part = partition_graph(nbr, mask, d)
        spec = NamedSharding(mesh, P("graph"))
        put = lambda a: jax.device_put(jnp.asarray(a), spec)
        out = sharded_gather_sum(
            put(x),
            put(part.nbr_remap.reshape(n, k)),
            put(part.nbr_mask.reshape(n, k)),
            put(part.nbr_mask.reshape(n, k)),
            put(part.req_idx.reshape(-1, part.halo_capacity)),
            put(part.req_mask.reshape(-1, part.halo_capacity)),
            mesh=mesh,
        )
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    @pytest.mark.parametrize("d", [2, 8])
    def test_overlap_variant_matches(self, rng, d):
        from cgcnet_tpu.parallel.mega_graph import sharded_gather_sum_overlap

        n, k, f = 128, 4, 8
        nbr, mask = spatial_graph(rng, n, k)
        x = rng.normal(size=(n, f)).astype(np.float32)
        ref = np.asarray(
            ell_gather_sum(
                jnp.asarray(nbr)[None], jnp.asarray(mask)[None],
                jnp.asarray(x)[None],
            )
        )[0]
        mesh = make_mesh(1, d, devices=jax.devices()[:d])
        part = partition_graph(nbr, mask, d)
        spec = NamedSharding(mesh, P("graph"))
        put = lambda a: jax.device_put(jnp.asarray(a), spec)
        out = sharded_gather_sum_overlap(
            put(x),
            put(part.nbr_remap.reshape(n, k)),
            put(part.nbr_mask.reshape(n, k)),
            put(part.nbr_mask.reshape(n, k)),
            put(part.req_idx.reshape(-1, part.halo_capacity)),
            put(part.req_mask.reshape(-1, part.halo_capacity)),
            mesh=mesh,
        )
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_allgather_baseline_matches(self, rng):
        n, k, f, d = 64, 4, 8, 4
        nbr, mask = spatial_graph(rng, n, k)
        x = rng.normal(size=(n, f)).astype(np.float32)
        ref = np.asarray(
            ell_gather_sum(
                jnp.asarray(nbr)[None], jnp.asarray(mask)[None], jnp.asarray(x)[None]
            )
        )[0]
        mesh = make_mesh(1, d, devices=jax.devices()[:d])
        spec = NamedSharding(mesh, P("graph"))
        put = lambda a: jax.device_put(jnp.asarray(a), spec)
        out = sharded_gather_sum_allgather(
            put(x), put(nbr), put(mask), mesh=mesh
        )
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_halo_gradient_matches(self, rng):
        n, k, f, d = 64, 4, 4, 4
        nbr, mask = spatial_graph(rng, n, k)
        x = rng.normal(size=(n, f)).astype(np.float32)
        g = rng.normal(size=(n, f)).astype(np.float32)

        def ref_loss(xx):
            out = ell_gather_sum(
                jnp.asarray(nbr)[None], jnp.asarray(mask)[None], xx[None]
            )[0]
            return jnp.sum(out * jnp.asarray(g))

        ref_grad = np.asarray(jax.grad(ref_loss)(jnp.asarray(x)))

        mesh = make_mesh(1, d, devices=jax.devices()[:d])
        part = partition_graph(nbr, mask, d)
        spec = NamedSharding(mesh, P("graph"))
        put = lambda a: jax.device_put(jnp.asarray(a), spec)
        args = (
            put(part.nbr_remap.reshape(n, k)),
            put(part.nbr_mask.reshape(n, k)),
            put(part.nbr_mask.reshape(n, k)),
            put(part.req_idx.reshape(-1, part.halo_capacity)),
            put(part.req_mask.reshape(-1, part.halo_capacity)),
        )

        g_dev = put(g)

        def dist_loss(xx):
            out = sharded_gather_sum(xx, *args, mesh=mesh)
            return jnp.sum(out * g_dev)

        dist_grad = np.asarray(
            jax.device_get(jax.jit(jax.grad(dist_loss))(put(x)))
        )
        np.testing.assert_allclose(dist_grad, ref_grad, atol=1e-5)


class TestDataParallel:
    def test_dp_step_matches_single_device(self, rng):
        """Loss and updated params identical sharded vs unsharded."""
        import sys

        sys.path.insert(0, "/root/repo")
        from __graft_entry__ import _example_graph
        from cgcnet_tpu.config import Config
        from cgcnet_tpu.train.loop import make_train_step
        from cgcnet_tpu.train.optim import make_optimizer
        from cgcnet_tpu.train.state import create_train_state

        cfg = Config().apply_overrides(
            ["model.max_num_nodes=128", "model.hidden_dim=8",
             "model.embedding_dim=8", "model.assign_hidden_dim=8",
             "model.drop_out=0.0"]
        )
        graph = _example_graph(batch=4, cap=64)
        tx = make_optimizer(cfg.train, steps_per_epoch=1)
        model, state0 = create_train_state(cfg, tx, graph)
        step_fn = make_train_step(model)
        step = jax.jit(lambda s, g: step_fn(s, g, tx))

        _, m_single = step(state0, graph)

        mesh = make_mesh(4, 1)
        bspec = NamedSharding(mesh, P("data"))
        rspec = NamedSharding(mesh, P())
        graph_s = jax.tree.map(lambda a: jax.device_put(a, bspec), graph)
        state_s = jax.tree.map(lambda a: jax.device_put(a, rspec), state0)
        _, m_dp = step(state_s, graph_s)

        np.testing.assert_allclose(
            float(m_single["loss"]), float(m_dp["loss"]), atol=1e-5
        )
        np.testing.assert_allclose(
            float(m_single["acc"]), float(m_dp["acc"]), atol=1e-6
        )


def test_dryrun_multichip():
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)
