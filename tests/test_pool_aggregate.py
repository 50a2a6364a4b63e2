"""Fused pool-aggregate VJP (mega_model._pool_aggregate) vs the composable
path (adj(s) + _chunked_pool_contract).

The fused op owns aggregation + both DiffPool contractions so its backward
can hand the summed ds contributions to the banded transpose kernel as the
in-kernel row accumulator (bsr_matmul_banded ``acc``). These tests pin the
fused primal AND gradients to the composable form on band-limited strip
graphs, single-shard and 2-shard (halo exchange + hybrid transpose rows in
the loop). f32 in interpret mode so the bound is reassociation-level; the
bf16 production variant is compiled/validated on hardware (PROGRESS r5) and
covered end-to-end by the slide-step benchmarks.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from cgcnet_tpu.config import ModelConfig
from cgcnet_tpu.ops.knn import radius_knn_np
from cgcnet_tpu.ops.pallas import bsr_kernel as bk
from cgcnet_tpu.parallel.mega_graph import build_bsr_tables, partition_graph
from cgcnet_tpu.parallel.mega_model import (
    _chunked_pool_contract,
    _pool_aggregate,
    _ShardedAdj,
    prepare_mega_inputs,
)
from cgcnet_tpu.parallel.mesh import make_mesh
from cgcnet_tpu.parallel.slide_setup import spatial_sort_order


@pytest.fixture(autouse=True)
def _interp():
    bk.set_interpret(True)
    yield
    bk.set_interpret(False)


def _strip_case(n, shards, seed=0):
    """Narrow-strip geometry (mega_recipe style): the banded window tables
    must accept so the fused path's kernel legs engage."""
    rng = np.random.default_rng(seed)
    xs = np.sort(rng.uniform(0, n * 3.0, n))
    pos = np.stack([xs, rng.uniform(0, 80, n)], -1).astype(np.float32)
    order = spatial_sort_order(pos, 100.0, stripes=shards,
                               shard_rows=n // shards)
    pos = pos[order]
    nbr, mask = radius_knn_np(pos, 100.0, 6)
    part = partition_graph(nbr, mask, shards)
    tables = build_bsr_tables(part)
    assert tables is not None
    return part, tables


@pytest.mark.parametrize("shards", [1, 2])
def test_fused_pool_aggregate_matches_composable(shards):
    n = 4096
    c, f = 128, 20
    part, tables = _strip_case(n, shards)
    mesh = make_mesh(1, shards, devices=jax.devices()[:shards])
    x_dummy = np.zeros((n, f), np.float32)
    inputs = prepare_mega_inputs(x_dummy, part, mesh, n_real=n, bsr=tables)
    assert inputs.win_base_t is not None, "banded transpose must engage"

    rng = np.random.default_rng(1)
    s = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))
    pe = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    mcfg = ModelConfig()

    def fn(s_, pe_, inp):
        adj = _ShardedAdj(inp, mcfg, "graph", dtype=jnp.float32)
        pa = adj.pool_aggregate_args()

        def loss_fused(sp):
            xp_, ap_ = _pool_aggregate("graph", *pa, *sp)
            xp_, ap_ = jax.lax.psum((xp_, ap_), "graph")
            return jnp.sum(xp_ ** 2) + jnp.sum(ap_ ** 2)

        def loss_ref(sp):
            a_s = adj(sp[0])
            xp_, ap_ = _chunked_pool_contract(
                sp[0], sp[1], a_s, sp[0].shape[0]
            )
            xp_, ap_ = jax.lax.psum((xp_, ap_), "graph")
            return jnp.sum(xp_ ** 2) + jnp.sum(ap_ ** 2)

        l1, g1 = jax.value_and_grad(loss_fused)((s_, pe_))
        l2, g2 = jax.value_and_grad(loss_ref)((s_, pe_))
        return l1, l2, g1, g2

    inp_specs = jax.tree.map(lambda _: P("graph"), inputs)
    out = jax.jit(
        jax.shard_map(
            fn, mesh=mesh,
            in_specs=(P("graph"), P("graph"), inp_specs),
            out_specs=(P(), P(), (P("graph"), P("graph")),
                       (P("graph"), P("graph"))),
            check_vma=False,
        )
    )(s, pe, inputs)
    l1, l2, (ds1, dpe1), (ds2, dpe2) = jax.device_get(out)
    np.testing.assert_allclose(l1, l2, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ds1), np.asarray(ds2), rtol=2e-4,
        atol=2e-4 * np.abs(np.asarray(ds2)).max(),
    )
    np.testing.assert_allclose(
        np.asarray(dpe1), np.asarray(dpe2), rtol=2e-4,
        atol=2e-4 * np.abs(np.asarray(dpe2)).max(),
    )
