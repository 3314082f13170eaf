"""Distributed tests on the virtual 8-device CPU mesh (SURVEY.md §4.5):
edge-partitioned + batch-sharded training step must match the single-device
result."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multilevel_gnn_tpu.core.graph import Graph
from multilevel_gnn_tpu.ops import spmm
from multilevel_gnn_tpu.parallel import (
    make_mesh,
    make_parallel_train_step,
    replicate,
    shard_batch,
    shard_ctx,
)
from multilevel_gnn_tpu.train.step import build_train_fns, make_optimizer

import __graft_entry__ as graft


@pytest.fixture(scope="module")
def setup():
    return graft._tiny_setup(n_patients=40, batch=8)


def test_devices_available():
    assert len(jax.devices()) >= 8


def test_sharded_spmm_matches(rng):
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(1, 4)
    N, E, B, C = 50, 256, 4, 8
    g = Graph.from_edges(
        rng.randint(0, N, size=(2, E)), rng.rand(E).astype(np.float32), N
    )
    x = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    want = spmm.gather_scatter(x, g, "mean", g.edge_attr)

    gs = jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P("model"))),
        (g.senders, g.receivers, g.edge_attr, g.edge_mask),
    )
    g2 = dataclasses.replace(
        g, senders=gs[0], receivers=gs[1], edge_attr=gs[2], edge_mask=gs[3]
    )
    with mesh:
        got = jax.jit(
            lambda x: spmm.gather_scatter(x, g2, "mean", g2.edge_attr)
        )(jax.device_put(x, NamedSharding(mesh, P())))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_multichip_step_matches_single_device(setup):
    cfg, cohort, fold, model, params0, batch = setup
    optimizer = make_optimizer(cfg, steps_per_epoch=1)
    opt_state0 = optimizer.init(params0)
    cw = jnp.asarray(fold.class_weight, jnp.float32)
    rng_key = jax.random.PRNGKey(1)

    # single-device reference step
    mesh1 = make_mesh(1, 1, devices=jax.devices()[:1])
    step1 = make_parallel_train_step(model, cfg, mesh1, optimizer)
    with mesh1:
        p1, _, loss1 = step1(
            jax.tree.map(jnp.copy, params0),
            jax.tree.map(jnp.copy, opt_state0),
            batch, fold.ctx, cw, rng_key,
        )

    # 4 data x 2 model mesh
    mesh = make_mesh(4, 2)
    step = make_parallel_train_step(model, cfg, mesh, optimizer)
    params = replicate(jax.tree.map(jnp.copy, params0), mesh)
    opt_state = replicate(jax.tree.map(jnp.copy, opt_state0), mesh)
    b = shard_batch(batch, mesh)
    ctx = shard_ctx(fold.ctx, mesh)
    with mesh:
        p2, _, loss2 = step(params, opt_state, b, ctx, replicate(cw, mesh), rng_key)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-4)
    l1 = jax.tree_util.tree_leaves(p1)
    l2 = jax.tree_util.tree_leaves(p2)
    for a, b_ in zip(l1, l2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-4, atol=5e-5
        )


@pytest.mark.slow  # quick tier (VERDICT r4 Next #8): heavy CPU-mesh equivalence; covered by faster smokes in the quick tier
def test_dryrun_multichip_entrypoint():
    # multiprocess=False: the loopback jax.distributed leg is covered by
    # test_multiprocess.py (slow tier) and by the driver's dryrun artifact
    graft.dryrun_multichip(8, multiprocess=False)


@pytest.mark.slow
def test_dryrun_multiprocess_entrypoint():
    """The driver's multi-host certification leg (VERDICT r4 Next #7):
    2-process loopback group + checkpoint restart, end to end."""
    graft.dryrun_multiprocess()
