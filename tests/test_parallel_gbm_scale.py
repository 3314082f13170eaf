"""GBM-production-scale compile check of the sharded train step on the
virtual 8-device CPU mesh (VERDICT r1 weak-8): tiny-shape parallel tests
can hide sharding-induced layout/partitioning problems that would otherwise
surface first on real hardware.

Uses the exact shapes the TPU bench measures (data/synthetic.py:
make_gbm_scale_setup — N=15405 node slots, E=165k incl self loops, B=32)
on the XLA backend (the mesh path strips Pallas metadata; see
parallel/mesh.py:shard_ctx) and runs ONE optimizer step, asserting a finite
loss and data/model-sharded layouts end to end.
"""
import jax
import jax.numpy as jnp
import pytest

from multilevel_gnn_tpu.data.synthetic import make_gbm_scale_setup
from multilevel_gnn_tpu.parallel import (
    make_mesh,
    make_parallel_train_step,
    replicate,
    shard_batch,
    shard_ctx,
)
from multilevel_gnn_tpu.train.step import make_optimizer


@pytest.mark.slow
def test_gbm_scale_sharded_step_compiles_and_runs():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    cfg, model, graph, ctx, batch = make_gbm_scale_setup()
    mesh = make_mesh(4, 2)

    params = model.init(jax.random.PRNGKey(0), batch, ctx, False)
    optimizer = make_optimizer(cfg, steps_per_epoch=1)
    opt_state = optimizer.init(params)

    params = replicate(params, mesh)
    opt_state = replicate(opt_state, mesh)
    sbatch = shard_batch(batch, mesh)
    sctx = shard_ctx(ctx, mesh)
    cw = replicate(jnp.ones(2, jnp.float32), mesh)

    step = make_parallel_train_step(model, cfg, mesh, optimizer)
    with mesh:
        params, opt_state, loss = step(
            params, opt_state, sbatch, sctx, cw, jax.random.PRNGKey(1)
        )
        loss.block_until_ready()
    assert bool(jnp.isfinite(loss)), float(loss)
    # the step must actually distribute: edge arrays on 'model', batch on
    # 'data' (not silently replicated)
    esh = sctx.graph.senders.sharding
    assert "model" in esh.spec
    assert "data" in sbatch.x.sharding.spec


@pytest.mark.slow
def test_gbm_scale_halo_step_compiles_and_runs():
    """Same GBM-scale step with the boundary-only halo exchange (xla
    in-shard path — the Pallas in-shard kernels are interpret-mode-only on
    CPU and too slow at 165k edges; covered at kernel level in
    tests/test_halo.py)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    import dataclasses as dc

    from multilevel_gnn_tpu.ops import spmm
    from multilevel_gnn_tpu.parallel.halo import build_halo_partition

    cfg, model, graph, ctx, batch = make_gbm_scale_setup()
    mesh = make_mesh(2, 4)

    params = model.init(jax.random.PRNGKey(0), batch, ctx, False)
    optimizer = make_optimizer(cfg, steps_per_epoch=1)
    opt_state = optimizer.init(params)

    params = replicate(params, mesh)
    opt_state = replicate(opt_state, mesh)
    sbatch = shard_batch(batch, mesh)
    sctx = shard_ctx(ctx, mesh)
    hp = build_halo_partition(sctx.graph, 4)
    sctx = dc.replace(sctx, graph=dc.replace(sctx.graph, halo=hp))
    cw = replicate(jnp.ones(2, jnp.float32), mesh)

    step = make_parallel_train_step(model, cfg, mesh, optimizer)
    spmm.set_parallel_mesh(mesh)
    try:
        with mesh:
            params, opt_state, loss = step(
                params, opt_state, sbatch, sctx, cw, jax.random.PRNGKey(1)
            )
            loss.block_until_ready()
    finally:
        spmm.set_parallel_mesh(None)
    assert bool(jnp.isfinite(loss)), float(loss)
