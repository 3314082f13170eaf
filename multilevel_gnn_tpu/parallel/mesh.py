"""Device mesh + SPMD sharding (SURVEY.md §2.3, §5.8).

The reference has no distributed layer (unused DataParallel import,
train.py:16; edge-truncating device_num hack, multilevel_gnn.py:156-165).
This module is designed from the TPU north star instead:

  * mesh axes ('data', 'model'): patients sharded on 'data'; the fold
    topology's edge arrays sharded on 'model' (edge partitioning — the GNN
    analog of sequence parallelism).
  * GSPMD path (here): annotate shardings on a global-view jitted train
    step and let XLA insert the collectives (psum of partial segment sums
    over 'model', gradient all-reduce over 'data') — the standard
    mesh+pjit recipe.
  * a manual shard_map path with explicitly overlapped halo exchange is the
    planned optimization on top (parallel/edge_partition.py).

Multi-host: jax.distributed.initialize() then the same mesh over
jax.devices() — collectives ride ICI within a slice and DCN across.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multilevel_gnn_tpu.core.batch import Batch, FoldContext
from multilevel_gnn_tpu.core.graph import Graph


def make_mesh(
    n_data: int, n_model: int = 1, devices=None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_data * n_model, (
        len(devices), n_data, n_model,
    )
    arr = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def batch_spec(batch: Optional[Batch] = None) -> Batch:
    has_raw = batch is not None and batch.raw_data is not None
    return Batch(
        x=P("data"), y=P("data"), age=P("data"), sample_mask=P("data"),
        raw_data=P("data") if has_raw else None,
    )


def ctx_spec(ctx: FoldContext) -> FoldContext:
    """Edge arrays sharded on 'model'; node-level constants replicated."""
    return FoldContext(
        graph=Graph(
            senders=P("model"),
            receivers=P("model"),
            edge_attr=P("model") if ctx.graph.edge_attr is not None else None,
            edge_mask=P("model"),
            n_nodes=ctx.graph.n_nodes,
            n_edges=ctx.graph.n_edges,
        ),
        gene_pca_match=P(),
        raw_indice=P(),
        info_mask=P(),
        reorder_idxs=P(),
        pca_seed=P() if ctx.pca_seed is not None else None,
    )


def _to_sharding(mesh: Mesh, spec_tree, value_tree):
    return jax.tree.map(
        lambda spec, v: jax.device_put(v, NamedSharding(mesh, spec))
        if spec is not None
        else v,
        spec_tree,
        value_tree,
        is_leaf=lambda x: x is None or isinstance(x, P),
    )


def shard_batch(batch: Batch, mesh: Mesh) -> Batch:
    return _to_sharding(mesh, batch_spec(batch), batch)


def shard_ctx(ctx: FoldContext, mesh: Mesh, pad_multiple: int = 1) -> FoldContext:
    """Pad edge arrays to a multiple of the model-axis size, then shard.

    The Pallas sorted-segment metadata (csr/csc) is stripped: pallas_call has
    no GSPMD partitioning rule, so the mesh path aggregates via XLA
    gather/segment ops and XLA-inserted collectives.  In-shard Pallas kernels
    belong to the manual shard_map path (parallel/edge_partition.py).  The
    host-precomputed in-degree is kept (replicated) so degree lookups stay
    scatter-free."""
    import dataclasses as _dc

    n_model = mesh.shape["model"]
    g = ctx.graph
    E = g.num_padded_edges
    target = ((E + n_model - 1) // n_model) * n_model
    if target != E:
        in_deg = g.in_deg
        g = g.pad_edges_to(target)
        g = _dc.replace(g, in_deg=in_deg)
    if g.csr is not None or g.csc is not None or g.winplan is not None:
        g = _dc.replace(g, csr=None, csc=None, winplan=None)
    if g is not ctx.graph:
        ctx = _dc.replace(ctx, graph=g)
    return _to_sharding(mesh, ctx_spec(ctx), ctx)


def replicate(tree, mesh: Mesh):
    s = NamedSharding(mesh, P())
    return jax.tree.map(lambda v: jax.device_put(v, s), tree)


def maybe_make_mesh(cfg) -> Optional[Mesh]:
    """Build the configured ('data', 'model') mesh, or None when the config
    asks for a 1x1 mesh (single-device path).  The driver calls this once
    per experiment (train/driver.py)."""
    n_data = getattr(cfg, "mesh_data_axis", 1)
    n_model = getattr(cfg, "mesh_model_axis", 1)
    if n_data * n_model <= 1:
        return None
    return make_mesh(n_data, n_model)


def make_parallel_train_step(model, cfg, mesh: Mesh, optimizer):
    """Global-view jitted train step with mesh shardings (GSPMD).

    Batch rides the 'data' axis, edges the 'model' axis; XLA partitions the
    gather/segment-sum aggregation and inserts psum/all-reduce collectives.
    The loss is the SAME builder as the single-device step
    (train/step.py:make_loss_fn), so extra losses (DiffPool) and the
    PCA-less families (DeeperGCN / MultiOmixGCN) behave identically.
    """
    import optax

    from multilevel_gnn_tpu.train.step import make_loss_fn

    loss_fn = make_loss_fn(model, cfg)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch, ctx, class_weight, rng):
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, ctx, class_weight, rng
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
