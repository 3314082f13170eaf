"""Mixed-precision trunk (cfg.compute_dtype='bfloat16') validation.

The flagship GNN trunk runs in bf16 with f32 params/optimizer/head/losses
(the standard TPU production policy).  Guards: (1) the param tree is
IDENTICAL (same structure, all-f32 leaves) so checkpoints interchange;
(2) forward predictions match f32 at bf16 tolerance; (3) gradients are
finite f32 and close; (4) the end-to-end CV metric is unaffected at the
same tolerance as the bf16-message mode (test_bf16_cv_accuracy).
"""
import numpy as np
import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import pytest

from multilevel_gnn_tpu.data.synthetic import (
    make_gbm_scale_setup,
    make_synthetic_cohort,
)
from multilevel_gnn_tpu.models.multilevel_gnn import MultilevelGNN
from multilevel_gnn_tpu.ops import spmm
from multilevel_gnn_tpu.train.driver import run_experiment
from multilevel_gnn_tpu.train.step import make_loss_fn

from test_data_pipeline import gbm_like_cfg

pytestmark = pytest.mark.slow  # quick tier (VERDICT r4 Next #8): heavy CPU-mesh equivalence; covered by faster smokes in the quick tier


@pytest.mark.parametrize("backend,windowed", [
    ("xla", False),
    ("pallas", False),   # composed: gather_rows/_fused custom-VJP dtypes
    ("pallas", True),    # windowed: windowed_spmm_2d custom-VJP dtypes
])
def test_bf16_trunk_matches_f32(backend, windowed):
    cfg, model, graph, ctx, batch = make_gbm_scale_setup(
        node_num=80, n_pathways=6, n_edges=600, batch=4, gene_rows=300,
        topology="cohort" if windowed else "random", windowed=windowed,
    )
    if windowed:
        assert ctx.graph.winplan is not None
    cw = jnp.ones(2, jnp.float32)
    key = jax.random.PRNGKey(1)
    loss_fn = make_loss_fn(model, cfg)
    spmm.set_backend(backend)
    try:
        params = model.init(jax.random.PRNGKey(0), batch, ctx, False)
        (l32, p32), g32 = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, ctx, cw, key
        )

        cfg_b = cfg.replace(compute_dtype="bfloat16")
        model_b = MultilevelGNN(cfg_b)
        loss_b = make_loss_fn(model_b, cfg_b)
        params_b = model_b.init(jax.random.PRNGKey(0), batch, ctx, False)
        assert jtu.tree_structure(params) == jtu.tree_structure(params_b)
        assert all(
            a.dtype == b.dtype
            for a, b in zip(jtu.tree_leaves(params), jtu.tree_leaves(params_b))
        )
        # f32 params drive the bf16-compute model directly (ckpt interop)
        (lb, pb), gb = jax.value_and_grad(loss_b, has_aux=True)(
            params, batch, ctx, cw, key
        )
    finally:
        spmm.set_backend("xla")

    assert np.isfinite(float(lb))
    np.testing.assert_allclose(float(lb), float(l32), rtol=2e-2)
    np.testing.assert_allclose(
        np.asarray(pb), np.asarray(p32), atol=3e-2, rtol=5e-2
    )
    scale = max(
        float(jnp.abs(x).max()) for x in jtu.tree_leaves(g32)
    )
    for (path, x), y in zip(
        jtu.tree_leaves_with_path(g32), jtu.tree_leaves(gb)
    ):
        assert y.dtype == x.dtype, (jtu.keystr(path), y.dtype)
        assert bool(jnp.isfinite(y).all()), jtu.keystr(path)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(x), atol=0.05 * scale, rtol=0.2,
            err_msg=jtu.keystr(path),
        )


def test_bf16_trunk_deepergcn_matches_f32():
    """GENConv stack (DeeperGCN family) under compute_dtype: same f32
    param tree, forward/grads close (softmax-aggregation stats stay f32)."""
    from multilevel_gnn_tpu.models.deepergcn import DeeperGCN

    cfg = gbm_like_cfg(
        model="deepergcn", conv="gen", gcn_aggr="softmax", block="res+",
        num_layers=3, hidden_channels=16, mlp_layers=2, norm="layer",
        node_embedding=True, node_embedding_dim=4, use_edge_attr=True,
        global_edge="onehot", pathway_readout="maxpool",
        graph_pooling="mean", num_layer_head=2, pre_concat_age=True,
        learn_t=True,
    )
    cohort = make_synthetic_cohort(cfg, seed=0, n_patients=30, n_pathways=8)
    cfg = cfg.replace(
        pathway_num=cohort.n_pathways,
        node_num=cohort.node_size + cohort.n_pathways,
    )
    fold = cohort.deepergcn_fold(np.arange(18), 0)
    cfg = cfg.replace(pathway_edge_num=max(cohort.pathway_edge_num, 1))
    Xg = cohort.gene_level_features()
    from multilevel_gnn_tpu.core.batch import Batch

    B = 4
    batch = Batch(
        x=jnp.asarray(Xg[:B]),
        y=jnp.asarray(cohort.Y[:B]),
        age=jnp.asarray(cohort.ages[:B]),
        sample_mask=jnp.ones(B, bool),
        raw_data=jnp.asarray(fold.pathway_node_attr[:B].astype(np.float32)),
    )
    cw = jnp.ones(2, jnp.float32)
    key = jax.random.PRNGKey(1)

    model = DeeperGCN(cfg)
    loss_fn = make_loss_fn(model, cfg)
    params = model.init(jax.random.PRNGKey(0), batch, fold.ctx, False)
    (l32, p32), g32 = jax.value_and_grad(loss_fn, has_aux=True)(
        params, batch, fold.ctx, cw, key
    )

    model_b = DeeperGCN(cfg.replace(compute_dtype="bfloat16"))
    loss_b = make_loss_fn(model_b, cfg.replace(compute_dtype="bfloat16"))
    params_b = model_b.init(jax.random.PRNGKey(0), batch, fold.ctx, False)
    assert jtu.tree_structure(params) == jtu.tree_structure(params_b)
    (lb, pb), gb = jax.value_and_grad(loss_b, has_aux=True)(
        params, batch, fold.ctx, cw, key
    )
    assert np.isfinite(float(lb))
    np.testing.assert_allclose(float(lb), float(l32), rtol=3e-2)
    np.testing.assert_allclose(
        np.asarray(pb), np.asarray(p32), atol=3e-2, rtol=5e-2
    )
    for (path, x), y in zip(
        jtu.tree_leaves_with_path(g32), jtu.tree_leaves(gb)
    ):
        assert y.dtype == x.dtype, (jtu.keystr(path), y.dtype)
        assert bool(jnp.isfinite(y).all()), jtu.keystr(path)


def test_bf16_trunk_cv_auc_within_tolerance():
    cfg = gbm_like_cfg(
        epochs=5,
        num_run=1,
        batch_size=8,
        split_shaffle=True,
        split_seed=3,
        node_embedding_dim=4,
        hidden_channels=8,
        final_channels=4,
        head_dim=16,
    )
    cohort = make_synthetic_cohort(cfg, seed=0, n_patients=50, n_pathways=5)

    def _cv(c):
        res = run_experiment(c, cohort)
        e = res["check_epochs"][-1]
        return res["auc"][e]

    auc_f32 = _cv(cfg)
    auc_bf16 = _cv(cfg.replace(compute_dtype="bfloat16"))
    assert np.isfinite(auc_bf16)
    assert abs(auc_bf16 - auc_f32) < 0.005, (auc_bf16, auc_f32)
