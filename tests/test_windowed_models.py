"""Windowed-SpMM plan through the model stack: cohort fold + flagship.

Asserts the windowed pallas path (Graph.with_window_meta via
cfg.windowed_spmm) matches the XLA backend's forward and gradients on a
synthetic cohort fold — i.e. the path that cfg.windowed_spmm=True ships
is covered end to end in interpret mode.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from multilevel_gnn_tpu.data.synthetic import make_synthetic_cohort
from multilevel_gnn_tpu.models import get_model
from multilevel_gnn_tpu.ops import spmm
from multilevel_gnn_tpu.train.driver import iter_batches
from multilevel_gnn_tpu.train.step import make_loss_fn

from test_data_pipeline import gbm_like_cfg


@pytest.mark.slow  # quick tier (VERDICT r4 Next #8): heavy CPU-mesh equivalence; covered by faster smokes in the quick tier
def test_windowed_flagship_matches_xla_backend():
    cfg = gbm_like_cfg(
        batch_size=4, windowed_spmm=True, kernel_backend="pallas", windowed_min_edges=0
    )
    cohort = make_synthetic_cohort(cfg, seed=0, n_patients=24, n_pathways=6)
    cfg = cfg.replace(
        node_num=cohort.num_nodes // 3, pathway_num=cohort.n_pathways
    )
    train_idx = np.arange(16)
    fold = cohort.fold(train_idx, 0)
    assert fold.ctx.graph.winplan is not None, "plan should attach"

    model = get_model(cfg.model)(cfg)
    batch = next(
        iter_batches(
            cohort.X, cohort.Y, cohort.ages, train_idx, cfg.batch_size,
            np.random.RandomState(0), False, False,
        )
    )
    params = model.init(jax.random.PRNGKey(0), batch, fold.ctx, False)
    loss_fn = make_loss_fn(model, cfg)
    cw = jnp.ones(2, jnp.float32)
    key = jax.random.PRNGKey(1)

    results = {}
    for backend in ("xla", "pallas"):
        spmm.set_backend(backend)
        try:
            (loss, pred), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, batch, fold.ctx, cw, key)
        finally:
            spmm.set_backend("xla")
        results[backend] = (
            float(loss), np.asarray(pred), jax.tree.map(np.asarray, grads)
        )

    l_x, p_x, g_x = results["xla"]
    l_p, p_p, g_p = results["pallas"]
    np.testing.assert_allclose(l_p, l_x, rtol=2e-5)
    np.testing.assert_allclose(p_p, p_x, rtol=2e-4, atol=2e-5)
    flat_x = jax.tree_util.tree_leaves_with_path(g_x)
    flat_p = dict(jax.tree_util.tree_leaves_with_path(g_p))
    for path, leaf in flat_x:
        np.testing.assert_allclose(
            flat_p[path], leaf, rtol=3e-4, atol=3e-5,
            err_msg=jax.tree_util.keystr(path),
        )
