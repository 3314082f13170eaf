"""Integrated-gradients explanation driver tests."""
import numpy as np
import jax
import jax.numpy as jnp

from multilevel_gnn_tpu.core.batch import Batch
from multilevel_gnn_tpu.data.synthetic import make_synthetic_cohort
from multilevel_gnn_tpu.models.multilevel_gnn import MultilevelGNN
from multilevel_gnn_tpu.train.explain import (
    explain_cohort,
    integrated_gradients,
    pathway_attributions,
)

from test_data_pipeline import gbm_like_cfg


def test_integrated_gradients_completeness():
    cfg = gbm_like_cfg()
    cohort = make_synthetic_cohort(cfg, seed=0, n_patients=24, n_pathways=5)
    cfg = cfg.replace(pathway_num=cohort.n_pathways, node_num=cohort.num_nodes // 3)
    fold = cohort.fold(np.arange(14), 0)
    B = 4
    b = Batch(
        x=jnp.asarray(cohort.X[:B]), y=jnp.asarray(cohort.Y[:B]),
        age=jnp.asarray(cohort.ages[:B]), sample_mask=jnp.ones(B, bool),
    )
    m = MultilevelGNN(cfg)
    params = m.init(jax.random.PRNGKey(0), b, fold.ctx, False)
    ig = integrated_gradients(m, params, b, fold.ctx, steps=64)
    assert ig.shape == b.x.shape
    # completeness: sum of attributions ~= f(x) - f(0)
    pred_x, _ = m.apply(params, b, fold.ctx, False)
    b0 = Batch(x=jnp.zeros_like(b.x), y=b.y, age=b.age, sample_mask=b.sample_mask)
    pred_0, _ = m.apply(params, b0, fold.ctx, False)
    want = np.asarray(pred_x[:, 0] - pred_0[:, 0])
    got = np.asarray(ig.sum(axis=1))
    np.testing.assert_allclose(got, want, rtol=0.1, atol=0.02)

    scores = pathway_attributions(ig, fold.ctx, cohort.n_pathways)
    assert scores.shape == (B, cohort.n_pathways)
    assert np.all(scores >= 0)

    rows = explain_cohort(m, params, cohort, fold.ctx, b, steps=8)
    assert len(rows) >= 1 and "p" in rows[0]


def test_ig_executable_reused_across_calls():
    """The jitted IG wrapper is memoized per (model, steps, target): a
    second call — the CLI chunk loop — must not re-trace (advisor r4)."""
    from multilevel_gnn_tpu.train import explain as ex

    cfg = gbm_like_cfg()
    cohort = make_synthetic_cohort(cfg, seed=1, n_patients=16, n_pathways=4)
    cfg = cfg.replace(pathway_num=cohort.n_pathways, node_num=cohort.num_nodes // 3)
    fold = cohort.fold(np.arange(10), 0)
    B = 2
    m = MultilevelGNN(cfg)
    b = Batch(
        x=jnp.asarray(cohort.X[:B]), y=jnp.asarray(cohort.Y[:B]),
        age=jnp.asarray(cohort.ages[:B]), sample_mask=jnp.ones(B, bool),
    )
    params = m.init(jax.random.PRNGKey(0), b, fold.ctx, False)
    integrated_gradients(m, params, b, fold.ctx, steps=4)
    fn = ex._ig_fn(m, 4, 0)
    misses0 = fn._cache_size()
    b2 = Batch(
        x=jnp.asarray(cohort.X[B:2 * B]), y=jnp.asarray(cohort.Y[B:2 * B]),
        age=jnp.asarray(cohort.ages[B:2 * B]), sample_mask=jnp.ones(B, bool),
    )
    integrated_gradients(m, params, b2, fold.ctx, steps=4)
    assert ex._ig_fn(m, 4, 0) is fn, "wrapper must be memoized"
    assert fn._cache_size() == misses0, "second same-shape call re-traced"


def test_explain_cli_roundtrip(tmp_path):
    """mgtpu-train -> checkpoint -> mgtpu-explain end to end: the IG + KM
    screen runs off the driver's checkpoint via the shared fold plumbing
    (train/predict.load_fold_state) and emits ranked pathway rows."""
    import json

    import multilevel_gnn_tpu.train.cli as cli
    import multilevel_gnn_tpu.train.explain as explain

    cfgp = tmp_path / "cfg.yaml"
    cfgp.write_text(
        "cancer_type: synth\nmodel: multilevel_gnn\ngnn_name: sage\n"
        "num_run: 1\nepochs: 2\nbatch_size: 8\nsplit_shaffle: true\n"
        "split_seed: 3\nckpt_every: 2\n"
    )
    out = tmp_path / "attr.json"
    cli.main([
        "--config", str(cfgp), "--synthetic", "--debug",
        "--ckpt-dir", str(tmp_path / "ckpt"),
    ])
    explain.main([
        "--config", str(cfgp), "--synthetic", "--debug",
        "--ckpt-dir", str(tmp_path / "ckpt"), "--ig-steps", "4",
        "--out", str(out),
    ])
    rows = json.loads(out.read_text())
    assert len(rows) >= 1
    assert {"pathway", "p"} <= set(rows[0])
    # rows are the KM screen, sorted by log-rank p
    ps = [r["p"] for r in rows]
    assert ps == sorted(ps)
