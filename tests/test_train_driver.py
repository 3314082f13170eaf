"""End-to-end CV training on a tiny synthetic cohort (SURVEY.md §4.6) +
metric implementation checks."""
import numpy as np

from multilevel_gnn_tpu.core.config import Config
from multilevel_gnn_tpu.data.synthetic import make_synthetic_cohort
from multilevel_gnn_tpu.train import metrics as M
from multilevel_gnn_tpu.train.driver import run_experiment

from test_data_pipeline import gbm_like_cfg


def test_roc_auc_matches_sklearn(rng):
    from sklearn.metrics import roc_auc_score

    for _ in range(5):
        y = rng.rand(50) > 0.5
        if y.all() or not y.any():
            continue
        s = rng.rand(50)
        s[:10] = s[0]  # ties
        np.testing.assert_allclose(M.roc_auc(y, s), roc_auc_score(y, s), rtol=1e-9)


def test_end_to_end_cv_run():
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
    results = run_experiment(cfg, cohort)
    assert results["check_epochs"] == [5]
    auc = results["auc"][5]
    acc = results["acc"][5]
    assert 0.0 <= auc <= 1.0
    assert 0.0 <= acc <= 1.0
    assert np.isfinite(results["auc_by_loss"][5])
    assert results["wall_time_s"] > 0


def test_cv_driver_with_deepergcn():
    """BASELINE config #2: DeeperGCN through the full CV protocol."""
    cfg = gbm_like_cfg(
        model="deepergcn", conv="gen", gcn_aggr="softmax", block="res+",
        num_layers=2, hidden_channels=8, norm="layer", node_embedding=True,
        node_embedding_dim=4, use_edge_attr=True, global_edge="onehot",
        pathway_readout="maxpool", num_layer_head=2, pre_concat_age=True,
        epochs=2, num_run=1, batch_size=8, split_shaffle=True, split_seed=1,
    )
    cohort = make_synthetic_cohort(cfg, seed=0, n_patients=40, n_pathways=8)
    res = run_experiment(cfg, cohort)
    e = res["check_epochs"][-1]
    assert 0.0 <= res["auc"][e] <= 1.0
    assert np.isfinite(res["acc"][e])


def test_cv_driver_vae_finetune_with_pretrain():
    """BASELINE config #5: VAE pretraining -> DiffPool fine-tune classifier
    through the full CV protocol."""
    cfg = gbm_like_cfg(
        model="vae_finetune", decoder_type="foreach", decoder_dim=16,
        epochs=2, num_run=1, batch_size=8, split_shaffle=True, split_seed=1,
        reorder_type="diff_pooling", diff_pooling_layer=1,
        diff_pooling_hidden_dim=8, diff_pooling_output_dim=8,
        hidden_channels=8, final_channels=4, node_embedding_dim=4,
        head_dim=16,
    )
    cohort = make_synthetic_cohort(cfg, seed=0, n_patients=40, n_pathways=5)
    cfg = cfg.replace(slot_sizes=cohort.slot_sizes())
    res = run_experiment(cfg, cohort, pretrain="vae", pretrain_epochs=1)
    e = res["check_epochs"][-1]
    assert 0.0 <= res["auc"][e] <= 1.0


def test_fold_setup_cache_and_prefetch_equivalence(monkeypatch):
    """run_experiment caches fold setups across runs (splits are identical
    per run — the reference re-derives them num_run times, train.py:258-299)
    and prefetches the next fold on a thread.  Both must be value-neutral:
    a 2-run experiment derives each fold ONCE, and threaded prefetch
    reproduces the inline (fold_prefetch=False) pooled metrics exactly."""
    import multilevel_gnn_tpu.train.driver as drv

    def build(prefetch):
        cfg = gbm_like_cfg(
            epochs=2, num_run=2, batch_size=8, split_shaffle=True,
            split_seed=3, node_embedding_dim=4, hidden_channels=8,
            final_channels=4, head_dim=16, fold_prefetch=prefetch,
        )
        cohort = make_synthetic_cohort(cfg, seed=0, n_patients=40,
                                       n_pathways=5)
        return cfg, cohort

    calls = []
    real_setup = drv.fold_setup

    def counting_setup(cfg, cohort, train_idx, fold_i):
        calls.append(fold_i)
        return real_setup(cfg, cohort, train_idx, fold_i)

    monkeypatch.setattr(drv, "fold_setup", counting_setup)
    cfg, cohort = build(prefetch=True)
    res_threaded = run_experiment(cfg, cohort)
    # 2 runs x 5 folds, each fold derived exactly once
    assert sorted(calls) == [0, 1, 2, 3, 4]

    calls.clear()
    cfg, cohort = build(prefetch=False)
    res_inline = run_experiment(cfg, cohort)
    assert sorted(calls) == [0, 1, 2, 3, 4]

    for k in ("auc", "acc", "auc_by_loss", "acc_by_loss"):
        for e, v in res_threaded[k].items():
            np.testing.assert_allclose(v, res_inline[k][e], err_msg=k)
