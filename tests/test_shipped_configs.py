"""The three shipped cohort protocols (configs/{gbm,kirc,lgg}.yaml —
semantically matched to reference config/*.yaml) run end-to-end through the
real driver on a synthetic cohort.

Guards config-field regressions: KIRC/LGG exercise pca_dim=3,
reorder_pathway (the permute_take path), selected_similarity, pooling
dims, lr schedule step=140, batch 64 — none of which the GBM-based tests
touch.
"""
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from multilevel_gnn_tpu.core.config import Config
from multilevel_gnn_tpu.data.synthetic import make_synthetic_cohort
from multilevel_gnn_tpu.train.driver import run_experiment


@pytest.mark.slow
@pytest.mark.parametrize("cohort_name", ["gbm", "kirc", "lgg"])
def test_shipped_config_runs(cohort_name):
    cfg = Config.from_yaml(
        os.path.join(REPO, "configs", f"{cohort_name}.yaml"),
        num_run=1, epochs=2, batch_size=8,
        # CPU test lane: the pallas backend needs a TPU (runtime falls
        # back anyway); keep shapes small
        kernel_backend="xla", spmm_bf16=False, compute_dtype=None,
        windowed_spmm=False,
    )
    cohort = make_synthetic_cohort(cfg, seed=0, n_patients=40, n_pathways=6)
    res = run_experiment(cfg, cohort)
    e = res["check_epochs"][-1]
    assert np.isfinite(res["auc"][e])
    assert np.isfinite(res["acc"][e])
    assert res["auc"][e] >= 0.0


@pytest.mark.slow
def test_merge_edge_type_through_driver():
    """edge_type='merge' end to end: the cohort builds the fold-independent
    secondary GRN graph (Cohort.merge_graph2, reference process_grn_edge
    :276-289 incl. its gene-index quirk) and the flagship trains on both
    edge lists with a shared stack."""
    cfg = Config.from_yaml(
        os.path.join(REPO, "configs", "gbm.yaml"),
        num_run=1, epochs=2, batch_size=8, edge_type="merge",
        kernel_backend="xla", spmm_bf16=False, compute_dtype=None,
        windowed_spmm=False,
    )
    cohort = make_synthetic_cohort(cfg, seed=3, n_patients=40, n_pathways=6)
    assert cohort.edges2 is not None
    res = run_experiment(cfg, cohort)
    e = res["check_epochs"][-1]
    assert np.isfinite(res["auc"][e])


@pytest.mark.slow
@pytest.mark.parametrize("cohort_name", ["kirc", "lgg"])
def test_shipped_config_foldparallel_matches_sequential(cohort_name):
    """Fold-vectorized CV on the KIRC/LGG protocols (pca_dim 3,
    reorder_pathway permute_take, pooling dims — statics the GBM-based
    fold-parallel tests don't touch) == the sequential driver."""
    from multilevel_gnn_tpu.train.fold_parallel import (
        run_experiment_foldparallel,
    )

    cfg = Config.from_yaml(
        os.path.join(REPO, "configs", f"{cohort_name}.yaml"),
        num_run=1, epochs=2, batch_size=8,
        kernel_backend="xla", spmm_bf16=False, compute_dtype=None,
        windowed_spmm=False,
    )
    cohort = make_synthetic_cohort(cfg, seed=0, n_patients=40, n_pathways=6)
    seq = run_experiment(cfg, cohort)
    par = run_experiment_foldparallel(cfg, cohort)
    e = seq["check_epochs"][-1]
    for key in ("auc", "auc_by_loss", "acc"):
        np.testing.assert_allclose(
            par[key][e], seq[key][e], rtol=1e-5, atol=1e-6, err_msg=key
        )
