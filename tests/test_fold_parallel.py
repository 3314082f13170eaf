"""Fold-vectorized CV (train/fold_parallel.py) == sequential driver.

The whole num_run x 5-fold experiment advances as ONE vmapped train step
(optionally sharded over a device mesh axis).  Same host RNG streams, same
per-unit jax RNG, same best-by-valid selection — pooled metrics must match
the sequential run_experiment.
"""
import numpy as np
import pytest

from multilevel_gnn_tpu.data.synthetic import make_synthetic_cohort
from multilevel_gnn_tpu.train.driver import run_experiment
from multilevel_gnn_tpu.train.fold_parallel import run_experiment_foldparallel

from test_data_pipeline import gbm_like_cfg


def _tiny_cfg(**kw):
    base = dict(
        epochs=2,
        num_run=1,
        batch_size=8,
        split_shaffle=True,
        split_seed=3,
        node_embedding_dim=4,
        hidden_channels=8,
        final_channels=4,
        head_dim=16,
    )
    base.update(kw)
    return gbm_like_cfg(**base)


def _check(seq, par):
    e = seq["check_epochs"][-1]
    for key in ("auc", "auc_by_loss", "auc_by_epoch", "acc"):
        np.testing.assert_allclose(
            par[key][e], seq[key][e], rtol=1e-5, atol=1e-6, err_msg=key
        )


def test_foldparallel_matches_sequential():
    cfg = _tiny_cfg()
    cohort = make_synthetic_cohort(cfg, seed=0, n_patients=50, n_pathways=5)
    seq = run_experiment(cfg, cohort)
    par = run_experiment_foldparallel(cfg, cohort)
    assert par["units"] == 5
    _check(seq, par)


def test_foldparallel_sharded_over_mesh():
    """unit axis sharded over 5 CPU devices == single-device vmap."""
    cfg = _tiny_cfg()
    cohort = make_synthetic_cohort(cfg, seed=0, n_patients=50, n_pathways=5)
    par = run_experiment_foldparallel(cfg, cohort)
    shd = run_experiment_foldparallel(cfg, cohort, devices=5)
    e = par["check_epochs"][-1]
    for key in ("auc", "auc_by_loss", "auc_by_epoch", "acc"):
        np.testing.assert_allclose(shd[key][e], par[key][e], rtol=1e-6,
                                   err_msg=key)


def test_foldparallel_multi_run():
    """2 runs x 5 folds = 10 lockstep units; run-level pooled stats match."""
    cfg = _tiny_cfg(num_run=2)
    cohort = make_synthetic_cohort(cfg, seed=0, n_patients=50, n_pathways=5)
    seq = run_experiment(cfg, cohort)
    par = run_experiment_foldparallel(cfg, cohort)
    assert par["units"] == 10
    _check(seq, par)


def test_foldparallel_weighted_loss_matches_sequential():
    """weighted_loss=True flips drop_last to False in the sequential driver
    (ceil(n/bs) batches/epoch incl. a ragged masked batch) — the lockstep
    loop must consume the same number of batches (review finding: it used
    floor and silently diverged)."""
    cfg = _tiny_cfg(weighted_loss=True, batch_size=6)  # 32 train -> 6 batches
    cohort = make_synthetic_cohort(cfg, seed=0, n_patients=50, n_pathways=5)
    seq = run_experiment(cfg, cohort)
    par = run_experiment_foldparallel(cfg, cohort)
    _check(seq, par)


def test_foldparallel_zero_train_batches():
    """batch_size > train split (kirc-style batch 64 on a tiny cohort):
    the sequential driver runs 0 train steps/epoch; the lockstep loop must
    do the same instead of raising StopIteration (review finding)."""
    cfg = _tiny_cfg(batch_size=64, epochs=1)
    cohort = make_synthetic_cohort(cfg, seed=0, n_patients=50, n_pathways=5)
    seq = run_experiment(cfg, cohort)
    par = run_experiment_foldparallel(cfg, cohort)
    _check(seq, par)


@pytest.mark.slow  # quick tier (VERDICT r4 Next #8): heavy CPU-mesh equivalence; covered by faster smokes in the quick tier
def test_foldparallel_checkpoint_resume_and_predict(tmp_path):
    """Checkpointed fold-parallel run resumed after an interruption ==
    the uninterrupted run; its per-unit checkpoints are readable by the
    predict entrypoint (same on-disk layout as the sequential driver)."""
    from multilevel_gnn_tpu.train.predict import predict_fold

    cfg = _tiny_cfg(epochs=4, ckpt_every=1)
    cohort = make_synthetic_cohort(cfg, seed=0, n_patients=50, n_pathways=5)
    full = run_experiment_foldparallel(cfg, cohort,
                                       ckpt_dir=str(tmp_path / "a"))

    # "interrupt" after epoch 2, then resume to epoch 4 from the same dir
    run_experiment_foldparallel(cfg.replace(epochs=2), cohort,
                                ckpt_dir=str(tmp_path / "b"))
    resumed = run_experiment_foldparallel(cfg, cohort,
                                          ckpt_dir=str(tmp_path / "b"),
                                          resume=True)
    e = full["check_epochs"][-1]
    for key in ("auc", "auc_by_loss", "auc_by_epoch", "acc"):
        np.testing.assert_allclose(resumed[key][e], full[key][e],
                                   rtol=1e-6, err_msg=key)

    # the fold-parallel checkpoints serve predictions directly
    res = predict_fold(cfg, cohort, str(tmp_path / "a"), run_i=0, fold_i=1,
                       split="test")
    assert len(res["prob"]) > 0 and 0.0 <= res["auc"] <= 1.0


def test_foldparallel_fold_scan_matches_per_step_arm():
    """The ONE-dispatch whole-experiment device loop == the per-step
    lockstep loop — same plans, same global step counter, same
    best-by-valid selection.  devices=1 drives the scan path's full
    shard_map machinery on a 1-device mesh; fold_scan=False forces the
    per-step loop on the same mesh.  Since r4 the one-dispatch loop also
    engages at devices=None (plain vmap — measured ~10x faster than the
    per-step loop, tools/bench_fold_decomp.py), so the no-devices run
    must take it AND still match."""
    cfg = _tiny_cfg(epochs=3)
    cohort = make_synthetic_cohort(cfg, seed=0, n_patients=50, n_pathways=5)
    scan = run_experiment_foldparallel(cfg, cohort, devices=1)
    assert scan["arm"] == "one-dispatch"
    per_step = run_experiment_foldparallel(
        cfg.replace(fold_scan=False), cohort, devices=1
    )
    assert per_step["arm"] == "per-step"
    scan_nodev = run_experiment_foldparallel(cfg, cohort)
    assert scan_nodev["arm"] == "one-dispatch"
    _check(per_step, scan)
    _check(scan_nodev, scan)
