"""Device-side epoch scan (cfg.epoch_scan, train/step.py train_epoch +
eval_scan) must be semantics-IDENTICAL to the per-step dispatch path: same
epoch_plan host RNG stream, same jax.random.fold_in(rng_key, step) keys,
same pooled CV metrics.  VERDICT r2 Next #1."""
import numpy as np
import pytest

from multilevel_gnn_tpu.data.synthetic import make_synthetic_cohort
from multilevel_gnn_tpu.train.driver import run_experiment

from test_data_pipeline import gbm_like_cfg


def _run_pair(**cfg_kw):
    """run_experiment with and without the epoch scan on identical cohorts."""
    outs = []
    for scan in (True, False):
        cfg = gbm_like_cfg(
            epochs=4,
            num_run=1,
            batch_size=8,
            split_shaffle=True,
            split_seed=3,
            node_embedding_dim=4,
            hidden_channels=8,
            final_channels=4,
            head_dim=16,
            epoch_scan=scan,
            **cfg_kw,
        )
        cohort = make_synthetic_cohort(cfg, seed=0, n_patients=50, n_pathways=5)
        outs.append(run_experiment(cfg, cohort))
    return outs


def _assert_equal(a, b, tol=0.0):
    for key in ("auc", "auc_by_loss", "auc_by_epoch", "acc"):
        for e in a["check_epochs"]:
            if tol:
                np.testing.assert_allclose(a[key][e], b[key][e], atol=tol)
            else:
                assert a[key][e] == b[key][e], (key, e, a[key][e], b[key][e])


@pytest.mark.slow  # quick tier (VERDICT r4 Next #8): heavy CPU-mesh equivalence; covered by faster smokes in the quick tier
def test_epoch_scan_matches_per_step():
    # with the defaults this exercises the WHOLE-FOLD device loop
    # (cfg.fold_scan) against the per-step dispatch path
    scan, loop = _run_pair()
    # identical compiled math on CPU: float-exact pooled metrics expected;
    # allow a tiny tolerance for cross-program fusion differences
    _assert_equal(scan, loop, tol=1e-6)


@pytest.mark.slow  # quick tier (VERDICT r4 Next #8): heavy CPU-mesh equivalence; covered by faster smokes in the quick tier
def test_fold_scan_matches_epoch_scan():
    """The one-dispatch-per-fold loop (cfg.fold_scan) == the per-epoch
    scan path: same epoch_plan stream, same fold_in(rng, step) keys, same
    best-by-valid tracking on the fetched per-epoch preds."""
    outs = []
    for fold_scan in (True, False):
        cfg = gbm_like_cfg(
            epochs=4, num_run=1, batch_size=8, split_shaffle=True,
            split_seed=3, node_embedding_dim=4, hidden_channels=8,
            final_channels=4, head_dim=16, epoch_scan=True,
            fold_scan=fold_scan,
        )
        cohort = make_synthetic_cohort(
            cfg, seed=0, n_patients=50, n_pathways=5
        )
        outs.append(run_experiment(cfg, cohort))
    _assert_equal(outs[0], outs[1], tol=1e-6)


@pytest.mark.slow  # quick tier (VERDICT r4 Next #8): heavy CPU-mesh equivalence; covered by faster smokes in the quick tier
def test_epoch_scan_matches_with_aug_and_sampler():
    """Covers the plan's mult array (random-variation aug) and the
    WeightedRandomSampler path — both consume the shared host RNG stream."""
    scan, loop = _run_pair(
        random_variation_aug=True,
        random_variation_prob=0.5,
        random_range=0.2,
        class_sample=True,
    )
    _assert_equal(scan, loop, tol=1e-6)


def test_epoch_scan_plan_rng_parity():
    """epoch_plan and iter_batches consume the np RNG identically, so a
    plan and a materialized iterator are interchangeable mid-stream."""
    from multilevel_gnn_tpu.train.driver import epoch_plan, iter_batches

    X = np.random.RandomState(0).rand(20, 12).astype(np.float32)
    Y = np.eye(2, dtype=np.float32)[np.arange(20) % 2]
    ages = np.arange(20, dtype=np.float32)
    idxs = np.arange(20)
    aug = {"prob": 0.5, "range": 0.3}

    r1 = np.random.RandomState(7)
    r2 = np.random.RandomState(7)
    plans = list(epoch_plan(X, idxs, 8, r1, True, False, None, aug))
    batches = list(
        iter_batches(X, Y, ages, idxs, 8, r2, True, False, None, aug)
    )
    assert len(plans) == len(batches)
    for (take, mask, mult), b in zip(plans, batches):
        np.testing.assert_array_equal(np.asarray(b.sample_mask), mask)
        np.testing.assert_array_equal(np.asarray(b.x), X[take] * mult)
        np.testing.assert_array_equal(np.asarray(b.y), Y[take])
    # the two RNGs must land in the same state
    s1, s2 = r1.get_state(), r2.get_state()
    np.testing.assert_array_equal(s1[1], s2[1])
    assert s1[2:] == s2[2:]


@pytest.mark.slow
def test_epoch_scan_with_checkpoint_resume(tmp_path):
    """Scan path + resume: interrupt after 2 epochs, resume, and match the
    uninterrupted scan run exactly (host RNG state round-trips through the
    checkpoint across the plan-based path too)."""
    kw = dict(
        epochs=4, num_run=1, batch_size=8, split_shaffle=True, split_seed=3,
        node_embedding_dim=4, hidden_channels=8, final_channels=4,
        head_dim=16, epoch_scan=True, ckpt_every=1, ckpt_keep=2,
    )
    cfg = gbm_like_cfg(**kw)
    cohort = make_synthetic_cohort(cfg, seed=0, n_patients=50, n_pathways=5)
    want = run_experiment(cfg, cohort)

    cfg2 = gbm_like_cfg(**kw)
    cohort2 = make_synthetic_cohort(cfg2, seed=0, n_patients=50, n_pathways=5)
    d = str(tmp_path / "ck")
    try:
        run_experiment(cfg2, cohort2, ckpt_dir=d, interrupt_after=[7])
    except KeyboardInterrupt:
        pass
    got = run_experiment(cfg2, cohort2, ckpt_dir=d, resume=True)
    for key in ("auc", "auc_by_loss"):
        for e in want["check_epochs"]:
            np.testing.assert_allclose(got[key][e], want[key][e], atol=1e-6)


def test_epoch_bucket_shares_executables():
    """Protocols with different epoch counts must land in the SAME padded
    epoch bucket when close (one compiled train_fold executable per
    protocol family), and the bucket sequence must be geometric so total
    distinct shapes stay O(log epochs)."""
    from multilevel_gnn_tpu.train.driver import epoch_bucket

    for n in range(1, 9):
        assert epoch_bucket(n) == 8
    # 10-epoch bench protocol and 12-epoch variant share one bucket
    assert epoch_bucket(10) == epoch_bucket(12) == 16
    for n in range(1, 300):
        b = epoch_bucket(n)
        assert b >= n
        assert b == epoch_bucket(b)  # idempotent: buckets are fixed points
    # geometric growth: few distinct buckets across a wide protocol range
    assert len({epoch_bucket(n) for n in range(1, 300)}) <= 12
