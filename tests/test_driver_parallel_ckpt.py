"""Mesh-parallel CV driver + checkpoint/resume (VERDICT r1 items #4, #7).

The sharded experiment path must reproduce the single-device experiment
(GSPMD inserts the collectives; the math is identical), and an interrupted
experiment resumed from checkpoints must produce identical pooled metrics
to an uninterrupted run (reference utils/ckpt_util.py:9-104 role, SURVEY.md
§5.3/5.4 deterministic-resume design).
"""
import numpy as np
import pytest

from multilevel_gnn_tpu.train.driver import run_experiment

from test_data_pipeline import gbm_like_cfg
from multilevel_gnn_tpu.data.synthetic import make_synthetic_cohort

pytestmark = pytest.mark.slow  # quick tier (VERDICT r4 Next #8): heavy CPU-mesh equivalence; covered by faster smokes in the quick tier


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


@pytest.fixture(scope="module")
def cohort_and_cfg():
    cfg = _tiny_cfg()
    cohort = make_synthetic_cohort(cfg, seed=0, n_patients=50, n_pathways=5)
    return cfg, cohort


def test_mesh_experiment_matches_single_device(cohort_and_cfg):
    """--mesh 4x2 through the driver == single-device, all pooled metrics."""
    cfg, cohort = cohort_and_cfg
    want = run_experiment(cfg, cohort)
    got = run_experiment(
        cfg.replace(mesh_data_axis=4, mesh_model_axis=2), cohort
    )
    e = want["check_epochs"][-1]
    for key in ("auc", "auc_by_loss", "auc_by_epoch", "acc"):
        np.testing.assert_allclose(
            got[key][e], want[key][e], rtol=1e-5, atol=1e-6, err_msg=key
        )


def test_mesh_experiment_deepergcn(cohort_and_cfg):
    """DeeperGCN (no learnable-PCA leaf, aux=None) through the mesh path —
    the family the round-1 duplicated parallel loss crashed on."""
    cfg = gbm_like_cfg(
        model="deepergcn", conv="gen", gcn_aggr="softmax", block="res+",
        num_layers=2, hidden_channels=8, norm="layer", node_embedding=True,
        node_embedding_dim=4, use_edge_attr=True, global_edge="onehot",
        pathway_readout="maxpool", num_layer_head=2, pre_concat_age=True,
        epochs=1, num_run=1, batch_size=8, split_shaffle=True, split_seed=1,
    )
    cohort = make_synthetic_cohort(cfg, seed=0, n_patients=40, n_pathways=8)
    want = run_experiment(cfg, cohort)
    got = run_experiment(
        cfg.replace(mesh_data_axis=2, mesh_model_axis=2), cohort
    )
    e = want["check_epochs"][-1]
    np.testing.assert_allclose(got["auc"][e], want["auc"][e], rtol=1e-5)


def test_parallel_loss_matches_shared_builder(cohort_and_cfg):
    """make_parallel_train_step rides train/step.py:make_loss_fn — spot-check
    the DiffPool/VAE family (extra_loss != 0) builds and runs under a mesh."""
    import jax.numpy as jnp

    from multilevel_gnn_tpu.models import get_model
    from multilevel_gnn_tpu.parallel import make_mesh, make_parallel_train_step
    from multilevel_gnn_tpu.train.step import build_train_fns, make_optimizer
    from multilevel_gnn_tpu.train.driver import iter_batches

    cfg = _tiny_cfg(
        model="vae_finetune", decoder_type="foreach", decoder_dim=16,
        reorder_type="diff_pooling", diff_pooling_layer=1,
        diff_pooling_hidden_dim=8, diff_pooling_output_dim=8,
    )
    cohort = make_synthetic_cohort(cfg, seed=0, n_patients=24, n_pathways=5)
    cfg = cfg.replace(
        slot_sizes=cohort.slot_sizes(),
        node_num=cohort.num_nodes // 3,
        pathway_num=cohort.n_pathways,
    )
    fold = cohort.fold(np.arange(16), 0)
    model = get_model(cfg.model)(cfg)
    fns = build_train_fns(model, cfg)
    batch = next(
        iter_batches(
            cohort.X, cohort.Y, cohort.ages, np.arange(16), cfg.batch_size,
            np.random.RandomState(0), False, False,
        )
    )
    import jax

    params, opt_state = fns.init_state(
        jax.random.PRNGKey(0), batch, fold.ctx, 1
    )
    cw = jnp.asarray(fold.class_weight, jnp.float32)
    rng = jax.random.PRNGKey(1)
    p1, _, loss1 = fns.train_step(
        jax.tree.map(jnp.copy, params), jax.tree.map(jnp.copy, opt_state),
        batch, fold.ctx, cw, rng,
    )

    optimizer = make_optimizer(cfg, steps_per_epoch=1)
    mesh = make_mesh(1, 1, devices=jax.devices()[:1])
    pstep = make_parallel_train_step(model, cfg, mesh, optimizer)
    p2, _, loss2 = pstep(
        jax.tree.map(jnp.copy, params), optimizer.init(params),
        batch, fold.ctx, cw, rng,
    )
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )


def test_checkpoint_resume_identical(tmp_path, cohort_and_cfg):
    """Kill a CV run mid-fold, resume, final pooled metrics identical."""
    cfg, cohort = cohort_and_cfg
    cfg = cfg.replace(ckpt_every=1)
    want = run_experiment(cfg, cohort)

    ckpt_dir = str(tmp_path / "ckpt")
    # 5 folds x 2 epochs = 10 epoch-units; interrupt after 3 -> mid fold 1
    with pytest.raises(KeyboardInterrupt):
        run_experiment(
            cfg, cohort, ckpt_dir=ckpt_dir, interrupt_after=[3]
        )
    got = run_experiment(cfg, cohort, ckpt_dir=ckpt_dir, resume=True)

    e = want["check_epochs"][-1]
    for key in ("auc", "auc_by_loss", "auc_by_epoch", "acc", "acc_by_loss"):
        np.testing.assert_allclose(
            got[key][e], want[key][e], rtol=0, atol=1e-12, err_msg=key
        )


def test_foldscan_ckpt_resume(tmp_path, cohort_and_cfg, caplog):
    """Checkpoint-enabled CV keeps the whole-fold scan (VERDICT r3 weak #5).

    With the default fold-boundary cadence (cfg.ckpt_every=0), enabling a
    ckpt dir must NOT disengage the fold scan; one complete orbax pair is
    saved per completed fold, metrics are bit-identical to the no-ckpt run,
    and resume covers the crash window where the fold checkpoint was
    written but the experiment-level FoldResult record was lost."""
    import logging
    import os

    cfg, cohort = cohort_and_cfg  # ckpt_every defaults to 0 (fold boundary)
    assert cfg.ckpt_every == 0 and cfg.fold_scan
    want = run_experiment(cfg, cohort)

    ckpt_dir = str(tmp_path / "ckpt_foldscan")
    with caplog.at_level(logging.INFO):
        got = run_experiment(cfg, cohort, ckpt_dir=ckpt_dir)
    assert any("fold-scan" in r.getMessage() for r in caplog.records), (
        "fold scan must stay engaged under fold-boundary checkpointing"
    )
    e = want["check_epochs"][-1]
    for key in ("auc", "auc_by_loss", "auc_by_epoch", "acc"):
        np.testing.assert_allclose(
            got[key][e], want[key][e], rtol=0, atol=1e-12, err_msg=key
        )
    from multilevel_gnn_tpu.train import checkpoint as C

    for fold_i in range(5):
        tag = os.path.join(ckpt_dir, f"run0_fold{fold_i}")
        assert C.latest_resumable_step(tag) == cfg.epochs, tag

    # crash window: fold ckpt on disk, FoldResult record lost -> resume
    # restores the fold's results from the checkpoint without retraining
    os.remove(os.path.join(ckpt_dir, "result_run0_fold2.npy"))
    got2 = run_experiment(cfg, cohort, ckpt_dir=ckpt_dir, resume=True)
    for key in ("auc", "auc_by_loss", "auc_by_epoch", "acc"):
        np.testing.assert_allclose(
            got2[key][e], want[key][e], rtol=0, atol=1e-12, err_msg=key
        )


def test_halo_experiment_matches_single_device(cohort_and_cfg):
    """--mesh 1x4 + halo_exchange through the driver == single-device.

    The boundary-only halo path (parallel/halo.py, wired via
    cfg.halo_exchange -> Graph.halo + ops.spmm.set_parallel_mesh) replaces
    GSPMD's full (N, C) partial all-reduce per conv with an all_to_all of
    boundary rows; the aggregation itself is mathematically identical, so
    every pooled metric must match the single-device experiment."""
    from multilevel_gnn_tpu.ops import spmm

    cfg, cohort = cohort_and_cfg
    want = run_experiment(cfg, cohort)
    try:
        got = run_experiment(
            cfg.replace(
                mesh_data_axis=1, mesh_model_axis=4, halo_exchange=True
            ),
            cohort,
        )
    finally:
        spmm.set_parallel_mesh(None)
    e = want["check_epochs"][-1]
    for key in ("auc", "auc_by_loss", "auc_by_epoch", "acc"):
        np.testing.assert_allclose(
            got[key][e], want[key][e], rtol=1e-5, atol=1e-6, err_msg=key
        )
