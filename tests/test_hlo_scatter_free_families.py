"""HLO scatter-free proof for every driver-reachable model family.

Extends tests/test_hlo_scatter_free.py (flagship + conv zoo) to the OTHER
model families the experiment driver runs — DeeperGCN (gene-level graph +
vnode edges), PathCNN (learnable-PCA, no GNN), and the VAE->DiffPool
fine-tune classifier — lowering the driver's OWN jitted train_step /
eval_step (train/driver.py:_shared_fns -> train/step.py:build_train_fns)
under the pallas backend and asserting zero stablehlo.scatter ops.

XLA scatter compiles pathologically on the target TPU (166 s measured for
one shape — CLAUDE.md); any reappearance in a family step is a perf
regression even when numerically correct.  MaxPool's select_and_scatter
reduce-window gradient is excluded (native TPU path).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multilevel_gnn_tpu.data.synthetic import make_synthetic_cohort
from multilevel_gnn_tpu.ops import spmm
from multilevel_gnn_tpu.train.driver import _shared_fns, iter_batches

from test_data_pipeline import gbm_like_cfg

pytestmark = pytest.mark.slow  # quick tier: per-family lowering proofs; the flagship scatter-free check stays quick (test_hlo_scatter_free.py)


@pytest.fixture
def pallas():
    spmm.set_backend("pallas")
    yield
    spmm.set_backend("xla")


def _scatter_count(txt: str) -> int:
    return txt.count('"stablehlo.scatter"')


def _lowered_steps(cfg, cohort, fold, X, raw):
    """Build the driver's jitted steps exactly as run_fold does and return
    (train_step_hlo, eval_step_hlo) lowered text."""
    steps_per_epoch = 1
    model, fns = _shared_fns(cfg, cohort, steps_per_epoch)
    train_idx = np.arange(min(16, len(cohort.patients)))
    batch = next(
        iter_batches(
            X, cohort.Y, cohort.ages, train_idx, cfg.batch_size,
            np.random.RandomState(0), False, False, raw=raw,
        )
    )
    rng = jax.random.PRNGKey(0)
    params, opt_state = fns.init_state(rng, batch, fold.ctx, steps_per_epoch)
    cw = jnp.asarray(fold.class_weight, jnp.float32)
    t_txt = fns.train_step.lower(
        params, opt_state, batch, fold.ctx, cw, rng
    ).as_text()
    e_txt = fns.eval_step.lower(params, batch, fold.ctx).as_text()
    return t_txt, e_txt


def _check(cfg, cohort, fold, X, raw):
    t_txt, e_txt = _lowered_steps(cfg, cohort, fold, X, raw)
    assert _scatter_count(t_txt) == 0, "scatter in train_step HLO"
    assert _scatter_count(e_txt) == 0, "scatter in eval_step HLO"


def test_deepergcn_step_hlo_scatter_free(pallas):
    cfg = gbm_like_cfg(
        model="deepergcn", conv="gen", gcn_aggr="softmax", block="res+",
        num_layers=2, hidden_channels=8, norm="layer", node_embedding=True,
        node_embedding_dim=4, use_edge_attr=True, global_edge="onehot",
        pathway_readout="maxpool", num_layer_head=2, pre_concat_age=True,
        epochs=1, num_run=1, batch_size=8,
    )
    cohort = make_synthetic_cohort(cfg, seed=0, n_patients=40, n_pathways=8)
    fold = cohort.deepergcn_fold(np.arange(24), 0)
    X = cohort.gene_level_features()
    raw = fold.pathway_node_attr.astype(np.float32)
    cfg = cfg.replace(
        pathway_num=cohort.n_pathways,
        pathway_edge_num=max(getattr(cohort, "pathway_edge_num", 0), 1),
        node_num=cohort.node_size + cohort.n_pathways,
    )
    _check(cfg, cohort, fold, X, raw)


def test_pathcnn_step_hlo_scatter_free(pallas):
    cfg = gbm_like_cfg(
        model="pathcnn", pathcnn_kernel_size=3, learnable_pca=True,
        epochs=1, num_run=1, batch_size=8,
    )
    cohort = make_synthetic_cohort(cfg, seed=0, n_patients=40, n_pathways=5)
    fold = cohort.fold(np.arange(24), 0)
    cfg = cfg.replace(
        pathway_num=cohort.n_pathways, node_num=cohort.num_nodes // 3
    )
    raw = cohort.raw_datas[
        [cohort.pca_patients.index(p) for p in cohort.patients]
    ].astype(np.float32)
    _check(cfg, cohort, fold, cohort.X, raw)


@pytest.mark.parametrize("kind", ["autoencoder", "mmd_vae", "vq_vae"])
def test_pretrain_step_hlo_scatter_free(pallas, kind):
    """AE / MMD-VAE / VQ-VAE pretraining steps (train/pretrain.py) lower
    scatter-free: the gene->PCA gather rides gather_rows, the VQ codebook
    lookup rides the one-hot matmul (its gradient is the transposed matmul,
    not scatter-add)."""
    import jax as _jax

    from multilevel_gnn_tpu.train.pretrain import build_pretrain

    cfg = gbm_like_cfg(
        model="multilevel_gnn", decoder_type="foreach", decoder_dim=16,
        epochs=1, num_run=1, batch_size=8, hidden_channels=8,
        final_channels=4, node_embedding_dim=4,
    )
    cohort = make_synthetic_cohort(cfg, seed=0, n_patients=24, n_pathways=5)
    s = build_pretrain(cfg, cohort, kind)
    txt = s["step"].lower(
        s["params"], s["opt_state"], s["b0"], _jax.random.PRNGKey(0)
    ).as_text()
    assert _scatter_count(txt) == 0, f"scatter in {kind} pretrain-step HLO"


def test_vae_finetune_step_hlo_scatter_free(pallas):
    cfg = gbm_like_cfg(
        model="vae_finetune", decoder_type="foreach", decoder_dim=16,
        epochs=1, num_run=1, batch_size=8,
        reorder_pathway=True,  # covers the permute_take reorder path
        reorder_type="diff_pooling", diff_pooling_layer=1,
        diff_pooling_hidden_dim=8, diff_pooling_output_dim=8,
        hidden_channels=8, final_channels=4, node_embedding_dim=4,
        head_dim=16,
    )
    cohort = make_synthetic_cohort(cfg, seed=0, n_patients=40, n_pathways=5)
    cfg = cfg.replace(
        slot_sizes=cohort.slot_sizes(),
        pathway_num=cohort.n_pathways,
        node_num=cohort.num_nodes // 3,
    )
    fold = cohort.fold(np.arange(24), 0)
    _check(cfg, cohort, fold, cohort.X, None)
