"""Data-pipeline tests on synthetic cohorts (SURVEY.md §4.4): MI masks,
PCA seeding, edge selection semantics, labels/weights, and a full flagship
forward on pipeline output."""
import numpy as np
import jax
import jax.numpy as jnp

from multilevel_gnn_tpu.core.batch import Batch
from multilevel_gnn_tpu.core.config import Config
from multilevel_gnn_tpu.data.synthetic import make_synthetic_cohort
from multilevel_gnn_tpu.models.multilevel_gnn import MultilevelGNN, seed_pca_params


def gbm_like_cfg(**kw):
    base = dict(
        model="multilevel_gnn",
        gnn_name="sage",
        gnn_act="leakyrelu",
        num_layers=2,
        hidden_channels=16,
        final_channels=8,
        node_embedding=True,
        node_embedding_dim=8,
        pca_dim=2,
        pca_sim_dim=2,
        pathway_pool_dim=2,
        pca_pool_dim=2,
        conv_channel_list=[8, 16],
        conv_kernel_list=[1, 1],
        head_dim=32,
        use_age=True,
        value_att_mask=True,
        mutual_info_mask=True,
        mutual_classif=True,
        mutual_neighbors=3,
        freeze_mutual_select_init=True,
        random_state=12345,
        pca_match_mask=True,
        weighted_edge=True,
        construct_cnv_mrna_edge=True,
        construct_mt_mrna_edge=True,
        reverse_mt_attr=True,
        mute_edge="12",
        drop_irr_pathway=True,
        init_with_pca=True,
        weight_balance=True,
        risk_threshold=24,
        pathway_global_node=True,
        z_mean=True,
        feature_drop=True,
    )
    base.update(kw)
    return Config(**base)


def test_cohort_build_and_fold():
    cfg = gbm_like_cfg()
    cohort = make_synthetic_cohort(cfg, seed=0, n_patients=40, n_pathways=6)
    assert cohort.n_pathways == 6
    # node slots: 3 * (genes + pathways-as-global-nodes)
    assert cohort.num_nodes == 3 * (cohort.node_size + 6)
    assert cohort.X.shape == (len(cohort.patients), cohort.num_nodes)
    assert cohort.Y.shape[1] == 2
    # pathway zero slots are all-zero
    tail = cohort.X[:, 3 * cohort.node_size :]
    assert np.all(tail == 0)

    labels = cohort.labels()
    assert set(labels.tolist()) <= {0, 1}

    train_idx = np.arange(0, int(0.6 * len(cohort.patients)))
    fold = cohort.fold(train_idx, fold_i=0)

    # MI mask deterministic across calls (frozen random_state + fold cache)
    mask2, _ = cohort.mutual_mask(train_idx, 0)
    np.testing.assert_array_equal(fold.info_mask, mask2)

    # PCA seed only nonzero at selected rows
    unsel = fold.info_mask[:, 0] == 0
    assert np.all(fold.pca_seed[unsel] == 0)

    # class weight: max/count ratio, weight 1 for majority class
    assert fold.class_weight.min() == 1.0
    assert fold.class_weight.max() >= 1.0

    g = fold.ctx.graph
    assert g.n_edges > 0
    # mute_edge="12": intra-omics edges only for omics 0 => node slot % 3 == 0
    send = np.asarray(g.senders)[: g.n_edges]
    recv = np.asarray(g.receivers)[: g.n_edges]
    attr = np.asarray(g.edge_attr)[: g.n_edges, 0]
    # self loops were appended (sage); exclude them
    real = send != recv
    cross = attr[real][np.asarray(send[real] % 3 != recv[real] % 3)]
    intra = (send[real] % 3 == 0) & (recv[real] % 3 == 0)
    same_gene_cross = send[real] // 3 == recv[real] // 3
    assert np.all(intra | same_gene_cross)
    # mt->mrna cross edges carry attr -1 (reverse_mt_attr)
    mt_cross = (send[real] % 3 == 2) & (recv[real] % 3 == 0) & same_gene_cross
    if mt_cross.any():
        assert np.all(attr[real][mt_cross] == -1.0)
    cnv_cross = (send[real] % 3 == 1) & (recv[real] % 3 == 0) & same_gene_cross
    if cnv_cross.any():
        assert np.all(attr[real][cnv_cross] == 1.0)


def test_mute_edge_variants():
    cfg = gbm_like_cfg(mute_edge="", construct_cnv_mrna_edge=False,
                       construct_mt_mrna_edge=False)
    cohort = make_synthetic_cohort(cfg, seed=1, n_patients=30, n_pathways=5)
    train_idx = np.arange(0, 20)
    mask, _ = cohort.mutual_mask(train_idx, 0)
    ei, ea, intra = cohort.build_edges(mask, train_idx)
    # all three omics planes present with no muting (probabilistically sure)
    planes = set((ei[0] % 3).tolist())
    assert planes <= {0, 1, 2} and len(planes) >= 2
    # no cross-omics edges requested => src/dst always same plane
    assert np.all(ei[0] % 3 == ei[1] % 3)


def test_soft_labels():
    cfg = gbm_like_cfg(soft_label=True)
    cohort = make_synthetic_cohort(cfg, seed=2, n_patients=30, n_pathways=5)
    s = cohort.Y.sum(axis=1)
    np.testing.assert_allclose(s, np.ones_like(s), rtol=1e-5)


def test_flagship_forward_on_pipeline_output():
    cfg = gbm_like_cfg()
    cohort = make_synthetic_cohort(cfg, seed=0, n_patients=40, n_pathways=6)
    cfg = cfg.replace(pathway_num=cohort.n_pathways, node_num=cohort.num_nodes // 3)
    train_idx = np.arange(0, 24)
    fold = cohort.fold(train_idx, fold_i=0)

    B = 4
    batch = Batch(
        x=jnp.asarray(cohort.X[:B]),
        y=jnp.asarray(cohort.Y[:B]),
        age=jnp.asarray(cohort.ages[:B]),
        sample_mask=jnp.ones(B, bool),
    )
    model = MultilevelGNN(cfg)
    params = model.init(jax.random.PRNGKey(0), batch, fold.ctx, False)
    params = seed_pca_params(params, jnp.asarray(fold.pca_seed))
    pred, feat = model.apply(params, batch, fold.ctx, False)
    assert pred.shape == (B, 2)
    assert bool(jnp.isfinite(pred).all())
    assert feat.shape == (B, cfg.final_channels, cohort.n_pathways, 3 * cfg.pca_dim)


def test_reference_format_roundtrip(tmp_path):
    from multilevel_gnn_tpu.data.synthetic import write_reference_format
    from multilevel_gnn_tpu.data.loaders import load_cohort_from_files

    d = str(tmp_path)
    write_reference_format(d, seed=3, n_patients=25, n_pathways=5)
    cfg = gbm_like_cfg(grn_edge_select_threshold=1e-5, use_column="importance")
    cohort = load_cohort_from_files(
        f"{d}/raw_mrna.csv",
        f"{d}/raw_cnv.csv",
        f"{d}/raw_methylation.csv",
        f"{d}/clinical.pkl",
        f"{d}/kegg.csv",
        f"{d}/pathways.txt",
        f"{d}/grn_edges.tsv",
        cfg,
    )
    assert cohort.n_pathways == 5
    assert len(cohort.patients) > 0
    direct = make_synthetic_cohort(cfg, seed=3, n_patients=25, n_pathways=5)
    np.testing.assert_allclose(cohort.X, direct.X, rtol=1e-5, atol=1e-6)
