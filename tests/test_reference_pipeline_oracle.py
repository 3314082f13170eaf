"""Run the ACTUAL reference data pipeline (dataloader/multiloader.py MyData
+ the train.py:290-307 per-fold derivation) as a value oracle against our
Cohort, on identical reference-format synthetic files.

This closes the last oracle gap: model forwards / losses / optimizer
trajectories already have real-reference parity tests
(test_reference_full_model.py), but the 1,067-LoC MyData loader — graph
construction, population filtering, centering, MI masks, per-pathway PCA,
per-fold edge re-selection, gene_pca_match, labels, class weights — was
only ever compared against our own reading of it.  Here the reference code
executes (via tests/pyg_shim.py for the PyG surface) and every fold-level
artifact is compared value-for-value:

  * patient population + binary labels      (multiloader.py:148, 331-337)
  * per-patient node features x             (predefine_data :949-992 after
                                             recalculate_edge :700 trims)
  * labels y (hard) + age                   (:1028-1040)
  * raw_indice slot map + tf_token          (:436-443)
  * per-fold MI mask + raw MI values        (multilevel_gnn.py:356-377)
  * masked per-pathway PCA seed components  (prepare_pca_result :455-495)
  * pathway_node_attr                       (recalculate_pca :575-580)
  * re-selected edge multiset + attrs       (recalculate_edge :625-686)
  * gene_pca_match                          (:608-615)
  * class weights                           (get_weight_balance :321-326)

Environment shims (all test-only, none affect the values under test):
pd.read_excel -> the .csv twin written by write_reference_format (openpyxl
is not installed); multiloader.Pool -> serial (the workers' dict-merge
semantics are order-independent, multiloader.py:301-303); cvxopt /
torchvision import stubs (pyg_shim.install)."""
import os
import pickle
import sys

import numpy as np
import pandas as pd
import pytest

import pyg_shim

pyg_shim.install()

from ref_pipeline import run_reference_pipeline  # noqa: E402

from multilevel_gnn_tpu.core.config import Config  # noqa: E402
from multilevel_gnn_tpu.data.loaders import load_cohort_from_files  # noqa: E402
from multilevel_gnn_tpu.data.synthetic import write_reference_format  # noqa: E402

N_PATIENTS, N_PATH, GPP, OVERLAP, N_EDGES = 48, 6, 12, 3, 260

# the GBM protocol knobs (configs/gbm.yaml == reference config/gbm.yaml),
# scaled to the tiny fixture; keys are IDENTICAL on both config surfaces so
# one dict drives reference argparse AND our typed Config.
SHARED = dict(
    cancer_type="gbm",
    model="multilevel_gnn",
    edge_type="grnboost2",
    use_column="stringdb::score",
    grn_edge_select_threshold=1e-5,
    weighted_edge=True,
    use_edge_attr=True,
    mute_edge="12",
    construct_cnv_mrna_edge=True,
    construct_mt_mrna_edge=True,
    reverse_mt_attr=True,
    pathway_global_node=True,
    z_mean=True,
    risk_threshold=24,
    mutual_info_mask=True,
    mutual_classif=True,
    mutual_neighbors=7,
    freeze_mutual_select_init=True,
    random_state=12345,
    drop_irr_pathway=True,
    pca_sim_dim=2,
    pca_dim=2,
    node_embedding=True,
    node_embedding_dim=8,
    use_age=True,
    weight_balance=True,
    gnn_name="sage",
    num_layers=2,
    hidden_channels=8,
    final_channels=4,
    final_head=2,
    head_dim=16,
    batch_size=8,
    split_shaffle=True,
)


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("refpipe"))
    overrides = dict(SHARED, pathway_num=N_PATH)
    ref = run_reference_pipeline(
        d, overrides,
        dict(seed=5, n_patients=N_PATIENTS, n_pathways=N_PATH,
             genes_per_pathway=GPP, overlap=OVERLAP, n_edges=N_EDGES),
    )
    dataset, train_idx = ref["dataset"], ref["train_idx"]
    mask, mi = ref["mask"], ref["mi"]
    edges, edge_attrs = ref["edges"], ref["edge_attrs"]
    gene_pca_match, weight, labels = (
        ref["gene_pca_match"], ref["weight"], ref["labels"]
    )

    # ---- our side: same files through the public loader + Cohort ----
    cfg = Config(epochs=2, num_run=1, **SHARED)
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
    fold = cohort.fold(np.asarray(train_idx), 0)

    return dict(
        dataset=dataset,
        ref_mask=np.asarray(mask),
        ref_mi=np.asarray(mi),
        ref_edges=np.asarray(edges),
        ref_edge_attrs=np.asarray(edge_attrs),
        ref_gpm=np.asarray(gene_pca_match),
        ref_weight=np.asarray(weight),
        cohort=cohort,
        fold=fold,
        train_idx=np.asarray(train_idx),
        labels=labels,
    )


def test_population_and_labels(oracle):
    ds, cohort = oracle["dataset"], oracle["cohort"]
    assert ds.patient_list == cohort.patients
    np.testing.assert_array_equal(oracle["labels"], cohort.labels())
    assert ds.get_node_num() == cohort.node_size
    # node universe maps identically (multiloader.py:249 sorted entrez)
    assert ds.node_map == cohort.node_map


def test_node_features_labels_age(oracle):
    ds, cohort = oracle["dataset"], oracle["cohort"]
    for i, pid in enumerate(ds.patient_list):
        data = ds.data_dict[pid]
        # post-recalculate x: (node_size + P, 3) (multiloader.py:700)
        ref_x = data.x.numpy().reshape(-1)
        np.testing.assert_allclose(ref_x, cohort.X[i], rtol=0, atol=1e-6)
        np.testing.assert_allclose(
            data.y.numpy().astype(np.float32), cohort.Y[i], atol=1e-7
        )
        assert float(data.age) == pytest.approx(float(cohort.ages[i]))


def test_slot_map_and_tf_token(oracle):
    ds, cohort = oracle["dataset"], oracle["cohort"]
    np.testing.assert_array_equal(
        ds.all_indice.numpy(), cohort.raw_indice
    )
    np.testing.assert_array_equal(
        np.asarray(ds.get_tf_token()), cohort.tf_token.astype(bool)
    )


def test_mutual_mask_and_mi(oracle):
    fold = oracle["fold"]
    np.testing.assert_array_equal(
        oracle["ref_mask"].reshape(-1), fold.info_mask.reshape(-1)
    )
    np.testing.assert_allclose(
        oracle["ref_mi"], fold.mutual_info, rtol=1e-9, atol=1e-12
    )


def test_pca_seed_and_pathway_attr(oracle):
    ds, fold = oracle["dataset"], oracle["fold"]
    # post-recalc pca_components only carries the mask-SELECTED rows;
    # set_pca_params scatters them into the zero-initialized (G, pca_dim)
    # param at mask>0 indices (reference multilevel_gnn.py:301-308).  Our
    # pca_seed is the already-scattered (G, pca_dim) table.
    ref_seed = np.zeros_like(np.asarray(fold.pca_seed))
    sel = oracle["ref_mask"].reshape(-1) > 0
    ref_seed[sel] = ds.pca_components.numpy()[:, : SHARED["pca_dim"]]
    np.testing.assert_allclose(ref_seed, fold.pca_seed, atol=1e-6)
    ref_attr = np.stack(
        [
            ds.data_dict[p].pathway_node_attr.numpy()[0]
            for p in ds.patient_list
        ]
    )
    ours = np.asarray(fold.pathway_node_attr).reshape(ref_attr.shape)
    np.testing.assert_allclose(ref_attr, ours, atol=1e-5)


def _edge_multiset(edge_index, edge_attr):
    return sorted(
        (int(s), int(d), float(a))
        for (s, d), a in zip(edge_index, edge_attr)
    )


def test_edges_and_gene_pca_match(oracle):
    cohort, fold = oracle["cohort"], oracle["fold"]
    # order differs (reference iterates python sets, multiloader.py:641);
    # compare as multisets of (src, dst, attr) — attrs to f32 (the
    # reference's tensorized dtype, multiloader.py:697) via allclose
    ref = _edge_multiset(
        oracle["ref_edges"], oracle["ref_edge_attrs"].reshape(-1)
    )
    edge_index, edge_attr, _ = cohort.build_edges(
        fold.info_mask, oracle["train_idx"]
    )
    ours = _edge_multiset(edge_index.T, np.asarray(edge_attr).reshape(-1))
    assert len(ref) == len(ours)
    assert [(s, d) for s, d, _ in ref] == [(s, d) for s, d, _ in ours]
    np.testing.assert_allclose(
        [a for *_, a in ref], [a for *_, a in ours], rtol=1e-6
    )
    np.testing.assert_array_equal(oracle["ref_gpm"], cohort.gene_pca_match)


def test_class_weight(oracle):
    # reference tiles (2,) -> (batch, 2) (multiloader.py:326)
    np.testing.assert_allclose(
        oracle["ref_weight"][0], oracle["fold"].class_weight, rtol=1e-6
    )
