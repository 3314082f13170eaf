"""CLI data-path resolution for reference users (reference opt.py:19-62
path flags, train.py:233-234 '{}'-formatting semantics).

A user switching from the reference has (a) YAMLs that may set explicit
per-file path flags and (b) a data directory with the reference's default
filenames (pathcnn_raw_mrna_pid_u133.csv, kegg_52.csv,
pathcnn_pathway_codes.pkl, ...).  Both must work through our CLI without
renaming files: explicit fields win (with cancer_type formatting and
--data-dir re-rooting of the reference's './data/' prefix); unset fields
fall back conventional-name-first, reference-name-second."""
import os

import numpy as np
import pytest

from multilevel_gnn_tpu.core.config import Config
from multilevel_gnn_tpu.data.synthetic import (
    make_synthetic_cohort,
    write_reference_format,
)
from multilevel_gnn_tpu.train.cli import _resolve_data_paths, make_cohort

from test_data_pipeline import gbm_like_cfg


def _link(src, dst):
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    os.link(src, dst)


def _reference_layout(tmp_path, seed=3, **kw):
    """write_reference_format output rearranged into the reference
    download's layout: per-cohort files under <root>/gbm/ with the
    reference's default filenames, shared files at <root>/."""
    src = str(tmp_path / "src")
    root = str(tmp_path / "refdata")
    write_reference_format(src, seed=seed, **kw)
    _link(f"{src}/raw_mrna.csv", f"{root}/gbm/pathcnn_raw_mrna_pid_u133.csv")
    _link(f"{src}/raw_cnv.csv", f"{root}/gbm/pathcnn_raw_cnv_pid.csv")
    _link(
        f"{src}/raw_methylation.csv",
        f"{root}/gbm/pathcnn_raw_methylation_pid.csv",
    )
    _link(f"{src}/clinical.pkl", f"{root}/gbm/pathcnn_clinical_data.pkl")
    _link(f"{src}/kegg.csv", f"{root}/kegg_52.csv")
    # the reference's pathway list is a PICKLE (multiloader.py:55-56)
    _link(f"{src}/pathways.pkl", f"{root}/pathcnn_pathway_codes.pkl")
    _link(
        f"{src}/grn_edges.tsv",
        f"{root}/gbm/pyscenic_adj_nes1.0_auc0.01_weighted_l1.tsv",
    )
    return root


def test_reference_named_data_dir(tmp_path):
    """--data-dir pointed at an untouched reference data directory loads
    via the fallback names, identically to the direct synthetic cohort."""
    root = _reference_layout(tmp_path, seed=3, n_patients=25, n_pathways=5)
    cfg = gbm_like_cfg(
        grn_edge_select_threshold=1e-5, use_column="importance"
    )
    cohort = make_cohort(cfg, synthetic=False, data_dir=root)
    assert cohort.n_pathways == 5
    direct = make_synthetic_cohort(cfg, seed=3, n_patients=25, n_pathways=5)
    np.testing.assert_allclose(cohort.X, direct.X, rtol=1e-5, atol=1e-6)


def test_explicit_path_fields_format_and_reroot(tmp_path):
    """Explicit reference-style path fields: '{}' formatted with
    cancer_type, './data/' re-rooted under --data-dir."""
    root = _reference_layout(tmp_path, seed=3, n_patients=25, n_pathways=5)
    cfg = gbm_like_cfg(
        grn_edge_select_threshold=1e-5,
        use_column="importance",
        raw_mrna_path="./data/{}/pathcnn_raw_mrna_pid_u133.csv",
        raw_cnv_path="./data/{}/pathcnn_raw_cnv_pid.csv",
        raw_methylation_path="./data/{}/pathcnn_raw_methylation_pid.csv",
        clinical_path="./data/{}/pathcnn_clinical_data.pkl",
        kegg_path="./data/kegg_52.csv",
        pathway_path="./data/pathcnn_pathway_codes.pkl",
        edge_path="./data/{}/pyscenic_adj_nes1.0_auc0.01_weighted_l1.tsv",
    )
    paths = _resolve_data_paths(cfg, root)
    assert paths["mrna_path"] == os.path.join(
        root, "gbm/pathcnn_raw_mrna_pid_u133.csv"
    )
    cohort = make_cohort(cfg, synthetic=False, data_dir=root)
    direct = make_synthetic_cohort(cfg, seed=3, n_patients=25, n_pathways=5)
    np.testing.assert_allclose(cohort.X, direct.X, rtol=1e-5, atol=1e-6)


def test_explicit_absolute_path_wins_verbatim(tmp_path):
    cfg = Config(raw_mrna_path="/abs/{}.csv", cancer_type="kirc")
    paths = _resolve_data_paths(cfg, str(tmp_path))
    assert paths["mrna_path"] == "/abs/kirc.csv"


def test_literal_braces_pass_verbatim(tmp_path):
    """A path with literal braces (e.g. the candidates table's '{ct}'
    style) must not raise an opaque format error (advisor r4)."""
    cfg = Config(raw_mrna_path="/abs/{ct}/mrna.csv", cancer_type="kirc")
    paths = _resolve_data_paths(cfg, str(tmp_path))
    assert paths["mrna_path"] == "/abs/{ct}/mrna.csv"


def test_conventional_names_still_win(tmp_path):
    """Our conventional layout keeps priority over reference names."""
    root = str(tmp_path)
    os.makedirs(f"{root}/gbm", exist_ok=True)
    for name in ("raw_mrna.csv", "pathcnn_raw_mrna_pid_u133.csv"):
        with open(f"{root}/gbm/{name}", "w") as f:
            f.write("x\n")
    cfg = Config()
    paths = _resolve_data_paths(cfg, root)
    assert paths["mrna_path"] == f"{root}/gbm/raw_mrna.csv"
    # missing files resolve to the conventional name (loader raises there)
    assert paths["clinical_path"] == f"{root}/gbm/clinical.pkl"


def test_pathway_pkl_list(tmp_path):
    import pickle

    from multilevel_gnn_tpu.data.loaders import load_pathway_list

    p = str(tmp_path / "codes.pkl")
    with open(p, "wb") as f:
        pickle.dump(["hsa04010", "hsa04020"], f)
    assert load_pathway_list(p) == ["hsa04010", "hsa04020"]


def test_ppi_and_merge_need_node_path():
    cfg = Config(edge_type="ppi")
    paths = _resolve_data_paths(cfg, "/nonexistent")
    assert paths["ppi_node_path"] is not None
    assert paths["grn_edge_path"] is None
    cfg = Config(edge_type="merge")
    paths = _resolve_data_paths(cfg, "/nonexistent")
    assert paths["ppi_node_path"] is not None
    assert paths["grn_edge_path"] is not None


def test_reference_yaml_loads_with_path_fields():
    """The shipped reference YAMLs parse; path fields default None."""
    cfg = Config.from_yaml("/root/reference/config/gbm.yaml")
    assert cfg.raw_mrna_path is None
    assert cfg.model == "multilevel_gnn"
    cfg2 = Config.from_dict(
        {"raw_mrna_path": "./data/{}/m.csv", "cancer_type": "lgg"}
    )
    assert cfg2.raw_mrna_path == "./data/{}/m.csv"
