"""File loaders for reference-format cohorts.

Parses the on-disk layout the reference consumes (reference opt.py:13-97
path flags; dataloader/multiloader.py:178-274 graph parsers):

  * omics CSVs (patients x entrez columns), clinical pickle
  * KEGG table CSV (PathwayID, Symbol, Entrezid)
  * ordered pathway list (txt / xlsx first column)
  * GRNBoost2 TSV (TF, target, importance) — init_graph_grnboost2 :220-274
  * STRING PPI node/edge CSVs ("A (pp) B" rows) — init_graph :178-218

A C++ fast path for the (large) edge TSV/CSV parsing lives in csrc/ and is
used automatically when built (see data/native.py).
"""
from __future__ import annotations

import logging
import pickle
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd

from multilevel_gnn_tpu.core.config import Config
from multilevel_gnn_tpu.data.cohort import Cohort

log = logging.getLogger(__name__)


def drop_na_line(df: pd.DataFrame, percent: float = 0.9) -> pd.DataFrame:
    """Drop rows that are >= percent NaN (reference multiloader.py:892-893)."""
    return df.loc[df.isnull().sum(axis=1) <= len(df.columns) * percent]


def load_pathway_list(path: str) -> List[str]:
    """Ordered used-pathway list: txt (one code per line), xlsx first
    column, or the reference's pickled list (opt.py:60
    pathcnn_pathway_codes.pkl, loaded at multiloader.py:55-56)."""
    if path.endswith(".pkl"):
        with open(path, "rb") as f:
            return list(pickle.load(f))
    if path.endswith(".xlsx"):
        return pd.read_excel(path, header=None)[0].tolist()
    with open(path) as f:
        return [l.strip() for l in f if l.strip()]


def symbol_to_entrez(kegg: pd.DataFrame) -> Dict[str, int]:
    out = {}
    for r in kegg.itertuples():
        out.setdefault(r.Symbol, int(r.Entrezid))
    return out


def in_same_pathway(
    source_id: int, end_id: int, kegg: pd.DataFrame, pathway_codes
) -> bool:
    """Reference MyData.in_same_pathway (multiloader.py:363-371), quirks
    preserved: `id in kegg['Entrezid']` tests the Series INDEX (the row
    positions under the default RangeIndex), not the entrez values — so
    ids >= len(kegg) always fail membership and the edge is dropped; and
    only the SOURCE pathway is checked against pathway_codes (the end
    node's membership in the used-pathway list is never tested)."""
    if source_id not in kegg["Entrezid"] or end_id not in kegg["Entrezid"]:
        return False
    src_pw = kegg[kegg["Entrezid"] == source_id]["PathwayID"].unique()
    end_pw = kegg[kegg["Entrezid"] == end_id]["PathwayID"].unique()
    end_set = set(end_pw)
    for p in src_pw:
        if p in pathway_codes and p in end_set:
            return True
    return False


def parse_grnboost2_edges(
    path: str,
    kegg: pd.DataFrame,
    cfg: Config,
    pathways=None,
) -> Tuple[Dict[int, List[Tuple[int, int]]], Dict[int, List[float]]]:
    """GRNBoost2 TSV -> entrez-keyed edge dict (reference :220-274).

    Filters: importance >= grn_edge_select_threshold; zero/NaN importance
    dropped when use_column is set; both endpoints must map to kegg entrez;
    with cfg.pretain_only_pathway_edge, same-pathway pairs only (:264).
    """
    try:
        from multilevel_gnn_tpu.data import native

        parsed = native.parse_edge_tsv(path)
    except Exception:
        parsed = None
    sym2ent = symbol_to_entrez(kegg)
    edges: Dict[int, List[Tuple[int, int]]] = {}
    attrs: Dict[int, List[float]] = {}
    count = 0
    if parsed is not None:
        srcs, dsts, vals = parsed
        it = zip(srcs, dsts, vals)
    else:
        df = pd.read_csv(path, sep="\t").fillna(0)
        it = df.itertuples(index=False)
    for src, dst, val in it:
        if (
            cfg.grn_edge_select_threshold is not None
            and val < cfg.grn_edge_select_threshold
        ):
            continue
        if src not in sym2ent or dst not in sym2ent:
            continue
        if cfg.use_column is not None and (np.isnan(val) or val == 0):
            continue
        s, d = sym2ent[src], sym2ent[dst]
        if cfg.pretain_only_pathway_edge and not in_same_pathway(
            s, d, kegg, pathways or []
        ):
            continue
        edges.setdefault(s, []).append((s, d))
        attrs.setdefault(s, []).append(float(val))
        count += 1
    log.info("total grn edge num: %d", count)
    return edges, attrs


def parse_ppi_edges(
    node_path: str,
    edge_path: str,
    kegg: pd.DataFrame,
    cfg: Config,
    pathways=None,
) -> Tuple[Dict[int, List[Tuple[int, int]]], Dict[int, List[float]]]:
    """STRING PPI CSVs -> entrez-keyed edge dict (reference :178-218);
    with cfg.pretain_only_pathway_edge, same-pathway pairs only (:209)."""
    raw_node = pd.read_csv(node_path)
    raw_edge = pd.read_csv(edge_path).fillna(0)
    kegg_symbols = set(kegg["Symbol"].tolist())
    sym2ent = symbol_to_entrez(kegg)
    id2ent: Dict[str, int] = {}
    for r in raw_node.itertuples():
        stringid = getattr(r, "_1", None) or r[1]  # '@id' column
        symbol = getattr(r, "_2", None) or r[2]  # 'query term'
        ntype = getattr(r, "_3", None) or r[3]
        if symbol in kegg_symbols and ntype == "protein":
            id2ent[str(stringid).replace("stringdb:", "")] = sym2ent[symbol]
    edges: Dict[int, List[Tuple[int, int]]] = {}
    attrs: Dict[int, List[float]] = {}
    count = 0
    score_col = cfg.use_column or "stringdb::score"
    for _, row in raw_edge.iterrows():
        name = row.get("name", "")
        if " (pp) " not in str(name):
            continue
        a, b = str(name).split(" (pp) ")
        val = row.get(score_col, 0)
        if a not in id2ent or b not in id2ent:
            continue
        if cfg.use_column is not None and (pd.isna(val) or val == 0):
            continue
        s, d = id2ent[a], id2ent[b]
        if cfg.pretain_only_pathway_edge and not in_same_pathway(
            s, d, kegg, pathways or []
        ):
            continue
        edges.setdefault(s, []).append((s, d))
        attrs.setdefault(s, []).append(float(val))
        count += 1
    log.info("total ppi edge num: %d", count)
    return edges, attrs


def load_cohort_from_files(
    mrna_path: str,
    cnv_path: str,
    methylation_path: str,
    clinical_path: str,
    kegg_path: str,
    pathway_list_path: str,
    edge_path: str,
    cfg: Config,
    ppi_node_path: Optional[str] = None,
    grn_edge_path: Optional[str] = None,
) -> Cohort:
    """Reference-format files -> Cohort (mirrors MyData.__init__ flow).

    edge_type='merge' needs both PPI (edge_path + ppi_node_path) and GRN
    (grn_edge_path) sources (reference multiloader.py:62-64)."""
    kegg = pd.read_csv(kegg_path)
    pathways = load_pathway_list(pathway_list_path)

    omics = {
        "mrna": drop_na_line(pd.read_csv(mrna_path, index_col=0), cfg.drop_na_percent),
        "cnv": drop_na_line(pd.read_csv(cnv_path, index_col=0), cfg.drop_na_percent),
        "methylation": drop_na_line(
            pd.read_csv(methylation_path, index_col=0), cfg.drop_na_percent
        ),
    }
    # symbol-named columns -> entrez (reference :121-125)
    sym2ent = symbol_to_entrez(kegg)
    for k, df in omics.items():
        if len(df.columns) and not str(df.columns[0]).lstrip("-").isdigit():
            df = df.rename(
                columns={s: str(e) for s, e in sym2ent.items()}
            )
            omics[k] = df

    with open(clinical_path, "rb") as f:
        clin = pickle.load(f)
    if isinstance(clin, dict):
        clinical = pd.DataFrame(
            {
                "survive_time": pd.Series(clin["survive_time"]),
                "survive_state": pd.Series(clin["survive_state"]),
                "age": pd.Series(clin["age"]),
            }
        )
    else:
        clinical = clin

    edges2 = attrs2 = None
    if cfg.edge_type == "ppi":
        assert ppi_node_path is not None
        edges, attrs = parse_ppi_edges(
            ppi_node_path, edge_path, kegg, cfg, pathways
        )
    elif cfg.edge_type == "merge":
        # reference multiloader.py:62-64: PPI primary + GRN secondary
        assert ppi_node_path is not None and grn_edge_path is not None
        edges, attrs = parse_ppi_edges(
            ppi_node_path, edge_path, kegg, cfg, pathways
        )
        edges2, attrs2 = parse_grnboost2_edges(
            grn_edge_path, kegg, cfg, pathways
        )
    else:
        edges, attrs = parse_grnboost2_edges(edge_path, kegg, cfg, pathways)
    cfg = cfg.replace(pathway_num=len(pathways))
    return Cohort(
        omics, clinical, kegg, pathways, edges, attrs, cfg,
        edges2=edges2, edge_attrs2=attrs2,
    )
