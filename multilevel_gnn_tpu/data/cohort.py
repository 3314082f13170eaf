"""Multi-omics cohort pipeline (host side).

Re-implements the reference dataloader (dataloader/multiloader.py:32-1066)
semantics for the TPU framework:

  * gene/pathway universe + node map          (init_graph_grnboost2 :220-274)
  * PPI / GRNBoost2 edge parsing              (init_graph :178-218)
  * patient filtering + z-mean centering      (init_data :100-176)
  * per-(pathway, omics) column table, raw_datas/raw_indice/tf_token
    (prepare_pca_result :376-530)
  * sklearn PCA seeding with MI-mask recompute, zero-padding and
    drop_irr_pathway semantics               (:445-491)
  * pathway-correlation reordering            (:512-528)
  * MI mask generation                        (multilevel_gnn.py:353-377)
  * MI-driven edge re-selection + cross-omics edges (:581-700)
  * labels (hard + survive-time softmax soft) (:1028-1036), class weights
    (:321-326)

Key structural difference (TPU-first): instead of materializing one PyG Data
per patient via a process pool, the cohort produces *one* static topology per
fold plus dense batched feature arrays (patients x node-slots) — see
SURVEY.md §7.1.  The per-patient graphs in the reference are identical
anyway (multiloader.py:687-698).

Node indexing: the reference's ``idx_map`` is the identity over ``node_map``
order (every node_map gene always receives a 3-value row, multiloader
predefine_data:949-971), so node slot = 3*node_map[entrez] + omics, with
``pathway_num`` trailing zero-slot triples appended when pathway_global_node
is set.
"""
from __future__ import annotations

import dataclasses
import logging
import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
import pandas as pd
from sklearn.decomposition import PCA
from sklearn.feature_selection import mutual_info_classif, mutual_info_regression

from multilevel_gnn_tpu.core.batch import FoldContext, make_fold_context
from multilevel_gnn_tpu.core.config import Config
from multilevel_gnn_tpu.core.graph import Graph

log = logging.getLogger(__name__)

OMICS = ("mrna", "cnv", "methylation")  # omics index 0/1/2 (reference order)


@dataclasses.dataclass
class PcaRow:
    """One row of the learnable-PCA table: a (pathway, omics, gene) column."""

    pathway_i: int
    omics: int
    entrez: int
    slot: int  # pathway-omics slot id = sequential (pathway, omics) counter


@dataclasses.dataclass
class FoldData:
    """Everything the trainer needs for one CV fold."""

    ctx: FoldContext
    info_mask: np.ndarray  # (G, 1)
    mutual_info: np.ndarray  # (G,)
    pca_seed: np.ndarray  # (G, pca_dim)
    class_weight: np.ndarray  # (2,)
    pathway_node_attr: Optional[np.ndarray] = None  # (n_patients, P, 3*pca_dim)
    reorder_idxs: Optional[np.ndarray] = None
    edge_count: int = 0


class Cohort:
    """In-memory multi-omics cohort with per-fold derivations.

    Parameters
    ----------
    omics: dict of DataFrames (patients x entrez-str columns) for
        'mrna', 'cnv', 'methylation' (raw, before centering).
    clinical: DataFrame indexed by patient with columns
        survive_time (months), survive_state (1=event), age.
    kegg: DataFrame with columns PathwayID, Symbol, Entrezid.
    pathways: ordered list of pathway ids (the 146-pathway order).
    edges: dict entrez -> list[(src_entrez, dst_entrez)] raw directed edges.
    edge_attrs: dict entrez -> list[float] parallel to edges.
    """

    def __init__(
        self,
        omics: Dict[str, pd.DataFrame],
        clinical: pd.DataFrame,
        kegg: pd.DataFrame,
        pathways: Sequence[str],
        edges: Dict[int, List[Tuple[int, int]]],
        edge_attrs: Dict[int, List[float]],
        cfg: Config,
        edges2: Optional[Dict[int, List[Tuple[int, int]]]] = None,
        edge_attrs2: Optional[Dict[int, List[float]]] = None,
    ):
        self.cfg = cfg
        self.kegg = kegg
        self.pathways = list(pathways)
        self.edges = edges
        self.edge_attrs = edge_attrs
        # secondary (GRN) edge set for edge_type='merge' (reference
        # multiloader.py:62-64,68-69); fold-independent, built lazily
        self.edges2 = edges2
        self.edge_attrs2 = edge_attrs2
        self._graph2_cache = None

        mrna = omics["mrna"].copy()
        cnv = omics["cnv"].copy()
        mt = omics["methylation"].copy()
        if cfg.zscore_mrna:
            mrna = (mrna - mrna.mean()) / mrna.std()
        if cfg.add_hat:
            # winsorize mrna at the add_hat_percent quantile both sides
            # (reference :115-119, 895-904)
            hi = mrna.quantile(cfg.add_hat_percent)
            lo = mrna.quantile(1.0 - cfg.add_hat_percent)
            mrna = mrna.clip(lower=lo, upper=hi, axis=1)
        if cfg.reverse_mt:
            mt = -mt

        self.survive_time = clinical["survive_time"].to_dict()
        self.survive_state = clinical["survive_state"].to_dict()
        self.age = clinical["age"].to_dict()

        # node universe: genes of the ordered pathways present in kegg,
        # sorted by entrez (reference multiloader.py:239-249)
        in_path = kegg[kegg["PathwayID"].isin(self.pathways)]
        universe = sorted(set(int(e) for e in in_path["Entrezid"].unique()))
        self.node_map = {e: i for i, e in enumerate(universe)}
        self.node_size = len(universe)

        # patient populations: PCA population = omics/clinical intersection
        # BEFORE risk filtering (reference :131-132); training population is
        # risk-filtered (reference :148)
        pca_patients = [
            p
            for p in mt.index
            if p in cnv.index and p in mrna.index and p in self.survive_time
        ]
        self.pca_patients = pca_patients
        self.patients = [
            p
            for p in pca_patients
            if not np.isnan(self.survive_time[p])
            and (not cfg.use_age or (p in self.age and not np.isnan(self.age[p])))
            and (
                self.survive_time[p] > cfg.risk_threshold
                or self.survive_state[p] == 1
            )
        ]

        self.omics_raw = {"mrna": mrna, "cnv": cnv, "methylation": mt}

        # joined + centered matrix for node features (reference :134-143)
        joined = pd.concat(
            {
                "cnv": cnv.reindex(pca_patients),
                "mrna": mrna.reindex(pca_patients),
                "methylation": mt.reindex(pca_patients),
            },
            axis=1,
        )
        if cfg.z_score:
            joined = (joined - joined.mean()) / joined.std()
        elif cfg.z_mean:
            joined = joined - joined.mean()
        self.joined = joined

        self._build_pca_table()
        self._build_node_features()
        self._mask_cache: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
        self.initial_reorder_idxs: Optional[np.ndarray] = None
        if cfg.reorder_pathway:
            # initial (unmasked) reorder pass (reference :512-528 first call)
            _, _, reorder = self._pathway_pca(None)
            self.initial_reorder_idxs = reorder

    # ------------------------------------------------------------------ #
    # static tables
    # ------------------------------------------------------------------ #
    def _omics_cols(self, omics_name: str):
        """Per-omics column cache: (values (cols, n_pca) contiguous rows,
        int column ids, id -> row index, NaN-free mask).  One reindex per
        omics instead of one per (pathway, gene) — the pandas per-column
        loop cost 52 s of the 40-patient reference-format load."""
        if not hasattr(self, "_omics_cache"):
            self._omics_cache = {}
        if omics_name not in self._omics_cache:
            df = self.omics_raw[omics_name]
            sub = df.reindex(self.pca_patients)
            # transpose so each COLUMN of the frame is a contiguous row —
            # ndarray.sum's pairwise blocking then matches what pandas
            # Series.mean()/std() computed on the extracted column
            colT = np.ascontiguousarray(sub.to_numpy(np.float64).T)
            cols_int = df.columns.map(int).to_numpy()
            colidx = {int(c): i for i, c in enumerate(cols_int)}
            nanfree = ~np.isnan(colT).any(axis=1)
            self._omics_cache[omics_name] = (colT, cols_int, colidx, nanfree)
        return self._omics_cache[omics_name]

    def _pathway_columns(self, pathway: str, omics_name: str) -> List[str]:
        """Sorted entrez columns of this pathway present & NaN-free in the
        omics frame (reference np.intersect1d + dropna, :413-420)."""
        colT, cols_int, colidx, nanfree = self._omics_cols(omics_name)
        entrez = self.kegg[self.kegg["PathwayID"] == pathway].Entrezid.unique()
        inter = np.intersect1d(entrez.astype(int), cols_int)
        return [str(c) for c in inter if nanfree[colidx[int(c)]]]

    def _build_pca_table(self):
        """Fixed (pathway, omics, gene) row table + raw_datas matrix."""
        cfg = self.cfg
        rows: List[PcaRow] = []
        slot = 0
        used_pathways = []
        for pi, pathway in enumerate(self.pathways):
            entrez = self.kegg[self.kegg["PathwayID"] == pathway].Entrezid.unique()
            if len(entrez) < 5:  # reference :405-407 skips tiny pathways
                continue
            used_pathways.append(pathway)
            ppi = len(used_pathways) - 1
            for oi, name in enumerate(OMICS):
                for col in self._pathway_columns(pathway, name):
                    rows.append(PcaRow(ppi, oi, int(col), slot))
                slot += 1
        self.used_pathways = used_pathways
        self.n_pathways = len(used_pathways)
        self.rows = rows
        self.num_pca_rows = len(rows)
        self.raw_indice = np.array([r.slot for r in rows], np.int32)

        # raw_datas: mean-centered per-column values for the PCA population
        # (reference :437) and the training-feature matrix for MI.
        # Vectorized gather from the per-omics cache; the mean/std
        # formulas replicate pandas nanops on NaN-free contiguous columns
        # bit-for-bit (mean = sum/n; var uses (avg - values)**2, ddof=1).
        n_pca = len(self.pca_patients)
        mats = np.empty((len(rows), n_pca), np.float64)
        stds = np.empty(len(rows), np.float64)
        for i, r in enumerate(rows):
            colT, _, colidx, _ = self._omics_cols(OMICS[r.omics])
            col = colT[colidx[r.entrez]]
            mean = col.sum() / n_pca
            mats[i] = col - mean
            var = ((mean - col) ** 2).sum() / (n_pca - 1)
            stds[i] = np.sqrt(var)
        self.raw_datas = np.ascontiguousarray(mats.T)  # (n_pca, G)
        self.gene_std_value = stds.astype(np.float32)
        self.tf_token = np.array(
            [
                (str(r.omics) in self.cfg.remain_tf_nums)
                and (r.entrez in self.edges)
                for r in rows
            ],
            bool,
        )

        # gene -> node-slot map (reference :610-616); idx_map == identity
        self.gene_pca_match = np.array(
            [
                3 * self.node_map[r.entrez] + r.omics
                if r.entrez in self.node_map
                else -1
                for r in rows
            ],
            np.int32,
        )

    def _build_node_features(self):
        """Dense per-patient node features (reference predefine_data
        :949-971 + pathway zero rows :1024-1025)."""
        cfg = self.cfg
        P = self.n_pathways if cfg.pathway_global_node else 0
        self.node_num = self.node_size + P
        nodes = 3 * self.node_num
        n = len(self.patients)
        X = np.zeros((n, self.node_size, 3), np.float32)
        universe = list(self.node_map)
        for oi, name in enumerate(OMICS):
            sub = self.joined[name].reindex(self.patients)
            cols = [str(e) for e in universe]
            present = [c for c in cols if c in sub.columns]
            vals = sub[present].to_numpy(np.float32)
            idxs = [self.node_map[int(c)] for c in present]
            vals = np.nan_to_num(vals, nan=0.0)
            X[:, idxs, oi] = vals
        if P:
            X = np.concatenate([X, np.zeros((n, P, 3), np.float32)], axis=1)
        self.X = X.reshape(n, nodes)
        self.num_nodes = nodes

        self.Y = np.stack([self._label(p) for p in self.patients]).astype(
            np.float32
        )
        self.ages = np.array(
            [self.age.get(p, np.nan) for p in self.patients], np.float32
        )
        self.ages = np.nan_to_num(self.ages, nan=0.0)

    def _label(self, patient) -> np.ndarray:
        cfg = self.cfg
        if cfg.soft_label:
            if self.survive_state[patient] == 0:
                return np.array([0.0, 1.0])
            os_m = self.survive_time[patient]
            z = np.array(
                [1 - os_m / cfg.risk_threshold, os_m / cfg.risk_threshold - 1]
            )
            e = np.exp(z - z.max())
            return e / e.sum()
        y = np.zeros(2)
        y[int(self.survive_time[patient] > cfg.risk_threshold)] = 1.0
        return y

    def labels(self) -> np.ndarray:
        """Binary class per patient = y[1] > 0.5 (reference :331-337)."""
        return (self.Y[:, 1] > 0.5).astype(np.int64)

    def slot_sizes(self) -> tuple:
        """Genes per pathway-omics slot (static AE foreach-decoder shape)."""
        counts = np.bincount(self.raw_indice, minlength=3 * self.n_pathways)
        return tuple(int(c) for c in counts)

    # ------------------------------------------------------------------ #
    # per-fold derivations
    # ------------------------------------------------------------------ #
    def mutual_mask(
        self, train_idx: np.ndarray, fold: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        """MI feature mask over PCA rows (reference multilevel_gnn.py:353-377,
        cached per fold)."""
        cfg = self.cfg
        if fold in self._mask_cache:
            return self._mask_cache[fold]
        disk = None
        if cfg.use_cache:
            from multilevel_gnn_tpu.data.cache import PreprocessCache, content_key

            disk = PreprocessCache("./data_cache")
            # 'v2f32' = estimator-schema version: v2 feeds the estimator
            # f32-rounded features (the reference torch.tensor quirk below).
            # Bumping the token invalidates caches written by the earlier
            # f64 code path so stale masks are never silently served.
            key = content_key(
                "mi_mask", "v2f32", cfg.cancer_type,
                tuple(self.patients[i] for i in train_idx),
                cfg.mutual_neighbors, cfg.mutual_classif,
                cfg.random_state if cfg.freeze_mutual_select_init else None,
                cfg.node_select_threshold, cfg.mutual_info_threshold,
            )
            hit = disk.get(key)
            if hit is not None:
                self._mask_cache[fold] = hit
                return hit
        pos = [self.pca_patients.index(self.patients[i]) for i in train_idx]
        # reference quirk PRESERVED: generate_mutual_mask tensorizes the
        # raw float64 feature lists with torch.tensor(x) -> DEFAULT f32
        # (reference multilevel_gnn.py:354), so the MI estimator sees
        # f32-rounded values (sklearn then upcasts f64 internally).  2/216
        # mask bits flip on the tiny oracle fixture without this
        # (tests/test_reference_pipeline_oracle.py::test_mutual_mask_and_mi).
        x = self.raw_datas[pos].astype(np.float32)
        y = self.labels()[train_idx]
        rs = cfg.random_state if cfg.freeze_mutual_select_init else None
        mi = None
        if cfg.native_mi:
            # threaded C++ kNN MI (csrc/mi_knn.cc) — value-exact vs
            # sklearn (same scale+noise preprocessing, scipy digamma
            # table; tests/test_native_mi.py), ~15x faster at cohort
            # scale (1.5 s vs 21.7 s for 400x15405)
            try:
                from multilevel_gnn_tpu.data import native

                fn = (
                    native.mi_classif
                    if cfg.mutual_classif
                    else native.mi_regression
                )
                mi = fn(
                    x, y, n_neighbors=cfg.mutual_neighbors, random_state=rs
                )
            except OSError:
                log.info("native MI library unavailable; using sklearn")
        if mi is None:
            fn = (
                mutual_info_classif
                if cfg.mutual_classif
                else mutual_info_regression
            )
            # n_jobs: per-feature kNN MI estimates are independent;
            # parallelize across host cores (values identical to the
            # sequential reference call — sklearn splits by feature, not
            # by sample).  The loky workers inherit os.environ at first
            # spawn; blank the axon pool var so each worker's
            # sitecustomize skips TPU-plugin registration (measured:
            # 109 s of fold-0 prep when every worker re-registered the
            # remote TPU backend vs ~4 s with CPU-only workers).
            prev = os.environ.get("PALLAS_AXON_POOL_IPS")
            os.environ["PALLAS_AXON_POOL_IPS"] = ""
            try:
                mi = fn(
                    x, y, n_neighbors=cfg.mutual_neighbors, random_state=rs,
                    n_jobs=-1,
                )
            finally:
                if prev is None:
                    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
                else:
                    os.environ["PALLAS_AXON_POOL_IPS"] = prev
        thr = (
            cfg.node_select_threshold * np.mean(mi)
            if cfg.mutual_info_threshold is None
            else cfg.mutual_info_threshold
        )
        mask = (mi >= thr).astype(np.float32)[:, None]
        if cfg.remain_all_tf:
            mask = np.maximum(mask, self.tf_token.astype(np.float32)[:, None])
        self._mask_cache[fold] = (mask, mi)
        if disk is not None:
            disk.put(key, (mask, mi))
        return mask, mi

    def _pathway_pca(self, info_mask: Optional[np.ndarray]):
        """Per-(pathway, omics) sklearn PCA (reference prepare_pca_result).

        Returns (pca_seed (G, pca_dim), pathway_node_attr
        (n_patients, P, 3*pca_dim), reorder_idxs or None)."""
        cfg = self.cfg
        G = self.num_pca_rows
        seed = np.zeros((G, cfg.pca_dim), np.float32)
        attr = np.zeros(
            (len(self.pca_patients), self.n_pathways, 3 * cfg.pca_dim), np.float64
        )
        pathway_matrix = []
        rows = self.rows
        # rows are stored (pathway, omics)-contiguous; group once
        groups: Dict[Tuple[int, int], List[int]] = {}
        for i, r in enumerate(rows):
            groups.setdefault((r.pathway_i, r.omics), []).append(i)
        for ppi in range(self.n_pathways):
            for oi in range(3):
                idxs = groups.get((ppi, oi), [])
                if not idxs:
                    pathway_matrix.append(
                        np.zeros((len(self.pca_patients), cfg.pca_sim_dim))
                    )
                    continue
                cols = [str(rows[i].entrez) for i in idxs]
                data = (
                    self.omics_raw[OMICS[oi]][cols]
                    .reindex(self.pca_patients)
                    .to_numpy(np.float64)
                )
                if info_mask is not None:
                    sel = [k for k, i in enumerate(idxs) if info_mask[i, 0] > 0]
                else:
                    sel = list(range(len(idxs)))
                n_sel = len(sel)
                if info_mask is None or n_sel < cfg.pca_sim_dim:
                    # PCA on ALL columns, components masked to selected cols
                    # (reference :459-483)
                    dim = min(max(n_sel, 1), cfg.pca_sim_dim, data.shape[1])
                    if info_mask is None:
                        dim = min(cfg.pca_sim_dim, data.shape[1], len(self.pca_patients))
                    pca = PCA(n_components=dim, svd_solver="full").fit(data)
                    pdat = pca.transform(data)
                    pad = cfg.pca_sim_dim - (n_sel if info_mask is not None else 0)
                    if pdat.shape[1] < cfg.pca_sim_dim:
                        pdat = np.concatenate(
                            [
                                pdat,
                                np.zeros(
                                    (len(pdat), cfg.pca_sim_dim - pdat.shape[1])
                                ),
                            ],
                            axis=1,
                        )
                    if info_mask is not None and n_sel > 0:
                        if cfg.drop_irr_pathway:
                            comp = np.zeros((pca.components_.shape[0], n_sel))
                        else:
                            comp = pca.components_[:, sel]
                        if comp.shape[0] < cfg.pca_dim:
                            comp = np.concatenate(
                                [
                                    comp,
                                    np.zeros(
                                        (cfg.pca_dim - comp.shape[0], n_sel)
                                    ),
                                ]
                            )
                        comp = comp[: cfg.pca_dim, :]
                        for c, k in zip(sel, range(n_sel)):
                            seed[idxs[c], : comp.shape[0]] = comp[:, k]
                else:
                    pca = PCA(n_components=cfg.pca_sim_dim, svd_solver="full").fit(
                        data[:, sel]
                    )
                    pdat_sel = pca.transform(data[:, sel])
                    pdat = pdat_sel
                    comp = pca.components_[: cfg.pca_dim, :]
                    if cfg.mean_pca_init:
                        comp = comp / np.mean(np.abs(comp)) * cfg.pca_mean_value
                    for k, c in enumerate(sel):
                        seed[idxs[c], : comp.shape[0]] = comp[:, k]
                pathway_matrix.append(pdat[:, : cfg.pca_sim_dim])
                attr[:, ppi, oi * cfg.pca_dim : (oi + 1) * cfg.pca_dim] = pdat[
                    :, : cfg.pca_dim
                ]

        reorder = None
        if cfg.reorder_pathway and (cfg.selected_similarity or info_mask is None):
            reorder = self._reorder_from_matrix(pathway_matrix)
        # pathway correlation adjacency (+I) for DiffPool heads
        P = self.n_pathways
        mats = [
            np.concatenate(
                [pathway_matrix[3 * ppi + oi].reshape(-1) for oi in range(3)]
            )
            for ppi in range(P)
        ]
        corr = np.corrcoef(np.stack(mats))
        corr = np.nan_to_num(corr, nan=0.0) + np.eye(P)
        self._last_pathway_adj = corr.astype(np.float32)
        return seed, attr, reorder

    def _reorder_from_matrix(self, pathway_matrix: List[np.ndarray]) -> np.ndarray:
        """Greedy correlation-chain pathway ordering (reference :512-528)."""
        P = self.n_pathways
        mats = []
        for ppi in range(P):
            mats.append(
                np.concatenate(
                    [pathway_matrix[3 * ppi + oi].reshape(-1) for oi in range(3)]
                )
            )
        cat = np.stack(mats)  # (P, n*3*psd)
        corr = np.corrcoef(cat) - np.eye(P)
        corr = np.nan_to_num(corr, nan=-1.0)
        mx = corr.argmax()
        order = [mx // P, mx % P]
        remain = set(range(P)) - set(order)
        sort_m = np.argsort(corr)
        while len(order) < P:
            src = order[-1]
            for t in sort_m[src][::-1]:
                if t in remain:
                    order.append(int(t))
                    remain.remove(int(t))
                    break
        return np.array(order, np.int32)

    def _edge_mi_valid(self, src, dst, oi, train_patients, y) -> bool:
        """Per-edge PCA+MI validity test (reference valid_pca_mutual_info
        :828-874).  Only active with cfg.edge_select."""
        cfg = self.cfg
        if not cfg.edge_select:
            return True
        df = self.omics_raw[OMICS[oi]]
        cols = [str(src), str(dst)]
        if any(c not in df.columns for c in cols):
            return False
        ed = df[cols].reindex(train_patients).to_numpy()
        rs = cfg.random_state if cfg.freeze_mutual_select_init else None
        y_arr = np.asarray(y, float)[:, None]
        if cfg.knn_mutual_info and oi != 1:
            # KSG estimator path (reference :838-839, 853-854, 863-864)
            from multilevel_gnn_tpu.utils.knnie import kraskov_mi

            pmi = kraskov_mi(ed, y_arr)
            smi = kraskov_mi(ed[:, :1], y_arr)
            dmi = kraskov_mi(ed[:, 1:], y_arr)
            return pmi > cfg.edge_select_threshold * max(smi, dmi)
        pca = PCA(n_components=1).fit(ed)
        pd1 = pca.transform(ed)
        fn = mutual_info_classif if cfg.mutual_classif else mutual_info_regression
        pmi = fn(pd1, y, random_state=rs)
        smi = fn(ed[:, :1], y, random_state=rs)
        dmi = fn(ed[:, 1:], y, random_state=rs)
        return pmi > cfg.edge_select_threshold * max(smi, dmi)

    def merge_graph2(self, edge_bucket: int = 2048) -> Optional["Graph"]:
        """Secondary GRN graph for edge_type='merge' (reference
        process_grn_edge, multiloader.py:276-289): bidirectional edges in
        GENE-index space — NOT the 3*gene+omics slot space the primary
        edges use.  This is a preserved reference quirk: the merge list
        branch feeds gene indices to a slot-indexed node tensor, so each
        GRN edge lands on slot gene_idx (= gene gene_idx//3's omics
        gene_idx%3).  Fold-independent, cached."""
        if self.edges2 is None:
            return None
        if self._graph2_cache is not None:
            return self._graph2_cache
        cfg = self.cfg
        nm = self.node_map
        es, ats = [], []
        for node_id in self.edges2:
            for (s, d), a in zip(
                self.edges2[node_id], self.edge_attrs2[node_id]
            ):
                if s in nm and d in nm:
                    es.append([nm[s], nm[d]])
                    ats.append([a])
                    es.append([nm[d], nm[s]])
                    ats.append([a])
        if not es:
            ei = np.zeros((2, 0), np.int32)
            ea = np.zeros((0, 1), np.float32)
        else:
            ei = np.array(es, np.int32).T
            ea = np.array(ats, np.float32)
        g = Graph.from_edges(ei, ea, self.num_nodes)
        if cfg.gnn_name.lower() in ("sage", "rsage", "gat"):
            g = g.with_self_loops()
        if edge_bucket:
            g = g.pad_edges_to(
                max(
                    ((g.n_edges + edge_bucket - 1) // edge_bucket)
                    * edge_bucket,
                    edge_bucket,
                )
            )
        g = g.with_sorted_meta()
        g = dataclasses.replace(g, n_edges=g.num_padded_edges)
        self._graph2_cache = g
        return g

    def build_edges(
        self, info_mask: np.ndarray, train_idx: Optional[np.ndarray] = None
    ) -> Tuple[np.ndarray, np.ndarray, int]:
        """MI-selected intra-omics + cross-omics edges in node-slot space
        (reference recalculate_edge_bo_selected_gene :581-700)."""
        cfg = self.cfg
        selected = [set(), set(), set()]
        for i, r in enumerate(self.rows):
            if info_mask[i, 0] > 0:
                selected[r.omics].add(r.entrez)
        train_patients = (
            [self.patients[i] for i in train_idx] if train_idx is not None else []
        )
        y = (
            self.labels()[train_idx].tolist() if train_idx is not None else []
        )

        edges, attrs = [], []
        nm = self.node_map
        for oi, sel in enumerate(selected):
            if str(oi) in cfg.mute_edge:
                continue
            for e in sel:
                if e not in self.edges or e not in nm:
                    continue
                for (s, d), a in zip(self.edges[e], self.edge_attrs[e]):
                    if d in sel and d in nm:
                        if not self._edge_mi_valid(s, d, oi, train_patients, y):
                            continue
                        edges.append([3 * nm[s] + oi, 3 * nm[d] + oi])
                        attrs.append([a])
                        if cfg.bidir_edge:
                            edges.append([3 * nm[d] + oi, 3 * nm[s] + oi])
                            attrs.append([a])
        intra = len(edges)

        for e in selected[0]:
            if e not in nm:
                continue
            if cfg.construct_cnv_mrna_edge and e in selected[1]:
                edges.append([3 * nm[e] + 1, 3 * nm[e] + 0])
                attrs.append([1.0])
            if cfg.construct_mt_mrna_edge and e in selected[2]:
                edges.append([3 * nm[e] + 2, 3 * nm[e] + 0])
                attrs.append([-1.0 if cfg.reverse_mt_attr else 1.0])
            if cfg.construct_mrna_cnv_edge and e in selected[1]:
                edges.append([3 * nm[e] + 0, 3 * nm[e] + 1])
                attrs.append([1.0])
            if cfg.construct_mrna_mt_edge and e in selected[2]:
                edges.append([3 * nm[e] + 0, 3 * nm[e] + 2])
                attrs.append([-1.0 if cfg.reverse_mt_attr else 1.0])

        log.info(
            "edges: intra-omics %d, cross-omics %d", intra, len(edges) - intra
        )
        if not edges:
            return np.zeros((2, 0), np.int32), np.zeros((0, 1), np.float32), 0
        return (
            np.array(edges, np.int32).T,
            np.array(attrs, np.float32),
            intra,
        )

    # ------------------------------------------------------------------ #
    # gene-level graph variants (DeeperGCN / MultiOmixGCN)
    # ------------------------------------------------------------------ #
    def gene_level_features(self) -> np.ndarray:
        """(n_patients, node_size + P, 3 [+2]) per-gene omics features — the
        DeeperGCN input layout (reference predefine_data x rows); with
        cfg.mul_attr, appends mrna*cnv and mrna*mt products (:966-967)."""
        x = self.X.reshape(len(self.patients), -1, 3)
        if self.cfg.mul_attr:
            prods = np.stack(
                [x[..., 0] * x[..., 1], x[..., 0] * x[..., 2]], axis=-1
            )
            x = np.concatenate([x, prods], axis=-1)
        return x

    def gene_level_graph(self) -> Tuple[np.ndarray, np.ndarray]:
        """Gene-index edges (both directions, reference predefine_data
        :975-984) + pathway-vnode edges with one-hot ids (:985-1021).

        Returns (edge_index (2, E), edge_attr (E, 2)) where attr col 0 is
        the float weight and col 1 the one-hot edge id (pathway edges;
        gene edges keep int(attr) like the reference's .to(long) cast)."""
        cfg = self.cfg
        nm = self.node_map
        edges, attrs = [], []
        for src, lst in self.edges.items():
            for (s, d), a in zip(lst, self.edge_attrs[src]):
                if s in nm and d in nm:
                    edges.append([nm[s], nm[d]])
                    attrs.append([a, float(int(a))])
                    edges.append([nm[d], nm[s]])
                    attrs.append([a, float(int(a))])
        onehot_count = 0
        n_genes = self.node_size
        if cfg.pathway_global_node:
            for pi, pathway in enumerate(self.used_pathways):
                entrez = self.kegg[
                    self.kegg["PathwayID"] == pathway
                ].Entrezid.unique()
                for e in np.intersect1d(entrez.astype(int), list(nm)):
                    edges.append([nm[int(e)], n_genes + pi])
                    attrs.append([float(onehot_count), float(onehot_count)])
                    if cfg.bi_global_node:
                        edges.append([n_genes + pi, nm[int(e)]])
                        attrs.append([float(onehot_count), float(onehot_count)])
                    onehot_count += 1
        self.pathway_edge_num = onehot_count
        return (
            np.array(edges, np.int32).T,
            np.array(attrs, np.float32),
        )

    def deepergcn_fold(self, train_idx: np.ndarray, fold_i: int) -> FoldData:
        """Fold data for DeeperGCN: gene-level topology + pathway-vnode
        edges + per-pathway PCA node attrs (in batch.raw_data)."""
        mask, mi = self.mutual_mask(train_idx, fold_i)
        _, attr, _ = self._pathway_pca(mask if self.cfg.mutual_info_pca else None)
        ei, ea = self.gene_level_graph()
        graph = Graph.from_edges(ei, ea, self.node_size + self.n_pathways)
        graph = graph.with_sorted_meta()
        ctx = make_fold_context(
            graph,
            self.gene_pca_match,
            self.raw_indice,
            mask,
            n_pathways=self.n_pathways,
        )
        return FoldData(
            ctx=ctx,
            info_mask=mask,
            mutual_info=mi,
            pca_seed=np.zeros((self.num_pca_rows, self.cfg.pca_dim), np.float32),
            class_weight=self.class_weight(train_idx),
            pathway_node_attr=attr[
                [self.pca_patients.index(p) for p in self.patients]
            ],
            edge_count=graph.n_edges,
        )

    def multiomix_vnode_data(self, fold: FoldData):
        """Per-omics pathway-edge graphs + masks + 2-dim pathway attrs for
        MultiOmixGCN (the data the reference's absent multiomix driver
        would supply as pathway_{omix}_edges / _node_attr)."""
        from multilevel_gnn_tpu.core.batch import FoldContext as _FC

        nm = self.node_map
        n_genes = self.node_size
        N = n_genes + self.n_pathways
        graphs, masks, attrs = {}, {}, {}
        omix_key = {"mrna": 0, "cnv": 1, "mt": 2}
        pn = fold.pathway_node_attr  # (n, P, 3*pca_dim)
        for name, oi in omix_key.items():
            edges, eattrs = [], []
            for pi, pathway in enumerate(self.used_pathways):
                entrez = self.kegg[
                    self.kegg["PathwayID"] == pathway
                ].Entrezid.unique()
                cols = self._pathway_columns(pathway, OMICS[oi])
                for c in cols:
                    e = int(c)
                    if e in nm:
                        edges.append([nm[e], n_genes + pi])
                        eattrs.append(
                            pn[0, pi, oi * self.cfg.pca_dim : oi * self.cfg.pca_dim + 2]
                        )
            if edges:
                g = Graph.from_edges(
                    np.array(edges, np.int32).T,
                    np.array(eattrs, np.float32),
                    N,
                ).with_sorted_meta()
            else:
                g = Graph.from_edges(np.zeros((2, 0)), None, N, pad_to=128)
            m = np.zeros((N, 1), np.float32)
            if edges:
                m[np.array(edges)[:, 1]] = 1.0
            graphs[name] = g
            masks[name] = jnp.asarray(m)
            attrs[name] = jnp.asarray(
                pn[:, :, oi * self.cfg.pca_dim : oi * self.cfg.pca_dim + 2].astype(
                    np.float32
                )
            )
        return graphs, masks, attrs

    def class_weight(self, train_idx: np.ndarray) -> np.ndarray:
        """(max_count/count)^weight_power per class (reference :321-326)."""
        y = self.labels()[train_idx]
        counts = np.array([(y == 0).sum(), (y == 1).sum()], np.float64)
        counts = np.maximum(counts, 1)
        return (counts.max() / counts) ** self.cfg.weight_power

    def fold(
        self,
        train_idx: np.ndarray,
        fold_i: int,
        pad_edges_to: Optional[int] = None,
        edge_bucket: int = 2048,
    ) -> FoldData:
        """Full per-fold derivation pipeline (mirrors train.py:290-307).

        Edge counts are padded up to a bucket multiple so folds share jit
        compilations; sorted-segment metadata for the Pallas backend is
        attached last (padding/self-loop rebuilds drop it)."""
        import time as _time

        _t0 = _time.time()
        cfg = self.cfg
        mask, mi = self.mutual_mask(train_idx, fold_i)
        _t_mi = _time.time()
        seed, attr, reorder = self._pathway_pca(mask)
        _t_pca = _time.time()
        if reorder is None:
            reorder = (
                self.initial_reorder_idxs
                if self.initial_reorder_idxs is not None
                else np.arange(self.n_pathways, dtype=np.int32)
            )
        edge_index, edge_attr, _ = self.build_edges(mask, train_idx)
        _t_edges = _time.time()
        graph = Graph.from_edges(edge_index, edge_attr, self.num_nodes)
        # SAGE/GAT-family convs expect self-loops appended once per fold
        if cfg.gnn_name.lower() in ("sage", "rsage", "gat"):
            graph = graph.with_self_loops()
        if pad_edges_to is None and edge_bucket:
            pad_edges_to = max(
                ((graph.n_edges + edge_bucket - 1) // edge_bucket) * edge_bucket,
                edge_bucket,
            )
        if pad_edges_to is not None:
            graph = graph.pad_edges_to(pad_edges_to)
        if (
            cfg.windowed_spmm
            and cfg.kernel_backend == "pallas"
            and graph.n_edges >= cfg.windowed_min_edges
        ):
            # gene-grouped windows: node slots are 3*gene+omics, so
            # perm_group=3 permutes genes and keeps cross-omics edges
            # adjacent (build_edges layout, :562).  Gated on the real edge
            # count: below cfg.windowed_min_edges the composed path wins
            # (see the config field's measured crossover).
            graph = graph.with_window_meta(perm_group=3)
        n_real_edges = graph.n_edges
        graph = graph.with_sorted_meta()
        # normalize the n_edges STATIC to the padded count: the real count
        # varies per fold and a fold-varying static keys a fresh jit
        # compilation of every step (FoldData.edge_count keeps the real
        # count for logging/metrics).  Must be LAST — with_self_loops /
        # pad_edges_to slice by n_edges.
        graph = dataclasses.replace(graph, n_edges=graph.num_padded_edges)
        _t_meta = _time.time()
        ctx = make_fold_context(
            graph,
            self.gene_pca_match,
            self.raw_indice,
            mask,
            reorder,
            pca_seed=seed,
            n_pathways=self.n_pathways,
        )
        import dataclasses as _dc

        ctx = _dc.replace(
            ctx, pathway_adj=jnp.asarray(self._last_pathway_adj)
        )
        if cfg.edge_type == "merge":
            g2 = self.merge_graph2()
            if g2 is not None:
                ctx = _dc.replace(ctx, graph2=g2)
        log.info(
            "fold %d deriv: mi %.2fs pca %.2fs edges %.2fs graph+meta %.2fs "
            "ctx %.2fs", fold_i, _t_mi - _t0, _t_pca - _t_mi,
            _t_edges - _t_pca, _t_meta - _t_edges, _time.time() - _t_meta,
        )
        return FoldData(
            ctx=ctx,
            info_mask=mask,
            mutual_info=mi,
            pca_seed=seed,
            class_weight=self.class_weight(train_idx),
            pathway_node_attr=attr[
                [self.pca_patients.index(p) for p in self.patients]
            ],
            reorder_idxs=reorder,
            edge_count=n_real_edges,
        )
