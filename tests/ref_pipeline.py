"""Execute the ACTUAL reference data pipeline (multiloader.MyData + the
train.py:290-307 per-fold derivation) on synthetic reference-format files.

Shared by test_reference_pipeline_oracle.py (value-level pipeline parity)
and test_reference_full_stack.py (files -> pipeline -> model -> optimizer
trajectory parity).  All environment shims are test-only and value-neutral:

  * pd.read_excel -> the .csv twin written by write_reference_format
    (openpyxl isn't installed; multiloader.py:230 reads an .xlsx listing)
  * multiloader.Pool -> serial (worker dict-merge is order-independent,
    multiloader.py:301-303; forking a JAX-loaded test process is not safe)
  * pandas-1.x `Index & Index` set-intersection (multiloader.py:131)
  * cvxopt / torchvision import stubs (pyg_shim.install)
"""
import os

import numpy as np
import pandas as pd

import pyg_shim

pyg_shim.install()

import opt as ref_opt  # noqa: E402  (reference /root/reference/opt.py)

from multilevel_gnn_tpu.data.synthetic import write_reference_format  # noqa: E402


class SerialPool:
    """In-process stand-in for multiprocessing.Pool (multiloader.py:293)."""

    class _Res:
        def __init__(self, v):
            self._v = v

        def get(self):
            return self._v

    def apply_async(self, fn, args):
        return self._Res(fn(*args))

    def close(self):
        pass

    def join(self):
        pass


def run_reference_pipeline(d: str, overrides: dict, fixture_kw: dict):
    """Write reference-format files to `d`, run the reference MyData + the
    fold-0 derivation of train.py:258-299, and return every artifact.

    overrides: applied on top of the reference argparse DEFAULTS (the same
    dict should drive our typed Config so flag-default parity is implied).
    """
    write_reference_format(d, **fixture_kw)

    args = ref_opt.parser.parse_args([])
    for k, v in overrides.items():
        setattr(args, k, v)
    args.grn_edge_path = f"{d}/grn_edges.tsv"
    args.pathway_path = f"{d}/pathways.pkl"

    import dataloader.multiloader as ml

    cwd = os.getcwd()
    real_read_excel = pd.read_excel
    real_pool = ml.Pool
    real_index_and = pd.Index.__and__
    pd.read_excel = lambda p, header=None: pd.read_csv(
        p.replace(".xlsx", ".csv"), header=header
    )
    ml.Pool = SerialPool
    pd.Index.__and__ = lambda self, other: self.intersection(other)
    try:
        os.chdir(d)  # multiloader reads ./data/*.gmt|xlsx relative paths
        dataset = ml.MyData(
            f"{d}/raw_mrna.csv",
            f"{d}/raw_cnv.csv",
            f"{d}/raw_methylation.csv",
            f"{d}/node.csv",
            f"{d}/grn_edges.tsv",
            f"{d}/kegg.csv",
            f"{d}/clinical.pkl",
            args,
        )
        args.node_num = dataset.get_node_num()
        args.omics_num = len(dataset.omics_types)

        # train.py:258-280 fold derivation, fold 0 of run 0
        from sklearn.model_selection import StratifiedKFold

        labels = dataset.get_labels()
        skf = StratifiedKFold(5, shuffle=True, random_state=args.split_seed)
        all_idxs = np.arange(len(labels))
        tune, test_idx = next(iter(skf.split(all_idxs, labels)))
        skf2 = StratifiedKFold(5, shuffle=True, random_state=args.split_seed)
        tr, va = next(iter(skf2.split(tune, labels[tune])))
        train_idx, valid_idx = tune[tr], tune[va]

        from models.multilevel_gnn import MultilevelGNN as RefModel

        mask_model = RefModel(args)
        mask_model.set_pathway_indexs(dataset.all_indice)
        x, y = dataset.get_data_by_indice(train_idx)
        mask, mi = mask_model.generate_mutual_mask(
            x, y, args.mutual_classif, 0, dataset.get_tf_token()
        )
        dataset.recalculate_pca_bo_selected_gene(mask)
        edges, edge_attrs, gene_pca_match = (
            dataset.recalculate_edge_bo_selected_gene(mask, train_idx)
        )
        weight = dataset.get_weight_balance(train_idx)
    finally:
        os.chdir(cwd)
        pd.read_excel = real_read_excel
        ml.Pool = real_pool
        pd.Index.__and__ = real_index_and

    return dict(
        args=args,
        dataset=dataset,
        labels=labels,
        train_idx=np.asarray(train_idx),
        valid_idx=np.asarray(valid_idx),
        test_idx=np.asarray(test_idx),
        mask=mask,
        mi=np.asarray(mi),
        edges=np.asarray(edges),
        edge_attrs=np.asarray(edge_attrs),
        gene_pca_match=np.asarray(gene_pca_match),
        weight=np.asarray(weight),
    )
