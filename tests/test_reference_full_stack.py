"""FULL-STACK trajectory parity vs the actual reference code, at the
reference's hardcoded scale: files -> dataloader -> model -> weighted loss
-> Adam -> eval, every stage executed by BOTH stacks on identical data.

The reference side runs its REAL components end to end:
  * dataloader/multiloader.py MyData + the train.py:258-299 fold
    derivation (via tests/ref_pipeline.py),
  * models/multilevel_gnn.py MultilevelGNN with set_pca_params /
    set_info_mask / set_pathway_indexs exactly as train.py:290-299 wires
    them,
  * the ACTUAL reference train() and eval() functions (train.py:38-109)
    with optim.Adam per run() (train.py:112).

Our side runs the same files through load_cohort_from_files -> Cohort.fold
-> build_train_fns (the production step builder) with seed_pca_params —
then per-epoch mean losses, post-training predictions, AUC/ACC and
per-epoch eval losses must agree.

Scale: the reference model hardcodes node_num=5135 (multilevel_gnn.py:34,
x.reshape(-1, 15405, 1)) and 146 pathways (the :239 scatter target), so
the synthetic cohort is built with 146 pathways x 4989 genes = 5135 nodes
including the pathway-global rows — the flagship's true shape.

Two determinism shims (both value-neutral for the comparison):
  * batch ORDER — the reference DataLoader shuffles with torch RNG, our
    driver samples with numpy RNG; streams can't align, so both sides
    consume the same fixed sequential batches (reference train()/eval()
    take the loader as an argument, train.py:38,71; batch CONTENT and
    every compute stage stay the reference's own).
  * head dropout — the flagship head hardcodes Dropout(0.5)
    (multilevel_gnn.py:116), active in train mode on torch's RNG stream
    vs ours on jax's; zeroed on BOTH sides (rmodel.head[2].p = 0 /
    cfg.head_drop_rate = 0) so the training trajectories are
    deterministic and comparable."""
import sys
import types

import numpy as np
import pytest
import torch

import pyg_shim

pyg_shim.install()

from ref_pipeline import run_reference_pipeline  # noqa: E402
from test_reference_pipeline_oracle import SHARED  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multilevel_gnn_tpu.core.batch import Batch  # noqa: E402
from multilevel_gnn_tpu.core.config import Config  # noqa: E402
from multilevel_gnn_tpu.data.loaders import load_cohort_from_files  # noqa: E402
from multilevel_gnn_tpu.models.multilevel_gnn import (  # noqa: E402
    MultilevelGNN,
    seed_pca_params,
)
from multilevel_gnn_tpu.train.step import build_train_fns  # noqa: E402

N_PATH = 146
GENES_PER_PATHWAY, OVERLAP = 59, 25  # -> 146*34+25 = 4989 genes
N_PATIENTS, N_EDGES, BS = 40, 4000, 8
EPOCHS = 2

FS_SHARED = dict(SHARED, dropout=0.0)  # determinism: no dropout draws


class _RefBatch:
    """What the PyG DataLoader would collate (offset = num_nodes = 15405,
    data.x is (15405, 1) after MyData.__getitem__'s reshape)."""

    def __init__(self, datas):
        n = datas[0].x.shape[0]
        self.x = torch.cat([d.x for d in datas], 0)
        self.y = torch.cat([d.y for d in datas], 0)
        self.edge_index = torch.cat(
            [d.edge_index + i * n for i, d in enumerate(datas)], 1
        )
        self.edge_attr = torch.cat([d.edge_attr for d in datas], 0)
        self.age = torch.tensor([float(d.age) for d in datas])
        self.gene_pca_match = torch.cat([d.gene_pca_match for d in datas], 0)
        self.raw_indice = torch.cat([d.raw_indice for d in datas], 0)

    def to(self, device):
        return self


class _SeqLoader:
    """Sequential fixed-order loader feeding the reference train()/eval()."""

    def __init__(self, dataset, idxs, bs, drop_last):
        self.batches = []
        chunks = [
            idxs[i : i + bs]
            for i in range(0, len(idxs) - (bs - 1 if drop_last else 0), bs)
        ]
        for c in chunks:
            self.batches.append(_RefBatch([dataset[int(i)] for i in c]))

    def __iter__(self):
        return iter(self.batches)

    def __len__(self):
        return len(self.batches)


def _our_batches(cohort, idxs, bs, drop_last):
    stop = len(idxs) - (bs - 1 if drop_last else 0)
    out = []
    for i in range(0, stop, bs):
        c = np.asarray(idxs[i : i + bs])
        out.append(
            Batch(
                x=jnp.asarray(cohort.X[c]),
                y=jnp.asarray(cohort.Y[c]),
                age=jnp.asarray(cohort.ages[c]),
                sample_mask=jnp.ones(len(c), bool),
            )
        )
    return out


def _inject(ref, pp, cfg):
    from test_reference_full_model import inject_params

    inject_params(ref, pp, cfg)


@pytest.mark.slow
def test_full_stack_training_and_eval_parity(tmp_path):
    d = str(tmp_path)
    overrides = dict(FS_SHARED, pathway_num=N_PATH)
    ref = run_reference_pipeline(
        d, overrides,
        dict(seed=7, n_patients=N_PATIENTS, n_pathways=N_PATH,
             genes_per_pathway=GENES_PER_PATHWAY, overlap=OVERLAP,
             n_edges=N_EDGES),
    )
    args, dataset = ref["args"], ref["dataset"]
    train_idx, valid_idx, test_idx = (
        ref["train_idx"], ref["valid_idx"], ref["test_idx"]
    )
    assert args.node_num + N_PATH == 5135, (
        "fixture must hit the reference's hardcoded node_num "
        "(multilevel_gnn.py:34)"
    )

    # ---- our pipeline on the same files ----
    cfg = Config(
        epochs=EPOCHS, num_run=1, kernel_backend="xla",
        head_drop_rate=0.0, **FS_SHARED
    )
    cohort = load_cohort_from_files(
        f"{d}/raw_mrna.csv", f"{d}/raw_cnv.csv", f"{d}/raw_methylation.csv",
        f"{d}/clinical.pkl", f"{d}/kegg.csv", f"{d}/pathways.txt",
        f"{d}/grn_edges.tsv", cfg,
    )
    fold = cohort.fold(train_idx, 0)
    np.testing.assert_array_equal(
        np.asarray(ref["mask"]).reshape(-1), fold.info_mask.reshape(-1)
    )

    # ---- our model/params via the production step builder ----
    model = MultilevelGNN(cfg)
    fns = build_train_fns(model, cfg)
    steps_per_epoch = len(train_idx) // BS
    our_train = _our_batches(cohort, train_idx, BS, drop_last=True)
    params, opt_state = fns.init_state(
        jax.random.PRNGKey(0), our_train[0], fold.ctx, steps_per_epoch
    )
    params = seed_pca_params(params, jnp.asarray(fold.pca_seed))

    # ---- reference model exactly as train.py:290-299 wires it ----
    from models.multilevel_gnn import MultilevelGNN as RefModel

    rmodel = RefModel(args)
    rmodel.set_pathway_indexs(dataset.all_indice)
    rmodel.set_info_mask(ref["mask"])
    rmodel.set_pca_params(dataset.pca_components, ref["mask"])
    # the reference's own PCA seeding == our driver's seed_pca_params
    np.testing.assert_allclose(
        rmodel.learnable_pca_params.detach().numpy(),
        np.asarray(params["params"]["learnable_pca_params"]),
        atol=1e-6,
    )
    _inject(rmodel, params["params"], cfg)
    rmodel.head[2].p = 0.0  # determinism shim: see module docstring

    # ---- the ACTUAL reference train()/eval() with sequential loaders ----
    import train as ref_train_mod

    device = torch.device("cpu")
    train_loader = _SeqLoader(dataset, train_idx, BS, drop_last=True)
    valid_loader = _SeqLoader(dataset, valid_idx, BS, drop_last=False)
    test_loader = _SeqLoader(dataset, test_idx, BS, drop_last=False)
    criterion_weight = ref["weight"]
    criterion = torch.nn.BCELoss(weight=torch.tensor(criterion_weight))
    criterion_weightless = torch.nn.BCELoss()
    optimizer = torch.optim.Adam(
        rmodel.parameters(), lr=args.lr, betas=(args.beta1, args.beta2),
        weight_decay=args.wd,
    )

    class_weight = jnp.asarray(fold.class_weight, jnp.float32)
    rng = jax.random.PRNGKey(1)
    for epoch in range(EPOCHS):
        ref_epoch_loss = ref_train_mod.train(
            rmodel, device, train_loader, optimizer, criterion,
            torch.tensor(criterion_weight), args,
        )
        our_losses = []
        for b in our_train:
            rng, sub = jax.random.split(rng)
            params, opt_state, loss = fns.train_step(
                params, opt_state, b, fold.ctx, class_weight, sub
            )
            our_losses.append(float(loss))
        np.testing.assert_allclose(
            float(ref_epoch_loss), float(np.mean(our_losses)), rtol=2e-3,
            err_msg=f"epoch {epoch} mean train loss diverged",
        )

    # ---- eval: the actual reference eval() vs our eval_step ----
    from sklearn.metrics import roc_auc_score

    for name, loader, idxs in (
        ("valid", valid_loader, valid_idx),
        ("test", test_loader, test_idx),
    ):
        r_eval, r_acc, r_auc, r_res, r_loss = ref_train_mod.eval(
            rmodel, device, loader, roc_auc_score, criterion_weightless,
            args,
        )
        preds, losses = [], []
        for b in _our_batches(cohort, idxs, BS, drop_last=False):
            pred, loss = fns.eval_step(params, b, fold.ctx)
            preds.append(np.asarray(pred))
            # our eval loss is the masked per-batch mean == torch BCELoss()
            # (mean reduction) on the reference's un-padded batch
            losses.append(float(loss))
        pred = np.concatenate(preds)
        # reference eval() pools statistics.mean over per-batch means
        # (train.py:90,110) — compare unweighted
        np.testing.assert_allclose(
            float(r_loss), float(np.mean(losses)), rtol=5e-3,
            err_msg=f"{name} eval loss diverged",
        )
        np.testing.assert_allclose(
            r_res["y_pred"][:, None], pred[:, :1], rtol=5e-3,
            atol=5e-4, err_msg=f"{name} predictions diverged",
        )
        # reference eval() scores column 0 against y[:, 0] >= 0.5
        # (train.py:104-109) — mirror that exactly
        our_auc = roc_auc_score(
            np.asarray(cohort.Y[idxs])[:, 0] >= 0.5, pred[:, 0]
        )
        np.testing.assert_allclose(r_auc, our_auc, atol=1e-6,
                                   err_msg=f"{name} AUC diverged")
        # reference acc: accuracy_score(y_true, pred[:, 0] > 0.5)
        # (train.py:94,103-105)
        from sklearn.metrics import accuracy_score

        our_acc = accuracy_score(
            np.asarray(cohort.Y[idxs])[:, 0] >= 0.5, pred[:, 0] > 0.5
        )
        np.testing.assert_allclose(r_acc, our_acc, atol=1e-6,
                                   err_msg=f"{name} accuracy diverged")
