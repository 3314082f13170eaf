"""Measure the ACTUAL reference implementation on this host — the missing
BASELINE anchor.

BASELINE.md: "The quantitative baseline must be (re)established by running
the reference" (the reference repo publishes no numbers; train.py only
logs wall-clock at runtime, train.py:140,210-212).  This script runs the
reference's real code end to end on reference-format synthetic files:

  1. data preprocessing: dataloader/multiloader.py MyData.__init__
     (init_data + init_graph_grnboost2 + prepare_pca_result) and the
     train.py:290-307 per-fold derivation (MI mask + PCA recompute + edge
     re-selection) — the "Data preprocessing time" anchor,
  2. the train step: the reference train() (train.py:38-69) =
     fwd + weighted BCE + backward + optim.Adam on MultilevelGNN at the
     GBM protocol config (config/gbm.yaml: hidden 64, final 32, head 4,
     head_dim 256, batch 32) and GBM-REAL graph scale (N=15405 nodes,
     E=150k edges per patient graph — the same scale bench.py measures
     our TPU step at), with the PyG-collate batch layout the reference
     DataLoader produces (B offset copies of the graph),
  3. eval: the reference eval() (train.py:71-109) on the same batch.

Hardware note (recorded with the output): the reference targeted a CUDA
GPU; this environment has no CUDA, so these are torch-CPU numbers on this
host.  They anchor "reference code on available hardware" vs bench.py's
"this framework on TPU", and --ours-cpu adds the code-vs-code comparison
on IDENTICAL hardware (our XLA-CPU train step, same scale, same step
semantics).

Usage (from the repo root):
    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        PYTHONPATH=/root/repo:/root/.axon_site \
        python tools/bench_reference.py [--steps 3] [--edges 150000] \
            [--batch 32] [--ours-cpu]

Prints one JSON line per measurement; paste the summary into
docs/REFERENCE_BASELINE.md.
"""
import argparse
import json
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pyg_shim  # noqa: E402  (tests/pyg_shim.py)

pyg_shim.install()

import torch  # noqa: E402

from ref_pipeline import run_reference_pipeline  # noqa: E402
from test_reference_pipeline_oracle import SHARED  # noqa: E402

# the reference's true flagship shape (multilevel_gnn.py:34 hardcodes
# node_num 5135 incl. pathway rows; x.reshape(-1, 15405, 1) = 3 omics)
N_PATH = 146
GENES_PER_PATHWAY, OVERLAP = 59, 25  # -> 4989 genes, 5135 nodes
N_PATIENTS = 40
FIXTURE_EDGES = 4000  # preprocessing fixture; step bench re-scales below

# GBM protocol model dims (/root/reference/config/gbm.yaml)
GBM_PROTOCOL = dict(
    hidden_channels=64,
    final_channels=32,
    final_head=4,
    head_dim=256,
    node_embedding_dim=64,
    num_layer_head=2,
    batch_size=32,
    dropout=0.25,
)


class _RefBatch:
    """PyG-DataLoader collate layout (offset graph copies) at bench scale."""

    def __init__(self, datas, edge_index, edge_attr):
        n = datas[0].x.shape[0]
        e = edge_index.shape[1]
        self.x = torch.cat([d.x for d in datas], 0)
        self.y = torch.cat([d.y for d in datas], 0)
        offs = torch.arange(len(datas), dtype=edge_index.dtype) * n
        self.edge_index = (
            edge_index[:, None, :] + offs[None, :, None]
        ).reshape(2, len(datas) * e)
        self.edge_attr = edge_attr.repeat(len(datas), *([1] * (edge_attr.dim() - 1)))
        self.age = torch.tensor([float(d.age) for d in datas])
        self.gene_pca_match = torch.cat([d.gene_pca_match for d in datas], 0)
        self.raw_indice = torch.cat([d.raw_indice for d in datas], 0)

    def to(self, device):
        return self


class _OneBatchLoader:
    def __init__(self, batch):
        self.batches = [batch]

    def __iter__(self):
        return iter(self.batches)

    def __len__(self):
        return 1


def emit(metric, value, unit, **extra):
    print(json.dumps({"metric": metric, "value": value, "unit": unit,
                      **extra}), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--edges", type=int, default=150_000,
                    help="edges per patient graph for the step bench")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--ours-cpu", action="store_true",
                    help="also time OUR train step on CPU, same scale")
    ap.add_argument("--ours-prep", action="store_true",
                    help="also time OUR cohort load + fold derivation on "
                         "the SAME fixture files / scale as the reference "
                         "preprocessing anchor")
    ap.add_argument("--dir", default="/tmp/bench_reference_fixture")
    args = ap.parse_args()

    torch.manual_seed(0)
    rng = np.random.default_rng(0)

    # ---- 1. reference preprocessing (its real MyData + fold derivation) ----
    os.makedirs(args.dir, exist_ok=True)
    overrides = dict(SHARED, pathway_num=N_PATH, **GBM_PROTOCOL)
    t0 = time.perf_counter()
    ref = run_reference_pipeline(
        args.dir, overrides,
        dict(seed=7, n_patients=N_PATIENTS, n_pathways=N_PATH,
             genes_per_pathway=GENES_PER_PATHWAY, overlap=OVERLAP,
             n_edges=FIXTURE_EDGES),
    )
    prep_s = time.perf_counter() - t0
    emit("reference_preprocess_s", prep_s, "s",
         note=f"MyData init + fold-0 derivation, {N_PATIENTS} patients, "
              f"{N_PATH} pathways, {FIXTURE_EDGES} edges, torch-CPU host")

    rargs, dataset = ref["args"], ref["dataset"]
    assert rargs.node_num + N_PATH == 5135

    if args.ours_prep:
        # our side of the preprocessing anchor: SAME fixture files, same
        # 40-patient scale (ADVICE r2 #4 — the old table compared the
        # reference's 40-patient prep against our full-scale derivation)
        from multilevel_gnn_tpu.core.config import Config
        from multilevel_gnn_tpu.data.loaders import load_cohort_from_files

        cfg = Config(
            epochs=2, num_run=1,
            **{**SHARED, "pathway_num": N_PATH, **GBM_PROTOCOL},
        )
        for tag in ("cold", "warm"):
            t0 = time.perf_counter()
            cohort = load_cohort_from_files(
                f"{args.dir}/raw_mrna.csv",
                f"{args.dir}/raw_cnv.csv",
                f"{args.dir}/raw_methylation.csv",
                f"{args.dir}/clinical.pkl",
                f"{args.dir}/kegg.csv",
                f"{args.dir}/pathways.txt",
                f"{args.dir}/grn_edges.tsv",
                cfg,
            )
            cohort.fold(np.asarray(ref["train_idx"]), 0)
            emit(f"ours_preprocess_{tag}_s", time.perf_counter() - t0, "s",
                 note=f"cohort load + fold-0 derivation, SAME fixture as "
                      f"reference_preprocess_s ({N_PATIENTS} patients, "
                      f"{N_PATH} pathways, {FIXTURE_EDGES} edges)")

    # ---- 2. reference train()/eval() at GBM-REAL graph scale ----
    n_nodes = rargs.node_num + N_PATH  # 5135 per-omics rows; graph space
    # the reference edge space is the 5135-node per-patient graph
    e = args.edges
    senders = torch.from_numpy(rng.integers(0, n_nodes, e))
    receivers = torch.from_numpy(rng.integers(0, n_nodes, e))
    edge_index = torch.stack([senders, receivers]).long()
    proto_attr = dataset[0].edge_attr
    edge_attr = torch.from_numpy(
        rng.random((e,) + tuple(proto_attr.shape[1:]), dtype=np.float32)
    ).to(proto_attr.dtype)

    n_pat = len(dataset)
    # wrap around the fixture's patient count so --batch > n_patients
    # oversamples instead of raising IndexError
    idxs = [i % n_pat for i in range(args.batch)]
    datas = [dataset[int(i)] for i in idxs]
    batch = _RefBatch(datas, edge_index, edge_attr)
    loader = _OneBatchLoader(batch)

    from models.multilevel_gnn import MultilevelGNN as RefModel
    import train as ref_train_mod
    from sklearn.metrics import roc_auc_score

    model = RefModel(rargs)
    model.set_pathway_indexs(dataset.all_indice)
    model.set_info_mask(ref["mask"])
    model.set_pca_params(dataset.pca_components, ref["mask"])
    optimizer = torch.optim.Adam(
        model.parameters(), lr=rargs.lr, betas=(rargs.beta1, rargs.beta2),
        weight_decay=rargs.wd,
    )
    weight = torch.tensor(ref["weight"])
    criterion = torch.nn.BCELoss(weight=weight)
    device = torch.device("cpu")

    # one warmup step (allocator + thread-pool spin-up)
    ref_train_mod.train(model, device, loader, optimizer, criterion,
                        weight, rargs)
    times = []
    for _ in range(args.steps):
        t0 = time.perf_counter()
        ref_train_mod.train(model, device, loader, optimizer, criterion,
                            weight, rargs)
        times.append(time.perf_counter() - t0)
    step_s = statistics.median(times)
    edges_per_s = args.batch * e / step_s
    emit("reference_train_step_s", step_s, "s",
         edges_per_s=edges_per_s, batch=args.batch, edges_per_graph=e,
         threads=torch.get_num_threads(),
         note="actual reference train() (train.py:38-69), torch-CPU, "
              "GBM protocol dims, PyG-collate offset-copy batch")

    criterion_plain = torch.nn.BCELoss()
    ref_train_mod.eval(model, device, loader, roc_auc_score,
                       criterion_plain, rargs)  # warmup
    times = []
    for _ in range(args.steps):
        t0 = time.perf_counter()
        ref_train_mod.eval(model, device, loader, roc_auc_score,
                           criterion_plain, rargs)
        times.append(time.perf_counter() - t0)
    emit("reference_eval_step_s", statistics.median(times), "s",
         batch=args.batch, edges_per_graph=e)

    # ---- 3. our framework, SAME host CPU, same scale (optional) ----
    if args.ours_cpu:
        from bench import bench_train_step  # noqa: E402

        dt, compile_s, n_edges, bsz = bench_train_step(
            backend="xla", bf16=False, seed=1
        )
        emit("ours_cpu_train_step_s", dt, "s",
             edges_per_s=bsz * n_edges / dt, batch=bsz,
             edges_per_graph=int(n_edges), compile_s=compile_s,
             note="our train step (fwd+bwd+adam), XLA backend on this "
                  "host's CPU (run with JAX_PLATFORMS=cpu), same scale "
                  "(E incl self loops)")


if __name__ == "__main__":
    main()
