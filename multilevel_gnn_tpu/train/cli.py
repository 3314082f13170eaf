"""Experiment CLI: ``python -m multilevel_gnn_tpu.train.cli --config
configs/gbm.yaml [--synthetic] [--data-dir DIR]``.

Replaces the reference entrypoint ``python train.py --config config/gbm.yaml``
(reference train.py:215-382).  With --synthetic, runs on a generated cohort
(the reference's TCGA drive data is external); with --data-dir, loads
reference-format CSVs.
"""
from __future__ import annotations

import argparse
import json
import logging
import os
import time


def parse_overrides(pairs):
    """--set key=value pairs -> dict (JSON-decoded values where possible);
    shared by the train and predict CLIs."""
    overrides = {}
    for kv in pairs:
        k, v = kv.split("=", 1)
        try:
            v = json.loads(v)
        except json.JSONDecodeError:
            pass
        overrides[k] = v
    return overrides


# Per-file fallback names under data_dir: OUR conventional name first,
# then the reference download's default filename (reference opt.py:19-62
# argparse defaults, './data/' prefix stripped) — so pointing --data-dir
# at an untouched reference data directory works without renaming.
_DATA_CANDIDATES = {
    "raw_mrna": ("{ct}/raw_mrna.csv", "{ct}/pathcnn_raw_mrna_pid_u133.csv"),
    "raw_cnv": ("{ct}/raw_cnv.csv", "{ct}/pathcnn_raw_cnv_pid.csv"),
    "raw_methylation": (
        "{ct}/raw_methylation.csv",
        "{ct}/pathcnn_raw_methylation_pid.csv",
    ),
    "clinical": ("{ct}/clinical.pkl", "{ct}/pathcnn_clinical_data.pkl"),
    "kegg": ("kegg.csv", "kegg_52.csv"),
    "pathway": ("pathways.txt", "pathcnn_pathway_codes.pkl"),
    "node": ("node.csv", "pathcnn_node.csv"),
    "edge": (
        "{ct}/grn_edges.tsv",
        "{ct}/pyscenic_adj_nes1.0_auc0.01_weighted_l1.tsv",
    ),
    "grn_edge": ("grn_edges.tsv", "adjacencies.csv"),
}


def _resolve_data_paths(cfg, data_dir):
    """Resolve the cohort's input files (reference opt.py:19-62 path
    flags; train.py:233-234 formatting semantics).

    Explicit path fields (cfg.raw_mrna_path, ...) win when set: '{}' is
    formatted with cancer_type exactly like the reference, and — when
    --data-dir is also given — a leading './data/' (the reference's
    repo-relative data root) is re-rooted under data_dir.  Unset fields
    fall back to the first existing candidate filename under data_dir
    (our conventional names, then the reference's defaults)."""
    d = data_dir or cfg.data_dir
    ct = cfg.cancer_type

    def resolve(key, explicit):
        if explicit:
            # only '{}' is a placeholder (reference train.py:233 .format
            # semantics); literal braces ('{ct}'-style paths, glob sets)
            # must not turn a path typo into an opaque format exception
            if "{}" in explicit:
                p = explicit.replace("{}", ct)
            else:
                p = explicit
            if data_dir and not os.path.isabs(p):
                for pre in ("./data/", "data/"):
                    if p.startswith(pre):
                        p = os.path.join(data_dir, p[len(pre):])
                        break
            return p
        cands = [
            os.path.join(d, c.format(ct=ct)) for c in _DATA_CANDIDATES[key]
        ]
        for c in cands:
            if os.path.exists(c):
                return c
        return cands[0]  # loader raises with the conventional name

    return {
        "mrna_path": resolve("raw_mrna", cfg.raw_mrna_path),
        "cnv_path": resolve("raw_cnv", cfg.raw_cnv_path),
        "methylation_path": resolve("raw_methylation", cfg.raw_methylation_path),
        "clinical_path": resolve("clinical", cfg.clinical_path),
        "kegg_path": resolve("kegg", cfg.kegg_path),
        "pathway_list_path": resolve("pathway", cfg.pathway_path),
        "edge_path": resolve("edge", cfg.edge_path),
        "ppi_node_path": (
            resolve("node", cfg.node_path)
            if cfg.edge_type in ("ppi", "merge")
            else None
        ),
        "grn_edge_path": (
            resolve("grn_edge", cfg.grn_edge_path)
            if cfg.edge_type == "merge"
            else None
        ),
    }


def make_cohort(cfg, synthetic: bool, data_dir=None, debug: bool = False):
    """Cohort construction shared by the train and predict CLIs."""
    if synthetic:
        from multilevel_gnn_tpu.data.synthetic import make_synthetic_cohort

        return make_synthetic_cohort(
            cfg,
            seed=cfg.seed,
            n_patients=60 if debug else 200,
            n_pathways=6 if debug else 20,
        )
    from multilevel_gnn_tpu.data.loaders import load_cohort_from_files

    return load_cohort_from_files(cfg=cfg, **_resolve_data_paths(cfg, data_dir))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--debug", action="store_true", help="tiny fast settings")
    ap.add_argument("--out", default=None, help="results json path")
    ap.add_argument(
        "--pretrain", default=None,
        choices=["autoencoder", "vae", "mmd_vae", "vq_vae"],
        help="reconstruction-pretrain the encoder first, then fine-tune",
    )
    ap.add_argument("--pretrain-epochs", type=int, default=None)
    ap.add_argument(
        "--mesh", default=None, metavar="DxM",
        help="device mesh, e.g. 4x2 = 4-way data x 2-way edge partition",
    )
    ap.add_argument(
        "--ckpt-dir", default=None,
        help="checkpoint dir; default cadence = one save per completed "
             "fold (keeps the whole-fold scan engaged). For mid-fold "
             "resume pass --set ckpt_every=N (per-epoch stepping, ~6x "
             "slower epochs — see core/config.py)",
    )
    ap.add_argument(
        "--resume", action="store_true",
        help="resume an interrupted experiment from --ckpt-dir",
    )
    ap.add_argument(
        "--fold-parallel", nargs="?", type=int, const=0, default=None,
        metavar="DEVICES",
        help="fold-vectorized CV: all (run, fold) units advance as one "
             "vmapped step; optional device count shards the unit axis",
    )
    ap.add_argument(
        "--profile-dir", default=None, metavar="DIR",
        help="capture a jax.profiler trace of the whole experiment "
             "(view in TensorBoard/Perfetto)",
    )
    ap.add_argument(
        "--bench-scaling", action="store_true",
        help="instead of training: run the halo-aggregation scaling bench "
             "at GBM scale over the --mesh model axis (multihost via "
             "MGTPU_COORDINATOR/MGTPU_NUM_PROC/MGTPU_PROC_ID env); one "
             "JSON line with edges/s/chip + efficiency + predicted wire "
             "bytes (docs/SCALING.md)",
    )
    ap.add_argument("--set", nargs="*", default=[], help="key=value overrides")
    args = ap.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

    from multilevel_gnn_tpu.core.config import Config
    from multilevel_gnn_tpu.utils.runtime import (
        configure_backend,
        enable_compilation_cache,
    )

    enable_compilation_cache()

    cfg = Config.from_yaml(args.config, **parse_overrides(args.set))
    if args.debug:
        cfg = cfg.replace(num_run=1, epochs=5, batch_size=8)
    if args.mesh:
        d, m = (int(v) for v in args.mesh.lower().split("x"))
        cfg = cfg.replace(mesh_data_axis=d, mesh_model_axis=m)
    if args.resume and not args.ckpt_dir:
        ap.error("--resume requires --ckpt-dir")
    # ckpt_every=0 + --ckpt-dir = fold-boundary checkpointing (the fold
    # scan stays engaged); no silent cadence promotion — driver.run_fold
    configure_backend(cfg)

    if args.bench_scaling:
        from multilevel_gnn_tpu.parallel.scaling import (
            maybe_init_multihost,
            run_bench_scaling,
        )

        maybe_init_multihost()
        run_bench_scaling(cfg)
        return

    cohort = make_cohort(cfg, args.synthetic, args.data_dir, args.debug)

    import contextlib

    from multilevel_gnn_tpu.utils.profiling import trace

    prof = trace(args.profile_dir) if args.profile_dir else (
        contextlib.nullcontext()
    )
    with prof:
        results = _run(args, ap, cfg, cohort)
    final_e = results["check_epochs"][-1]
    print(
        json.dumps(
            {
                "cancer_type": cfg.cancer_type,
                "model": cfg.model,
                "pooled_auc": results["auc"][final_e],
                "pooled_auc_by_loss": results["auc_by_loss"][final_e],
                "pooled_acc": results["acc"][final_e],
                "wall_time_s": results["wall_time_s"],
            }
        )
    )
    if args.out:
        import dataclasses

        # the reference writes command.txt next to results.pth
        # (train.py:225-226); embed the resolved config instead
        results["config"] = dataclasses.asdict(cfg)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


def _run(args, ap, cfg, cohort):
    from multilevel_gnn_tpu.train.driver import run_experiment

    if args.fold_parallel is not None:
        if args.pretrain or args.mesh:
            ap.error("--fold-parallel is incompatible with --pretrain/--mesh")
        import jax

        from multilevel_gnn_tpu.train.fold_parallel import (
            recommended_arm,
            run_experiment_foldparallel,
        )

        n_dev = args.fold_parallel or len(jax.devices())
        if recommended_arm(n_dev) == "sequential":
            logging.getLogger(__name__).warning(
                "--fold-parallel on a single device is DOMINATED by the "
                "epoch-scanned sequential driver (measured v5e 2026-08-19: "
                "24 s vs 62 s CV wall) — proceeding as asked; drop the "
                "flag for the faster arm, or shard units with "
                "--fold-parallel N on a multi-chip mesh"
            )
        return run_experiment_foldparallel(
            cfg, cohort, devices=args.fold_parallel or None,
            ckpt_dir=args.ckpt_dir, resume=args.resume,
        )
    return run_experiment(
        cfg, cohort, pretrain=args.pretrain,
        pretrain_epochs=args.pretrain_epochs,
        ckpt_dir=args.ckpt_dir, resume=args.resume,
    )


if __name__ == "__main__":
    main()
