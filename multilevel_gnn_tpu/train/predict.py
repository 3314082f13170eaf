"""Offline prediction / serving: load a trained checkpoint, score a cohort.

The reference has no inference entrypoint — trained models live only inside
``train.py``'s in-memory loop and the final ``results.pth`` dump
(reference train.py:338-382).  For production serving this module closes
that gap: it re-derives the deterministic (run, fold) split and fold context
(MI masks, PCA seeds, edge re-selection — exactly what ``run_fold`` builds,
via the shared ``fold_setup``), loads the orbax checkpoint written by the
experiment driver (``--ckpt-dir``), and emits per-patient probabilities +
AUC/ACC for any split.

CLI::

    python -m multilevel_gnn_tpu.train.predict --config configs/gbm.yaml \
        --ckpt-dir CKPT [--run 0 --fold 0] [--split test|valid|train|all] \
        [--synthetic | --data-dir DIR] [--out preds.json]
"""
from __future__ import annotations

import argparse
import json
import logging
from typing import Dict, Optional

import jax
import numpy as np


def load_fold_state(
    cfg,
    cohort,
    ckpt_dir: Optional[str],
    run_i: int = 0,
    fold_i: int = 0,
    step: Optional[int] = None,
    params=None,
) -> Dict:
    """Re-derive one (run, fold)'s deterministic splits + fold context and
    load its driver checkpoint.  Shared by the predict and explain CLIs.

    params: pass an in-memory param tree to skip the checkpoint load (used
    by tests to check train->save->predict round trips).

    Returns dict with cfg, fold, ctx, X, raw, model, fns, params, and the
    split index arrays (train/valid/test/all)."""
    from multilevel_gnn_tpu.train import checkpoint as C
    from multilevel_gnn_tpu.train.driver import (
        _shared_fns,
        fold_setup,
        iter_batches,
        stratified_kfold,
    )

    labels = cohort.labels()
    outer = stratified_kfold(labels, 5, cfg.split_shaffle, cfg.split_seed)
    tune, test_idx = outer[fold_i]
    inner = stratified_kfold(labels[tune], 5, cfg.split_shaffle, cfg.split_seed)
    tr, va = inner[0]
    train_idx, valid_idx = tune[tr], tune[va]
    splits = {
        "test": test_idx,
        "valid": valid_idx,
        "train": train_idx,
        "all": np.arange(len(labels)),
    }

    cfg, fold, X, raw = fold_setup(cfg, cohort, train_idx, fold_i)
    ctx = fold.ctx
    steps_per_epoch = max(len(train_idx) // cfg.batch_size, 1)
    model, fns = _shared_fns(cfg, cohort, steps_per_epoch)

    if params is None:
        import os

        init_batch = next(
            iter_batches(
                X, cohort.Y, cohort.ages, train_idx, cfg.batch_size,
                np.random.RandomState(0), False, False, raw=raw,
            )
        )
        like_params, like_opt = fns.init_state(
            jax.random.PRNGKey(0), init_batch, ctx, steps_per_epoch
        )
        if ckpt_dir is None:
            # explicit no-checkpoint mode (bench export_eval arm / shape
            # probes): deterministic PRNGKey(0)-initialized params
            params = like_params
        else:
            tag_dir = os.path.join(ckpt_dir, f"run{run_i}_fold{fold_i}")
            tree, _ = C.load_checkpoint(
                tag_dir, {"params": like_params, "opt_state": like_opt},
                step=step,
            )
            params = tree["params"]

    return {
        "cfg": cfg, "fold": fold, "ctx": ctx, "X": X, "raw": raw,
        "model": model, "fns": fns, "params": params, "splits": splits,
    }


def predict_fold(
    cfg,
    cohort,
    ckpt_dir: str,
    run_i: int = 0,
    fold_i: int = 0,
    split: str = "test",
    step: Optional[int] = None,
    params=None,
) -> Dict:
    """Score one (run, fold)'s ``split`` patients with its checkpoint."""
    from multilevel_gnn_tpu.train.driver import evaluate

    st = load_fold_state(cfg, cohort, ckpt_dir, run_i, fold_i, step, params)
    cfg, ctx, X, raw = st["cfg"], st["ctx"], st["X"], st["raw"]
    fns, params = st["fns"], st["params"]
    idx = st["splits"][split]

    auc, acc, y_true, score, loss = evaluate(
        fns, params, ctx, X, cohort.Y, cohort.ages, idx, cfg.batch_size,
        raw=raw,
    )
    patients = [cohort.patients[i] for i in np.asarray(idx)]
    return {
        "run": run_i,
        "fold": fold_i,
        "split": split,
        "patients": patients,
        "prob": [float(p) for p in score],
        "y_true": [int(v) for v in y_true],
        "auc": float(auc),
        "acc": float(acc),
        "loss": float(loss),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--ckpt-dir", required=True)
    ap.add_argument("--run", type=int, default=0)
    ap.add_argument("--fold", type=int, default=0)
    ap.add_argument("--step", type=int, default=None,
                    help="checkpoint step (default: latest)")
    ap.add_argument("--split", default="test",
                    choices=["test", "valid", "train", "all"])
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--debug", action="store_true")
    ap.add_argument("--out", default=None, help="predictions json path")
    ap.add_argument("--set", nargs="*", default=[], help="key=value overrides")
    args = ap.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

    from multilevel_gnn_tpu.core.config import Config
    from multilevel_gnn_tpu.train.cli import make_cohort, parse_overrides
    from multilevel_gnn_tpu.utils.runtime import (
        configure_backend,
        enable_compilation_cache,
    )

    enable_compilation_cache()
    cfg = Config.from_yaml(args.config, **parse_overrides(args.set))
    if args.debug:
        cfg = cfg.replace(num_run=1, epochs=5, batch_size=8)
    configure_backend(cfg)
    cohort = make_cohort(cfg, args.synthetic, args.data_dir, args.debug)

    res = predict_fold(cfg, cohort, args.ckpt_dir, args.run, args.fold,
                       args.split, step=args.step)
    print(json.dumps({k: res[k] for k in
                      ("run", "fold", "split", "auc", "acc", "loss")}))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f, indent=2)


if __name__ == "__main__":
    main()
