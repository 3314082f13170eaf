"""Explanation driver: integrated gradients + pathway survival screening.

The reference implies an explanation/IG workflow (opt.py:432-433 igscore
flags; utils/km_util.py:29 imports a missing 'optimizer' explain module;
multiloader.get_explain_data :909-933) that is absent from its snapshot.
This module provides it first-class:

  * integrated_gradients(): IG attribution of the predicted risk w.r.t. the
    input omics node values (captum-equivalent, pure jax.grad + midpoint
    Riemann sum).
  * pathway_attributions(): fold gene attributions into per-pathway scores
    via the PCA-row mapping.
  * explain_cohort(): IG + per-pathway KM/log-rank screen (utils/survival).
"""
from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from multilevel_gnn_tpu.core.batch import Batch, FoldContext


# jitted-IG memo: one compiled executable per (model, steps, target_col) —
# params/ctx/batch ride as pytree ARGUMENTS so the CLI's per-chunk calls
# (and per-fold reloads) reuse the same wrapper instead of re-tracing and
# re-loading the program every chunk (advisor r4 medium finding).
_IG_FNS: dict = {}


def _ig_fn(model, steps: int, target_col: int):
    key = (id(model), steps, target_col)
    hit = _IG_FNS.get(key)
    if hit is not None and hit[0] is model:  # id() reuse guard
        return hit[1]

    def f(params, ctx, batch, xi):
        b = Batch(x=xi, y=batch.y, age=batch.age,
                  sample_mask=batch.sample_mask, raw_data=batch.raw_data)
        pred, _ = model.apply(params, b, ctx, False)
        return pred[:, target_col].sum()

    grad_f = jax.grad(f, argnums=3)

    @jax.jit
    def ig(params, ctx, batch, x, x0):
        alphas = jnp.asarray(
            (np.arange(steps) + 0.5) / steps, dtype=x.dtype
        )  # midpoint rule

        def body(tot, a):
            return tot + grad_f(params, ctx, batch, x0 + a * (x - x0)), None

        total, _ = jax.lax.scan(body, jnp.zeros_like(x), alphas)
        return (x - x0) * total / steps

    _IG_FNS[key] = (model, ig)
    return ig


def integrated_gradients(
    model,
    params,
    batch: Batch,
    ctx: FoldContext,
    target_col: int = 0,
    steps: int = 32,
    baseline=None,
):
    """IG(x) = (x - x0) * mean_k d f(x0 + k/steps (x - x0)) / dx.

    One jitted dispatch: the midpoint accumulation is a ``lax.scan`` over
    the step axis (memory = a single gradient; an unrolled host loop would
    pay 2 tunnel round trips per step and an op-by-op backward).  The
    jitted wrapper is memoized per (model, steps, target_col) so repeated
    calls — the CLI chunk loop — share one compiled executable."""
    x = batch.x
    x0 = jnp.zeros_like(x) if baseline is None else baseline
    return _ig_fn(model, steps, target_col)(params, ctx, batch, x, x0)


def pathway_attributions(
    attributions: jax.Array, ctx: FoldContext, n_pathways: int
) -> np.ndarray:
    """(B, NODES) gene-slot attributions -> (B, P) pathway scores via the
    PCA-row mapping (|attribution| summed over member genes)."""
    att = np.abs(np.asarray(attributions))
    match = np.asarray(ctx.gene_pca_match)
    slot = np.asarray(ctx.raw_indice) // 3  # pathway index per PCA row
    out = np.zeros((att.shape[0], n_pathways))
    valid = match >= 0
    np.add.at(out, (slice(None), slot[valid]), att[:, match[valid]])
    return out


def explain_cohort(
    model, params, cohort, ctx: FoldContext, batch: Batch,
    steps: int = 16, idx=None,
) -> List[Dict]:
    """IG + per-pathway survival screen; returns rows sorted by log-rank p.

    idx: cohort patient indices of the batch rows (default: the first
    batch-size patients in cohort order)."""
    from multilevel_gnn_tpu.utils.survival import pathway_km_screen

    ig = integrated_gradients(model, params, batch, ctx, steps=steps)
    scores = pathway_attributions(ig, ctx, cohort.n_pathways)
    n = scores.shape[0]
    if idx is None:
        idx = np.arange(n)
    pats = [cohort.patients[i] for i in np.asarray(idx)[:n]]
    times = np.array([cohort.survive_time[p] for p in pats])
    events = np.array([cohort.survive_state[p] for p in pats])
    return pathway_km_screen(scores, times, events, cohort.used_pathways)


def main(argv=None):
    """``mgtpu-explain``: IG pathway attributions + KM screen for a trained
    checkpoint — the reference's implied igscore/KM workflow as one
    command (mirrors mgtpu-predict's checkpoint/fold plumbing)."""
    import argparse
    import json
    import logging

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--ckpt-dir", required=True)
    ap.add_argument("--run", type=int, default=0)
    ap.add_argument("--fold", type=int, default=0)
    ap.add_argument("--step", type=int, default=None,
                    help="checkpoint step (default: latest)")
    ap.add_argument("--split", default="test",
                    choices=["test", "valid", "train", "all"])
    ap.add_argument("--ig-steps", type=int, default=16,
                    help="integrated-gradients Riemann steps")
    ap.add_argument("--top", type=int, default=20,
                    help="pathways printed (all rows go to --out)")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--debug", action="store_true")
    ap.add_argument("--out", default=None, help="attribution rows json path")
    ap.add_argument("--set", nargs="*", default=[], help="key=value overrides")
    args = ap.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

    import jax.numpy as jnp

    from multilevel_gnn_tpu.core.config import Config
    from multilevel_gnn_tpu.train.cli import make_cohort, parse_overrides
    from multilevel_gnn_tpu.train.predict import load_fold_state
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

    st = load_fold_state(
        cfg, cohort, args.ckpt_dir, args.run, args.fold, step=args.step
    )
    idx = np.asarray(st["splits"][args.split])
    X = np.asarray(st["X"])

    # chunk the split at the training batch size: bounds device memory at
    # reference scale (a whole 'all' split is 400 x 15405-slot activations
    # through a backward) and reuses ONE compiled IG executable across
    # chunks (tail padded, padded rows discarded)
    from multilevel_gnn_tpu.utils.survival import pathway_km_screen

    if not len(idx):
        raise SystemExit(
            f"split {args.split!r} is empty for run {args.run} fold "
            f"{args.fold} — nothing to explain"
        )
    bs = cfg.batch_size
    scores = []
    for lo in range(0, len(idx), bs):
        part = idx[lo:lo + bs]
        pad = bs - len(part)
        part_p = np.concatenate([part, np.repeat(part[-1:], pad)])
        batch = Batch(
            x=jnp.asarray(X[part_p]),
            y=jnp.asarray(cohort.Y[part_p]),
            age=jnp.asarray(cohort.ages[part_p]),
            sample_mask=jnp.arange(bs) < len(part),
        )
        ig = integrated_gradients(
            st["model"], st["params"], batch, st["ctx"], steps=args.ig_steps
        )
        scores.append(
            pathway_attributions(ig, st["ctx"], cohort.n_pathways)[: len(part)]
        )
    scores = np.concatenate(scores, axis=0)
    pats = [cohort.patients[i] for i in idx]
    times = np.array([cohort.survive_time[p] for p in pats])
    events = np.array([cohort.survive_state[p] for p in pats])
    rows = pathway_km_screen(scores, times, events, cohort.used_pathways)
    print(json.dumps({
        "run": args.run, "fold": args.fold, "split": args.split,
        "patients": int(len(idx)),
        "top_pathways": rows[: args.top],
    }))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
