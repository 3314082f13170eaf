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


def integrated_gradients(
    model,
    params,
    batch: Batch,
    ctx: FoldContext,
    target_col: int = 0,
    steps: int = 32,
    baseline=None,
):
    """IG(x) = (x - x0) * mean_k d f(x0 + k/steps (x - x0)) / dx."""
    x = batch.x
    x0 = jnp.zeros_like(x) if baseline is None else baseline

    def f(xi):
        b = Batch(x=xi, y=batch.y, age=batch.age,
                  sample_mask=batch.sample_mask, raw_data=batch.raw_data)
        pred, _ = model.apply(params, b, ctx, False)
        return pred[:, target_col].sum()

    grad_f = jax.grad(f)
    alphas = (np.arange(steps) + 0.5) / steps  # midpoint rule
    total = jnp.zeros_like(x)
    for a in alphas:
        total = total + grad_f(x0 + a * (x - x0))
    return (x - x0) * total / steps


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
    steps: int = 16,
) -> List[Dict]:
    """IG + per-pathway survival screen; returns rows sorted by log-rank p."""
    from multilevel_gnn_tpu.utils.survival import pathway_km_screen

    ig = integrated_gradients(model, params, batch, ctx, steps=steps)
    scores = pathway_attributions(ig, ctx, cohort.n_pathways)
    n = scores.shape[0]
    times = np.array([cohort.survive_time[p] for p in cohort.patients[:n]])
    events = np.array([cohort.survive_state[p] for p in cohort.patients[:n]])
    return pathway_km_screen(scores, times, events, cohort.used_pathways)
