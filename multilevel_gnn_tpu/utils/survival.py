"""Kaplan-Meier survival analysis + log-rank tests (SURVEY.md §5.5).

Replaces reference utils/km_util.py:44-141 (which depends on lifelines,
absent here) with numpy/scipy implementations: KM survival curves per
group, the two-group log-rank test, and the per-pathway screening loop the
reference uses for explanation (LaTeX table output preserved as CSV/text).
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np


def km_curve(times: np.ndarray, events: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Kaplan-Meier estimator.  times: durations; events: 1=event, 0=censor.
    Returns (unique event times, survival probability after each)."""
    times = np.asarray(times, float)
    events = np.asarray(events, int)
    order = np.argsort(times)
    times, events = times[order], events[order]
    uniq = np.unique(times[events == 1])
    n = len(times)
    surv = []
    s = 1.0
    for t in uniq:
        at_risk = np.sum(times >= t)
        d = np.sum((times == t) & (events == 1))
        s *= 1.0 - d / at_risk
        surv.append(s)
    return uniq, np.array(surv)


def logrank_test(
    times_a, events_a, times_b, events_b
) -> Tuple[float, float]:
    """Two-group log-rank test; returns (chi2 statistic, p value)."""
    from scipy.stats import chi2 as chi2_dist

    ta, ea = np.asarray(times_a, float), np.asarray(events_a, int)
    tb, eb = np.asarray(times_b, float), np.asarray(events_b, int)
    all_t = np.unique(np.concatenate([ta[ea == 1], tb[eb == 1]]))
    o_minus_e = 0.0
    var = 0.0
    for t in all_t:
        n_a = np.sum(ta >= t)
        n_b = np.sum(tb >= t)
        d_a = np.sum((ta == t) & (ea == 1))
        d_b = np.sum((tb == t) & (eb == 1))
        n = n_a + n_b
        d = d_a + d_b
        if n < 2:
            continue
        e_a = d * n_a / n
        o_minus_e += d_a - e_a
        var += d * (n_a / n) * (n_b / n) * (n - d) / max(n - 1, 1)
    if var == 0:
        return 0.0, 1.0
    chi2 = o_minus_e**2 / var
    return float(chi2), float(chi2_dist.sf(chi2, df=1))


def pathway_km_screen(
    scores: np.ndarray,
    times: np.ndarray,
    events: np.ndarray,
    pathway_names: Sequence[str],
    threshold: str = "median",
) -> List[Dict]:
    """Per-pathway KM split + log-rank p (reference km_util.py:44-115):
    split patients by each pathway score's median, test survival separation.
    Returns rows sorted by p value."""
    rows = []
    for i, name in enumerate(pathway_names):
        s = scores[:, i]
        thr = np.median(s) if threshold == "median" else np.mean(s)
        hi = s >= thr
        if hi.all() or (~hi).all():
            continue
        chi2, p = logrank_test(times[hi], events[hi], times[~hi], events[~hi])
        rows.append({"pathway": name, "chi2": chi2, "p": p,
                     "n_high": int(hi.sum()), "n_low": int((~hi).sum())})
    return sorted(rows, key=lambda r: r["p"])
