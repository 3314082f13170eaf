"""Kraskov (KSG) k-NN mutual information estimators.

Replaces reference utils/knnie.py (Weihao Gao's estimator collection):

- ``kraskov_mi``        — reference utils/knnie.py:17-53 (used by the
  --knn_mutual_info edge-selection path, reference multiloader.py:838-868).
- ``revised_mi``        — utils/knnie.py:56-88 (revised KSG,
  arxiv.org/abs/1604.03006; unused by the reference pipeline but part of
  its public surface).
- ``kraskov_multi_mi``  — utils/knnie.py:91-130 (I(X;Y;Z) KSG form).
- ``revised_multi_mi``  — utils/knnie.py:133-172.
- ``vd``                — utils/knnie.py:176-180 (log-volume of the unit
  l_q ball in d dims).
- ``entropy``           — utils/knnie.py:182-193 (kNN differential
  entropy).  The reference body is Python-2 only (``np.mean(map(log, …))``
  returns NaN under py3 and its ``thre`` truncation result is computed but
  unused); we implement the formula it evidently intends:
  ``-digamma(k) + digamma(N) + vd(d,q) + d * mean(log(knn_dis))``.
- ``kde_entropy``       — utils/knnie.py:195-204 (resubstitution KDE
  entropy; same py2-ism fixed).

All implementations are vectorized scipy/numpy; value parity against the
reference formulas (exec'd from /root/reference) is asserted in
tests/test_aux_subsystems.py.
"""
from __future__ import annotations

import math

import numpy as np
from scipy.spatial import cKDTree
from scipy.special import digamma, gammaln


def vd(d: int, q: float = float("inf")) -> float:
    """Log-volume of the unit l_q ball in d dims (reference knnie.py:176-180)."""
    if q == float("inf"):
        return d * math.log(2)
    return d * (math.log(2) + gammaln(1 + 1.0 / q)) - gammaln(1 + d / q)


def kraskov_mi(x: np.ndarray, y: np.ndarray, k: int = 5) -> float:
    """KSG estimator I(X;Y), x: (n, dx), y: (n, dy); natural log units."""
    x = np.asarray(x, float)
    y = np.asarray(y, float)
    assert len(x) == len(y)
    n = len(x)
    if n <= k:
        return 0.0
    # small noise breaks ties (standard KSG practice)
    rng = np.random.RandomState(0)
    x = x + 1e-10 * rng.standard_normal(x.shape)
    y = y + 1e-10 * rng.standard_normal(y.shape)
    z = np.concatenate([x, y], axis=1)
    tree_z = cKDTree(z)
    dist, _ = tree_z.query(z, k=k + 1, p=np.inf)
    eps = dist[:, k]
    tree_x = cKDTree(x)
    tree_y = cKDTree(y)
    nx = np.array(
        [len(tree_x.query_ball_point(x[i], eps[i] - 1e-12, p=np.inf)) - 1
         for i in range(n)]
    )
    ny = np.array(
        [len(tree_y.query_ball_point(y[i], eps[i] - 1e-12, p=np.inf)) - 1
         for i in range(n)]
    )
    mi = (
        digamma(k)
        + digamma(n)
        - np.mean(digamma(nx + 1) + digamma(ny + 1))
    )
    return float(max(mi, 0.0))


def revised_mi(
    x: np.ndarray, y: np.ndarray, k: int = 5, q: float = float("inf")
) -> float:
    """Revised KSG estimator I(X;Y) (reference knnie.py:56-88).

    Gao et al., arxiv.org/abs/1604.03006: joint k-NN distance under l_q,
    marginal counts via CLOSED balls (note the reference's +1e-15 inclusive
    epsilon, vs the open ball of ``kraskov_mi``), log-count instead of
    digamma, and l_q ball-volume correction terms.  The per-sample
    ``d*log(knn_dis)`` terms cancel between the joint and marginal parts
    exactly as in the reference's running sums.
    """
    x = np.asarray(x, float)
    y = np.asarray(y, float)
    assert len(x) == len(y)
    n = len(x)
    if n <= k:
        return 0.0
    dx, dy = x.shape[1], y.shape[1]
    z = np.concatenate([x, y], axis=1)
    dist, _ = cKDTree(z).query(z, k=k + 1, p=q)
    eps = dist[:, k]
    tree_x = cKDTree(x)
    tree_y = cKDTree(y)
    # closed-ball counts minus self (reference: len(ball(+1e-15)) - 1)
    nx = np.array(
        [len(tree_x.query_ball_point(x[i], eps[i] + 1e-15, p=q)) - 1
         for i in range(n)]
    )
    ny = np.array(
        [len(tree_y.query_ball_point(y[i], eps[i] + 1e-15, p=q)) - 1
         for i in range(n)]
    )
    return float(
        digamma(k)
        + math.log(n)
        + vd(dx, q) + vd(dy, q) - vd(dx + dy, q)
        - np.mean(np.log(nx) + np.log(ny))
    )


def kraskov_multi_mi(
    x: np.ndarray, y: np.ndarray, z: np.ndarray, k: int = 5
) -> float:
    """KSG multivariate MI I(X;Y;Z) = H(X)+H(Y)+H(Z)-H(X,Y,Z)
    (reference knnie.py:91-130)."""
    x, y, z = (np.asarray(a, float) for a in (x, y, z))
    assert len(x) == len(y) == len(z)
    n = len(x)
    if n <= k:
        return 0.0
    data = np.concatenate([x, y, z], axis=1)
    dist, _ = cKDTree(data).query(data, k=k + 1, p=np.inf)
    eps = dist[:, k]
    # Reference's ans_x+ans_y+ans_z-ans_xyz with the per-sample
    # d*log(knn_dis) terms cancelling analytically:
    #   I = digamma(k) + 2*digamma(N) - sum_m mean(digamma(|ball_m|))
    # where |ball_m| is the OPEN-ball count including self (the reference
    # passes len(...) to digamma with no -1).
    total = digamma(k) + 2.0 * digamma(n)
    for a in (x, y, z):
        tree = cKDTree(a)
        cnt = np.array(
            [len(tree.query_ball_point(a[i], eps[i] - 1e-15, p=np.inf))
             for i in range(n)]
        )
        total -= np.mean(digamma(cnt))
    return float(total)


def revised_multi_mi(
    x: np.ndarray,
    y: np.ndarray,
    z: np.ndarray,
    k: int = 5,
    q: float = float("inf"),
) -> float:
    """Revised multivariate MI (reference knnie.py:133-172)."""
    x, y, z = (np.asarray(a, float) for a in (x, y, z))
    assert len(x) == len(y) == len(z)
    n = len(x)
    if n <= k:
        return 0.0
    dims = (x.shape[1], y.shape[1], z.shape[1])
    data = np.concatenate([x, y, z], axis=1)
    dist, _ = cKDTree(data).query(data, k=k + 1, p=q)
    eps = dist[:, k]
    out = digamma(k) + 2.0 * math.log(n)
    out += sum(vd(d, q) for d in dims) - vd(sum(dims), q)
    for a in (x, y, z):
        tree = cKDTree(a)
        cnt = np.array(
            [len(tree.query_ball_point(a[i], eps[i] + 1e-15, p=q)) - 1
             for i in range(n)]
        )
        out -= np.mean(np.log(cnt))
    return float(out)


def entropy(x: np.ndarray, k: int = 5, q: float = float("inf")) -> float:
    """kNN differential entropy H(X) (reference knnie.py:182-193; py2-ism
    and unused-truncation quirks fixed — see module docstring)."""
    x = np.asarray(x, float)
    n = len(x)
    assert k <= n - 1, "Set k smaller than num. samples - 1"
    d = x.shape[1]
    dist, _ = cKDTree(x).query(x, k=k + 1, p=q)
    knn_dis = np.maximum(dist[:, k], 1e-300)
    return float(
        -digamma(k) + digamma(n) + vd(d, q) + d * np.mean(np.log(knn_dis))
    )


def kde_entropy(x: np.ndarray) -> float:
    """Resubstitution KDE entropy (reference knnie.py:195-204, py2-ism
    fixed; the reference refits the same KDE per sample — we fit once)."""
    from scipy.stats import gaussian_kde

    x = np.asarray(x, float)
    kernel = gaussian_kde(x.T)
    dens = np.maximum(kernel.evaluate(x.T), 1e-300)
    return float(-np.mean(np.log(dens)))
