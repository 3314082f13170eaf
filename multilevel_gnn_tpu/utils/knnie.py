"""Kraskov (KSG) k-NN mutual information estimator.

Replaces reference utils/knnie.py:17-53 (kraskov_mi) with a scipy cKDTree
implementation, used by the --knn_mutual_info edge-selection path
(reference multiloader.py:838-868).
"""
from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree
from scipy.special import digamma


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
