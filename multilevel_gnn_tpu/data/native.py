"""ctypes bridge to the C++ data-pipeline fast paths (csrc/).

Falls back silently when the shared library has not been built; pure-Python
paths remain the correctness oracles.  Build: ``make -C csrc``.
"""
from __future__ import annotations

import ctypes
import os
from typing import List, Tuple

_LIB = None


def _lib():
    global _LIB
    if _LIB is None:
        # MGTPU_NATIVE_LIB overrides for installed (non-repo) layouts where
        # csrc/ is not two levels above the package.
        path = os.environ.get("MGTPU_NATIVE_LIB") or os.path.join(
            os.path.dirname(__file__), "..", "..", "csrc", "libmgtpu.so"
        )
        _LIB = ctypes.CDLL(os.path.abspath(path))
        _LIB.parse_edge_tsv.restype = ctypes.c_void_p
        _LIB.parse_edge_tsv.argtypes = [ctypes.c_char_p]
        _LIB.edge_count.restype = ctypes.c_long
        _LIB.edge_count.argtypes = [ctypes.c_void_p]
        _LIB.edge_src.restype = ctypes.c_char_p
        _LIB.edge_src.argtypes = [ctypes.c_void_p, ctypes.c_long]
        _LIB.edge_dst.restype = ctypes.c_char_p
        _LIB.edge_dst.argtypes = [ctypes.c_void_p, ctypes.c_long]
        _LIB.edge_val.restype = ctypes.c_double
        _LIB.edge_val.argtypes = [ctypes.c_void_p, ctypes.c_long]
        _LIB.free_edges.argtypes = [ctypes.c_void_p]
    return _LIB


def parse_edge_tsv(path: str) -> Tuple[List[str], List[str], List[float]]:
    lib = _lib()
    h = lib.parse_edge_tsv(path.encode())
    if not h:
        raise RuntimeError(f"parse failed: {path}")
    try:
        n = lib.edge_count(h)
        srcs = [lib.edge_src(h, i).decode() for i in range(n)]
        dsts = [lib.edge_dst(h, i).decode() for i in range(n)]
        vals = [lib.edge_val(h, i) for i in range(n)]
    finally:
        lib.free_edges(h)
    return srcs, dsts, vals


def mi_classif(x, y, n_neighbors: int = 3, random_state=None, n_threads=0):
    """sklearn.feature_selection.mutual_info_classif, value-exact, via the
    threaded C++ 1-D kNN core (csrc/mi_knn.cc).

    The preprocessing replicates sklearn's _estimate_mi bit-for-bit in
    numpy (scale(with_mean=False) + the SAME seeded 1e-10 noise draw), and
    digamma is evaluated on a scipy table of the integer arguments the
    estimator actually uses — so per-feature MI values agree with sklearn
    to summation-order rounding (~1e-15 relative; tests assert identical
    downstream feature masks).  ~100x faster than sklearn at cohort scale
    (the per-feature KDTree + joblib dispatch is pure overhead in 1-D).
    """
    import numpy as np
    from scipy.special import digamma
    from sklearn.preprocessing import scale
    from sklearn.utils import check_random_state

    lib = _lib()
    lib.mi_cd_batch.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_long, ctypes.c_long,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int,
    ]

    x = np.asarray(x, np.float64).copy()
    n, g = x.shape
    # NOTE: sklearn picks BRUTE kneighbors when k_eff >= class_count // 2
    # (neighbors/_base.py auto rule), whose GEMM-expansion euclidean rounds
    # differently from KDTree's sqrt((a-b)^2).  The C++ core replicates
    # BOTH regimes bit-exactly (csrc/mi_knn.cc skdist_brute), so tiny
    # classes no longer fall back to sklearn wholesale (which cost ~60 s
    # at 40 patients x 25k features — the r2 same-scale prep anchor).
    # sklearn _estimate_mi preprocessing, same op order + same RNG draws.
    # The continuous_mask fancy index matters: X[:, bool_mask] returns an
    # F-CONTIGUOUS copy, and np.nanstd's pairwise summation order differs
    # between C and F layouts by ~1 ulp — enough to flip nextafter-shrunk
    # radius counts.  Replicate the exact op sequence, mask included.
    rng = check_random_state(random_state)
    cm = np.ones(g, bool)
    x[:, cm] = scale(x[:, cm], with_mean=False, copy=False)
    means = np.maximum(1, np.mean(np.abs(x[:, cm]), axis=0))
    x[:, cm] += 1e-10 * means * rng.standard_normal(size=(n, g))

    _, codes = np.unique(np.asarray(y), return_inverse=True)
    codes = np.ascontiguousarray(codes, np.int32)
    n_classes = int(codes.max()) + 1 if n else 1
    tab = np.ascontiguousarray(
        digamma(np.maximum(np.arange(n + 1), 1).astype(np.float64))
    )
    x = np.ascontiguousarray(x)
    out = np.empty(g, np.float64)
    lib.mi_cd_batch(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n, g,
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_classes, int(n_neighbors),
        tab.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        int(n_threads),
    )
    return out


def mi_regression(x, y, n_neighbors: int = 3, random_state=None,
                  n_threads=0):
    """sklearn.feature_selection.mutual_info_regression, value-exact, via
    the threaded C++ Kraskov cc core (csrc/mi_knn.cc).  Chebyshev
    distances have no sqrt rounding, so no brute-regime fallback is
    needed (sklearn's brute chebyshev computes the same max|diff|)."""
    import numpy as np
    from scipy.special import digamma
    from sklearn.preprocessing import scale
    from sklearn.utils import check_random_state

    lib = _lib()
    lib.mi_cc_batch.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_long, ctypes.c_long,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int,
    ]

    x = np.asarray(x, np.float64).copy()
    n, g = x.shape
    # sklearn _estimate_mi preprocessing, same op order + same RNG draws:
    # X noise first (n x g), then y noise (n).  The boolean-mask fancy
    # index is layout-significant (F-order copy -> different nanstd
    # summation order); see mi_classif.
    rng = check_random_state(random_state)
    cm = np.ones(g, bool)
    x[:, cm] = scale(x[:, cm], with_mean=False, copy=False)
    means = np.maximum(1, np.mean(np.abs(x[:, cm]), axis=0))
    x[:, cm] += 1e-10 * means * rng.standard_normal(size=(n, g))
    y = scale(np.asarray(y, np.float64), with_mean=False)
    y = y + 1e-10 * np.maximum(1, np.mean(np.abs(y))) * (
        rng.standard_normal(size=n)
    )

    tab = np.ascontiguousarray(
        digamma(np.maximum(np.arange(n + 1), 1).astype(np.float64))
    )
    x = np.ascontiguousarray(x)
    y = np.ascontiguousarray(y)
    out = np.empty(g, np.float64)
    lib.mi_cc_batch(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n, g,
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        int(n_neighbors),
        tab.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        int(n_threads),
    )
    return out


def fill_node_features(values, col_slot, n_slots: int):
    """C++ scatter of (patients x cols) values into node-slot features —
    the hot loop of reference predefine_data (multiloader.py:949-971)."""
    import numpy as np

    lib = _lib()
    lib.fill_node_features.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_long,
        ctypes.POINTER(ctypes.c_long), ctypes.c_long,
        ctypes.POINTER(ctypes.c_float),
    ]
    values = np.ascontiguousarray(values, np.float32)
    col_slot = np.ascontiguousarray(col_slot, np.int64)
    n_p, n_c = values.shape
    out = np.zeros((n_p, n_slots), np.float32)
    lib.fill_node_features(
        values.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_p, n_c,
        col_slot.ctypes.data_as(ctypes.POINTER(ctypes.c_long)), n_slots,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
