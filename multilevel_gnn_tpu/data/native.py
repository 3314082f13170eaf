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
