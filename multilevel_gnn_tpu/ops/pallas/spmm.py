"""Pallas fused gather-scale-segment-reduce SpMM (placeholder dispatch).

Returns None until the fused kernel lands; callers fall back to XLA.
"""
from __future__ import annotations


def gather_scatter(x, graph, reduce, edge_weight):
    return None
