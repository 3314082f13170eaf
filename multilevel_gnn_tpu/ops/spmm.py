"""Batched sparse aggregation (SpMM) over a static, dst-sorted edge list.

This is the op family that replaces the PyG ``propagate`` gather/scatter
machinery (reference: models/gcn_lib/sparse/torch_vertex.py:277-294 and the
torch_scatter CUDA kernels).  The graph topology is static per fold, so the
aggregation is: gather src rows of a batched feature tensor (B, N, C),
optionally scale by per-edge weights, and segment-reduce into destinations.

Backends:
  * 'xla'    — gather + jax.ops.segment_* (always available, oracle).
  * 'pallas' — fused gather-scale-reduce kernel (TPU), see ops/pallas/.
Selected globally via set_backend() or per-call with backend=...
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from multilevel_gnn_tpu.core.graph import Graph
from multilevel_gnn_tpu.ops import segment as seg_ops

_BACKEND = "xla"


def set_backend(name: str) -> None:
    global _BACKEND
    assert name in ("xla", "pallas"), name
    _BACKEND = name


def get_backend() -> str:
    return _BACKEND


def gather(x: jax.Array, index: jax.Array, axis: int = -2) -> jax.Array:
    """x[..., index, :] — edge gather of node features."""
    return jnp.take(x, index, axis=axis)


def gather_scatter(
    x: jax.Array,
    graph: Graph,
    reduce: str = "sum",
    edge_weight: Optional[jax.Array] = None,
    backend: Optional[str] = None,
) -> jax.Array:
    """out[dst] = reduce_{e: recv[e]=dst} x[src[e]] * w[e].

    x: (..., N, C); edge_weight: (E,) or (E, C) or None; returns (..., N, C).
    """
    backend = backend or _BACKEND
    if backend == "pallas":
        from multilevel_gnn_tpu.ops.pallas import spmm as pallas_spmm

        out = pallas_spmm.gather_scatter(x, graph, reduce, edge_weight)
        if out is not None:
            return out
    msg = gather(x, graph.senders)
    if edge_weight is not None:
        w = edge_weight
        if w.ndim == 1:
            w = w[:, None]
        msg = msg * w
    fn = {
        "sum": seg_ops.segment_sum,
        "add": seg_ops.segment_sum,
        "mean": seg_ops.segment_mean,
        "max": seg_ops.segment_max,
        "min": seg_ops.segment_min,
    }[reduce]
    return fn(msg, graph.receivers, graph.n_nodes, axis=-2, mask=graph.edge_mask)


def spmm_sum(x, graph, edge_weight=None, backend=None):
    return gather_scatter(x, graph, "sum", edge_weight, backend)


def spmm_mean(x, graph, edge_weight=None, backend=None):
    return gather_scatter(x, graph, "mean", edge_weight, backend)
