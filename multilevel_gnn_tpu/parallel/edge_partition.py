"""Explicit edge-partitioned aggregation via shard_map (SURVEY.md §5.7).

The GNN analog of sequence parallelism: the fold's edge list is sharded
across the mesh's 'model' axis; each chip gathers from its (replicated)
node features, segment-reduces its edge shard locally, and partial node
sums are combined with a single psum over ICI.  Mean = psum(sum)/psum(count)
with host-precomputed global degrees.  This is the manual-collectives
counterpart of the GSPMD path in parallel/mesh.py — autodiff through
shard_map transposes the psum correctly, so the same function trains.

Usage: call inside a jitted function whose mesh is active, with the
graph's edge arrays sharded on 'model' (parallel.shard_ctx does this).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from multilevel_gnn_tpu.core.graph import Graph
from multilevel_gnn_tpu.ops import segment as seg_ops


def edge_partitioned_gather_scatter(
    x: jax.Array,
    graph: Graph,
    mesh: Mesh,
    reduce: str = "sum",
    edge_weight: Optional[jax.Array] = None,
    axis: str = "model",
    halo_partition=None,
) -> jax.Array:
    """out[dst] = reduce_e x[src[e]] * w[e], edges sharded on `axis`.

    x replicated; returns replicated (.., N, C) — or, when a
    HaloPartition is given (parallel/halo.py), routes through the
    boundary-only all_to_all exchange and returns the node-sharded
    global-view result (§5.7 optimization; sum/mean only)."""
    if halo_partition is not None and reduce in ("sum", "add", "mean"):
        from multilevel_gnn_tpu.parallel.halo import (
            halo_gather_scatter,
            pad_nodes_for,
        )

        return halo_gather_scatter(
            pad_nodes_for(x, halo_partition), halo_partition, mesh, reduce,
            edge_weight, axis,
        )
    n_nodes = graph.n_nodes

    def local(x, senders, receivers, mask, w):
        msg = jnp.take(x, senders, axis=-2)
        if w is not None:
            msg = msg * (w if w.ndim > 1 else w[:, None])
        if reduce in ("sum", "add"):
            part = seg_ops.segment_sum(msg, receivers, n_nodes, mask=mask)
            return jax.lax.psum(part, axis)
        if reduce == "mean":
            part = seg_ops.segment_sum(msg, receivers, n_nodes, mask=mask)
            cnt = seg_ops.segment_count(receivers, n_nodes, mask=mask)
            total = jax.lax.psum(part, axis)
            deg = jax.lax.psum(cnt, axis)
            return total / jnp.clip(deg, 1.0, None)[:, None]
        if reduce == "max":
            # keep -inf for locally-empty segments until after the pmax —
            # zero-filling first would clobber negative global maxima
            seg = jnp.where(mask, receivers, n_nodes)
            m2 = jnp.moveaxis(msg, -2, 0)
            m2 = jnp.where(mask.reshape((-1,) + (1,) * (m2.ndim - 1)), m2, -jnp.inf)
            part = jax.ops.segment_max(m2, seg, n_nodes + 1)[:n_nodes]
            part = jnp.moveaxis(part, 0, -2)
            out = jax.lax.pmax(part, axis)
            return jnp.where(jnp.isfinite(out), out, 0.0)
        raise NotImplementedError(reduce)

    w = edge_weight
    in_specs = (P(), P(axis), P(axis), P(axis), P(axis) if w is not None else None)
    if w is None:
        fn = jax.shard_map(
            lambda x, s, r, m: local(x, s, r, m, None),
            mesh=mesh,
            in_specs=in_specs[:4],
            out_specs=P(),
        )
        return fn(x, graph.senders, graph.receivers, graph.edge_mask)
    fn = jax.shard_map(
        local, mesh=mesh, in_specs=in_specs, out_specs=P()
    )
    return fn(x, graph.senders, graph.receivers, graph.edge_mask, w)


def scaling_bench(mesh_sizes, make_fn, *args, iters: int = 5):
    """Edges/s scaling-efficiency harness: runs make_fn(mesh) -> callable
    over increasing 'model' sizes and reports relative efficiency (the
    BASELINE >=80 percent criterion)."""
    import time

    import numpy as np

    results = {}
    for n in mesh_sizes:
        fn = make_fn(n)
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        results[n] = (time.perf_counter() - t0) / iters
    base = results[mesh_sizes[0]] * mesh_sizes[0]
    eff = {n: base / (results[n] * n) for n in mesh_sizes}
    return results, eff
