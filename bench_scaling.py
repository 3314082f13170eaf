"""Edge-partitioning scaling-efficiency benchmark (BASELINE: >=80% edges/s
efficiency 1 chip -> 1 host -> N hosts).

Runs the shard_map edge-partitioned aggregation over growing 'model' mesh
sizes on whatever devices exist (real chips, or the virtual CPU mesh with
XLA_FLAGS=--xla_force_host_platform_device_count=8 for a mechanics check)
and prints one JSON line with per-size times and relative efficiency.
"""
from __future__ import annotations

import json
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from multilevel_gnn_tpu.core.batch import make_fold_context
    from multilevel_gnn_tpu.core.graph import Graph
    from multilevel_gnn_tpu.parallel import make_mesh, shard_ctx
    from multilevel_gnn_tpu.parallel.edge_partition import (
        edge_partitioned_gather_scatter,
        scaling_bench,
    )
    from multilevel_gnn_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    n_dev = len(jax.devices())
    sizes = [s for s in (1, 2, 4, 8) if s <= n_dev]
    print(f"devices: {n_dev}, model-axis sizes: {sizes}", file=sys.stderr)

    rng = np.random.RandomState(0)
    N, E, B, C = 15405, 150_000, 32, 64
    edges = rng.randint(0, N, size=(2, E))
    attr = rng.rand(E).astype(np.float32)
    x = jnp.asarray(rng.randn(B, N, C).astype(np.float32))

    def make_fn(n_model):
        mesh = make_mesh(1, n_model)
        g = Graph.from_edges(edges, attr, N)
        ctx = make_fold_context(g, np.zeros(4, np.int32), np.zeros(4, np.int32),
                                n_pathways=1)
        ctx = shard_ctx(ctx, mesh)
        gs = ctx.graph

        @jax.jit
        def fn(x):
            with mesh:
                return edge_partitioned_gather_scatter(
                    x, gs, mesh, "mean", gs.edge_attr
                )

        return fn

    times, eff = scaling_bench(sizes, make_fn, x, iters=10)
    out = {
        "metric": "edge_partition_scaling_efficiency",
        "sizes": sizes,
        "ms": {str(k): v * 1e3 for k, v in times.items()},
        "efficiency": {str(k): eff[k] for k in sizes},
        "edges_per_s": {str(k): B * E / times[k] for k in sizes},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
