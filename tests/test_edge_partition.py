"""shard_map edge-partitioned aggregation == single-device result, fwd+grad
(SURVEY.md §4.5 — deterministic partitioned aggregation)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multilevel_gnn_tpu.core.graph import Graph
from multilevel_gnn_tpu.ops import spmm
from multilevel_gnn_tpu.parallel import make_mesh, shard_ctx
from multilevel_gnn_tpu.parallel.edge_partition import (
    edge_partitioned_gather_scatter,
)
from multilevel_gnn_tpu.core.batch import make_fold_context


@pytest.mark.parametrize("reduce", ["sum", "mean", "max"])
def test_edge_partitioned_matches_single(rng, reduce):
    mesh = make_mesh(1, 8)
    N, E, B, C = 60, 500, 3, 16
    g = Graph.from_edges(
        rng.randint(0, N, size=(2, E)), rng.rand(E).astype(np.float32), N
    )
    ctx = make_fold_context(g, np.zeros(4, np.int32), np.zeros(4, np.int32),
                            n_pathways=1)
    ctx = shard_ctx(ctx, mesh)
    gs = ctx.graph
    x = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    want = spmm.gather_scatter(x, g, reduce, g.edge_attr, backend="xla")
    with mesh:
        got = jax.jit(
            lambda x: edge_partitioned_gather_scatter(
                x, gs, mesh, reduce, gs.edge_attr
            )
        )(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-5)


def test_edge_partitioned_grad(rng):
    mesh = make_mesh(1, 4)
    N, E, B, C = 40, 300, 2, 8
    g = Graph.from_edges(
        rng.randint(0, N, size=(2, E)), rng.rand(E).astype(np.float32), N
    )
    ctx = make_fold_context(g, np.zeros(4, np.int32), np.zeros(4, np.int32),
                            n_pathways=1)
    ctx = shard_ctx(ctx, mesh)
    gs = ctx.graph
    x = jnp.asarray(rng.randn(B, N, C).astype(np.float32))

    def loss_part(x):
        out = edge_partitioned_gather_scatter(x, gs, mesh, "mean", gs.edge_attr)
        return jnp.sum(jnp.tanh(out))

    def loss_ref(x):
        out = spmm.gather_scatter(x, g, "mean", g.edge_attr, backend="xla")
        return jnp.sum(jnp.tanh(out))

    with mesh:
        gp = jax.jit(jax.grad(loss_part))(x)
    gr = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gr), rtol=1e-4,
                               atol=1e-5)
