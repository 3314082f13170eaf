"""Boundary-only halo exchange (SURVEY §5.7; VERDICT r1 item #10):
correctness vs the single-device aggregation and vs the full-psum path,
gradients through the all_to_all, and measured bytes-on-wire reduction in
the compiled CPU-mesh HLO."""
import re

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multilevel_gnn_tpu.core.graph import Graph
from multilevel_gnn_tpu.ops import spmm
from multilevel_gnn_tpu.parallel import make_mesh
from multilevel_gnn_tpu.parallel.edge_partition import (
    edge_partitioned_gather_scatter,
)
from multilevel_gnn_tpu.parallel.halo import (
    build_halo_partition,
    halo_gather_scatter,
    pad_nodes_for,
)

K = 4


def community_graph(rng, n=512, intra=3000, cross=120):
    """K node blocks, mostly intra-block edges — the locality regime the
    halo design targets (H << Nl)."""
    nl = n // K
    s, d = [], []
    for p in range(K):
        s.append(rng.randint(p * nl, (p + 1) * nl, size=intra // K))
        d.append(rng.randint(p * nl, (p + 1) * nl, size=intra // K))
    s.append(rng.randint(0, n, size=cross))
    d.append(rng.randint(0, n, size=cross))
    edges = np.stack([np.concatenate(s), np.concatenate(d)])
    attr = rng.rand(edges.shape[1]).astype(np.float32)
    return Graph.from_edges(edges, attr, n)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(3)
    g = community_graph(rng)
    hp = build_halo_partition(g, K)
    mesh = make_mesh(1, K)
    x = jnp.asarray(rng.randn(2, g.n_nodes, 32).astype(np.float32))
    return g, hp, mesh, x


@pytest.mark.parametrize("reduce", ["sum", "mean"])
@pytest.mark.parametrize("weighted", [False, True])
def test_halo_matches_single_device(setup, reduce, weighted):
    g, hp, mesh, x = setup
    w = g.edge_attr if weighted else None
    want = spmm.gather_scatter(x, g, reduce, w, backend="xla")
    xp = pad_nodes_for(x, hp)
    with mesh:
        got = jax.jit(
            lambda x: halo_gather_scatter(x, hp, mesh, reduce, w)
        )(xp)
    np.testing.assert_allclose(
        np.asarray(got)[:, : g.n_nodes], np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_halo_gradients(setup):
    g, hp, mesh, x = setup
    t = jnp.asarray(np.random.RandomState(5).randn(*x.shape).astype(np.float32))

    def loss_halo(x):
        out = halo_gather_scatter(
            pad_nodes_for(x, hp), hp, mesh, "mean", g.edge_attr
        )
        return jnp.sum(out[:, : g.n_nodes] * t)

    def loss_ref(x):
        return jnp.sum(
            spmm.gather_scatter(x, g, "mean", g.edge_attr, backend="xla") * t
        )

    with mesh:
        g_halo = jax.jit(jax.grad(loss_halo))(x)
    g_ref = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(
        np.asarray(g_halo), np.asarray(g_ref), rtol=1e-5, atol=1e-5
    )


def _collective_bytes(hlo: str) -> int:
    """Total bytes moved by collectives in an optimized HLO dump."""
    total = 0
    for m in re.finditer(
        r"(f32|bf16|f16)\[([\d,]*)\][^\n]*?\b"
        r"(all-reduce|all-to-all|all-gather|reduce-scatter|collective-permute)"
        r"(-start)?\(",
        hlo,
    ):
        dims = m.group(2)
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * (4 if m.group(1) == "f32" else 2)
    return total


def test_halo_bytes_on_wire_less_than_psum(setup):
    g, hp, mesh, x = setup
    xp = pad_nodes_for(x, hp)
    with mesh:
        halo_hlo = (
            jax.jit(lambda x: halo_gather_scatter(x, hp, mesh, "sum", g.edge_attr))
            .lower(xp)
            .compile()
            .as_text()
        )
        psum_hlo = (
            jax.jit(
                lambda x: edge_partitioned_gather_scatter(
                    x, g, mesh, "sum", g.edge_attr
                )
            )
            .lower(x)
            .compile()
            .as_text()
        )
    b_halo = _collective_bytes(halo_hlo)
    b_psum = _collective_bytes(psum_hlo)
    # full psum moves O(N*C) replicated partials; halo moves only k*H*C
    assert b_halo < b_psum / 2, (b_halo, b_psum)


@pytest.fixture(scope="module")
def setup_pallas():
    rng = np.random.RandomState(7)
    g = community_graph(rng)
    hp = build_halo_partition(g, K, pallas=True)
    mesh = make_mesh(1, K)
    x = jnp.asarray(rng.randn(2, g.n_nodes, 32).astype(np.float32))
    return g, hp, mesh, x


@pytest.mark.parametrize("reduce", ["sum", "mean"])
@pytest.mark.parametrize("weighted", [False, True])
def test_halo_pallas_matches_single_device(setup_pallas, reduce, weighted):
    """Per-shard Pallas flat-segment aggregation inside the halo shard_map
    (build_halo_partition(pallas=True)) == the single-device XLA result."""
    g, hp, mesh, x = setup_pallas
    w = g.edge_attr if weighted else None
    want = spmm.gather_scatter(x, g, reduce, w, backend="xla")
    xp = pad_nodes_for(x, hp)
    with mesh:
        got = jax.jit(
            lambda x: halo_gather_scatter(x, hp, mesh, reduce, w)
        )(xp)
    np.testing.assert_allclose(
        np.asarray(got)[:, : g.n_nodes], np.asarray(want), rtol=1e-5,
        atol=1e-5,
    )


def test_halo_pallas_gradients(setup_pallas):
    """Gradients through the Pallas halo path (custom-VJP in-shard kernels
    + all_to_all transpose) == single-device gradients."""
    g, hp, mesh, x = setup_pallas
    t = jnp.asarray(
        np.random.RandomState(5).randn(*x.shape).astype(np.float32)
    )

    def loss_halo(x):
        out = halo_gather_scatter(
            pad_nodes_for(x, hp), hp, mesh, "mean", g.edge_attr
        )
        return jnp.sum(out[:, : g.n_nodes] * t)

    def loss_ref(x):
        return jnp.sum(
            spmm.gather_scatter(x, g, "mean", g.edge_attr, backend="xla") * t
        )

    with mesh:
        g_halo = jax.jit(jax.grad(loss_halo))(x)
    g_ref = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(
        np.asarray(g_halo), np.asarray(g_ref), rtol=1e-5, atol=1e-5
    )


def test_halo_pallas_scatter_free(setup_pallas):
    """The Pallas halo step lowers with ZERO stablehlo scatters in forward
    AND backward — the sharded path obeys the same no-XLA-scatter rule as
    the single-chip pallas backend (the XLA halo path is the >0 positive
    control)."""
    g, hp, mesh, x = setup_pallas

    def loss(hp_):
        def f(x):
            out = halo_gather_scatter(
                pad_nodes_for(x, hp_), hp_, mesh, "mean", g.edge_attr
            )
            return jnp.sum(out[:, : g.n_nodes] ** 2)

        return f

    with mesh:
        hlo = jax.jit(jax.grad(loss(hp))).lower(x).as_text()
        assert hlo.count("stablehlo.scatter") == 0, (
            hlo.count("stablehlo.scatter")
        )
        hp_xla = build_halo_partition(g, K)  # positive control
        hlo_xla = jax.jit(jax.grad(loss(hp_xla))).lower(x).as_text()
        assert hlo_xla.count("stablehlo.scatter") > 0


def test_halo_interior_overlap_independence():
    """Overlap precondition (VERDICT r2 Next #6): the HEAVY interior
    aggregation (segment scatter / Pallas while-loop kernel) must share no
    dependency path with the boundary all_to_all — neither ancestor nor
    descendant — in the compiled module, or TPU's latency-hiding scheduler
    cannot run them concurrently.  Verified on the optimized HLO of the
    virtual-mesh build for BOTH in-shard kernel families via the
    named-scope metadata parallel/halo.py plants (tools/halo_schedule.py;
    schedule evidence recorded in docs/SCALING.md)."""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(__file__), "..", "tools"),
    )
    try:
        from halo_schedule import analyze, compile_halo_hlo
    finally:
        sys.path.pop(0)

    for pallas in (False, True):
        res = analyze(compile_halo_hlo(pallas=pallas))
        assert res["all_to_all"], "no all-to-all found in the halo HLO"
        assert res["interior_heavy"], (
            "no heavy interior compute identified", res["interior"]
        )
        assert res["independent"], res["blocked_heavy"]


@pytest.fixture(scope="module")
def setup_windowed():
    rng = np.random.RandomState(11)
    g = community_graph(rng)
    hp = build_halo_partition(g, K, pallas=True, windowed=True)
    mesh = make_mesh(1, K)
    x = jnp.asarray(rng.randn(2, g.n_nodes, 32).astype(np.float32))
    return g, hp, mesh, x


@pytest.mark.parametrize("reduce", ["sum", "mean"])
@pytest.mark.parametrize("weighted", [False, True])
def test_halo_windowed_matches_single_device(setup_windowed, reduce, weighted):
    """Per-shard WINDOWED interior kernels inside the halo shard_map
    (build_halo_partition(windowed=True), VERDICT r2 #9) == the
    single-device XLA result.  Window ranges are ownership-local by
    construction; out-of-window interior edges spill to each shard's
    composed residual."""
    g, hp, mesh, x = setup_windowed
    assert hp.win_plan is not None
    w = g.edge_attr if weighted else None
    want = spmm.gather_scatter(x, g, reduce, w, backend="xla")
    xp = pad_nodes_for(x, hp)
    with mesh:
        got = jax.jit(
            lambda x: halo_gather_scatter(x, hp, mesh, reduce, w)
        )(xp)
    np.testing.assert_allclose(
        np.asarray(got)[:, : g.n_nodes], np.asarray(want), rtol=2e-5,
        atol=2e-5,
    )


def test_halo_windowed_gradients(setup_windowed):
    """Gradients through the windowed halo path (windowed custom VJP per
    shard + all_to_all transpose) == single-device gradients."""
    g, hp, mesh, x = setup_windowed
    t = jnp.asarray(
        np.random.RandomState(5).randn(*x.shape).astype(np.float32)
    )

    def loss_halo(x):
        out = halo_gather_scatter(
            pad_nodes_for(x, hp), hp, mesh, "mean", g.edge_attr
        )
        return jnp.sum(out[:, : g.n_nodes] * t)

    def loss_ref(x):
        return jnp.sum(
            spmm.gather_scatter(x, g, "mean", g.edge_attr, backend="xla") * t
        )

    with mesh:
        g_halo = jax.jit(jax.grad(loss_halo))(x)
    g_ref = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(
        np.asarray(g_halo), np.asarray(g_ref), rtol=2e-5, atol=2e-5
    )


def test_halo_windowed_ragged_shards(setup_windowed):
    """Shards with wildly different interior-edge counts (incl. one with
    ZERO interior edges) still stack into one SPMD program — the padded
    chunk/step machinery of parallel/halo.py:_stack_plans."""
    rng = np.random.RandomState(13)
    n = 512
    nl = n // K
    # all interior edges inside shard 0; shard 3 gets nothing interior
    s = rng.randint(0, nl, size=900)
    d = rng.randint(0, nl, size=900)
    cs = rng.randint(0, n, size=60)
    cd = rng.randint(2 * nl, 3 * nl, size=60)  # boundary into shard 2
    edges = np.stack(
        [np.concatenate([s, cs]), np.concatenate([d, cd])]
    )
    g = Graph.from_edges(edges, rng.rand(edges.shape[1]).astype(np.float32), n)
    hp = build_halo_partition(g, K, pallas=True, windowed=True)
    mesh = make_mesh(1, K)
    x = jnp.asarray(rng.randn(2, n, 32).astype(np.float32))
    want = spmm.gather_scatter(x, g, "sum", g.edge_attr, backend="xla")
    with mesh:
        got = jax.jit(
            lambda x: halo_gather_scatter(
                pad_nodes_for(x, hp), hp, mesh, "sum", g.edge_attr
            )
        )(x if x.shape[-2] == hp.k * hp.n_local else pad_nodes_for(x, hp))
    np.testing.assert_allclose(
        np.asarray(got)[:, :n], np.asarray(want), rtol=2e-5, atol=2e-5
    )
