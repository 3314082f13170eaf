"""Fused Pallas SpMM backend (fwd + custom VJP) vs the XLA backend."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from multilevel_gnn_tpu.core.graph import Graph
from multilevel_gnn_tpu.ops import spmm


def build(rng, N=100, E=400, with_attr=True):
    edges = rng.randint(0, N, size=(2, E))
    attr = rng.rand(E).astype(np.float32) if with_attr else None
    g = Graph.from_edges(edges, attr, N, pad_to=E + 37).with_sorted_meta()
    return g


def test_pallas_spmm_forward_matches_xla(rng):
    g = build(rng)
    x = jnp.asarray(rng.randn(3, g.n_nodes, 70).astype(np.float32))
    for reduce in ("sum", "mean"):
        want = spmm.gather_scatter(x, g, reduce, g.edge_attr, backend="xla")
        got = spmm.gather_scatter(x, g, reduce, g.edge_attr, backend="pallas")
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )


def test_pallas_spmm_no_weight(rng):
    g = build(rng, with_attr=False)
    x = jnp.asarray(rng.randn(2, g.n_nodes, 33).astype(np.float32))
    want = spmm.gather_scatter(x, g, "sum", None, backend="xla")
    got = spmm.gather_scatter(x, g, "sum", None, backend="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_pallas_spmm_grad_matches_xla(rng):
    g = build(rng)
    x = jnp.asarray(rng.randn(2, g.n_nodes, 24).astype(np.float32))
    t = jnp.asarray(rng.randn(2, g.n_nodes, 24).astype(np.float32))

    def loss(x, backend):
        out = spmm.gather_scatter(x, g, "mean", g.edge_attr, backend=backend)
        return jnp.sum(out * t) + jnp.sum(jnp.tanh(out))

    g_x = jax.grad(lambda x: loss(x, "xla"))(x)
    g_p = jax.grad(lambda x: loss(x, "pallas"))(x)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), rtol=1e-4, atol=1e-5)


def test_pallas_spmm_bf16_close(rng):
    """bf16 message casting stays within mixed-precision tolerance."""
    import jax.numpy as jnp2

    g = build(rng)
    x = jnp.asarray(rng.randn(2, g.n_nodes, 32).astype(np.float32))
    spmm.set_spmm_dtype(jnp2.bfloat16)
    try:
        got = spmm.gather_scatter(x, g, "sum", g.edge_attr, backend="pallas")
    finally:
        spmm.set_spmm_dtype(None)
    assert got.dtype == jnp2.float32
    # oracle: same computation with inputs pre-rounded to bf16 (f32 accum)
    xr = x.astype(jnp2.bfloat16).astype(jnp2.float32)
    wr = g.edge_attr.astype(jnp2.bfloat16).astype(jnp2.float32)
    want = spmm.gather_scatter(xr, g, "sum", wr, backend="xla")
    # the pallas path also rounds the x*w product to bf16 => ~0.4% extra
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-2, atol=2e-2
    )
    # f32 reference within mixed-precision distance
    want32 = spmm.gather_scatter(x, g, "sum", g.edge_attr, backend="xla")
    err = np.abs(np.asarray(got) - np.asarray(want32))
    scale = np.abs(np.asarray(want32)).max()
    assert err.max() / scale < 0.02, err.max() / scale


@pytest.mark.slow  # quick tier (VERDICT r4 Next #8): heavy CPU-mesh equivalence; covered by faster smokes in the quick tier
def test_genconv_softmax_pallas_backend(rng):
    """GENConv softmax aggregation (scatter-free global-max trick) matches
    the XLA per-segment-max implementation, fwd + grad."""
    from multilevel_gnn_tpu.nn.conv import GENConv

    g = build(rng, N=80, E=300)
    x = jnp.asarray(rng.randn(2, g.n_nodes, 16).astype(np.float32))
    attr = jnp.asarray(np.random.RandomState(3).rand(g.num_padded_edges, 2)
                       .astype(np.float32))
    for aggr in ("softmax", "softmax_sum", "power", "add", "mean"):
        conv = GENConv(16, 8, aggr=aggr, t=1.3, learn_t=True, y=0.1,
                       encode_edge=True, edge_feat_dim=2, norm_type="none")
        params = conv.init(jax.random.PRNGKey(0), x, g, attr)
        spmm.set_backend("pallas")
        try:
            out_p = conv.apply(params, x, g, attr)
            gp = jax.grad(lambda p: jnp.sum(conv.apply(p, x, g, attr) ** 2))(params)
        finally:
            spmm.set_backend("xla")
        out_x = conv.apply(params, x, g, attr)
        gx = jax.grad(lambda p: jnp.sum(conv.apply(p, x, g, attr) ** 2))(params)
        np.testing.assert_allclose(
            np.asarray(out_p), np.asarray(out_x), rtol=1e-4, atol=1e-4,
            err_msg=aggr,
        )
        for a, b in zip(jax.tree_util.tree_leaves(gp),
                        jax.tree_util.tree_leaves(gx)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-3,
                err_msg=aggr,
            )


def test_pallas_backend_in_conv_and_model(rng):
    """RSAGE conv through the pallas backend == xla backend, fwd+grad."""
    from multilevel_gnn_tpu.nn.conv import RSAGEConv

    g = build(rng, N=80, E=300).with_self_loops().with_sorted_meta()
    x = jnp.asarray(rng.randn(2, g.n_nodes, 16).astype(np.float32))
    conv = RSAGEConv(16, 8, act_type="leakyrelu")
    params = conv.init(jax.random.PRNGKey(0), x, g, g.edge_attr)

    spmm.set_backend("pallas")
    try:
        out_p = conv.apply(params, x, g, g.edge_attr)
        gp = jax.grad(
            lambda p: jnp.sum(conv.apply(p, x, g, g.edge_attr) ** 2)
        )(params)
    finally:
        spmm.set_backend("xla")
    out_x = conv.apply(params, x, g, g.edge_attr)
    gx = jax.grad(lambda p: jnp.sum(conv.apply(p, x, g, g.edge_attr) ** 2))(params)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(gp), jax.tree_util.tree_leaves(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_spmm_bf16_mode_close_to_f32(rng):
    """set_spmm_dtype(bf16) halves gather+kernel traffic; activations must
    stay within bf16 rounding of the exact f32 path (the perf lever is only
    usable if this holds)."""
    import jax.numpy as jnp

    from multilevel_gnn_tpu.core.graph import Graph
    from multilevel_gnn_tpu.ops import spmm

    E, N, B, C = 1500, 300, 4, 32
    g = Graph.from_edges(
        rng.randint(0, N, size=(2, E)), rng.rand(E).astype("float32"), N
    ).with_sorted_meta()
    x = jnp.asarray(rng.randn(B, N, C).astype("float32"))
    ref = spmm.gather_scatter(x, g, "mean", g.edge_attr, backend="pallas")
    spmm.set_spmm_dtype(jnp.bfloat16)
    try:
        got = spmm.gather_scatter(x, g, "mean", g.edge_attr, backend="pallas")
    finally:
        spmm.set_spmm_dtype(None)
    assert got.dtype == ref.dtype
    scale = float(jnp.max(jnp.abs(ref)))
    err = float(jnp.max(jnp.abs(got - ref)))
    assert err < 0.03 * scale, (err, scale)
