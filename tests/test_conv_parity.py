"""Layer parity tests: flax conv zoo vs independent torch oracles with
identical injected parameters (SURVEY.md §4.2 — activation allclose)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from multilevel_gnn_tpu.core.graph import Graph
from multilevel_gnn_tpu.nn.conv import (
    RSAGEConv,
    GENConv,
    GCNConv,
    GATConv,
    GINConv,
    MRConv,
    EdgeConv,
)

import torch_oracle as oracle

N, CIN, COUT, E = 13, 8, 6, 40


def random_graph(rng, with_attr=True, self_loops=False):
    edges = rng.randint(0, N, size=(2, E)).astype(np.int32)
    attr = rng.rand(E, 1).astype(np.float32) if with_attr else None
    g = Graph.from_edges(edges, attr, N)
    if self_loops:
        g = g.with_self_loops()
    return edges, attr, g


def t(x):
    return torch.tensor(np.asarray(x))


def test_rsage_parity(rng):
    edges, attr, g = random_graph(rng, with_attr=True, self_loops=True)
    x = rng.randn(2, N, CIN).astype(np.float32)
    conv = RSAGEConv(CIN, COUT, act_type="leakyrelu")
    params = conv.init(jax.random.PRNGKey(0), jnp.asarray(x), g, g.edge_attr)
    out = conv.apply(params, jnp.asarray(x), g, g.edge_attr)

    W = t(params["params"]["lin_r"]["kernel"])
    mlp_W = t(params["params"]["nn"]["Linear_0"]["Dense_0"]["kernel"])
    mlp_b = t(params["params"]["nn"]["Linear_0"]["Dense_0"]["bias"])
    for b in range(2):
        want = oracle.sage_oracle(
            t(x[b]), torch.tensor(edges.astype(np.int64)), t(attr), W, mlp_W, mlp_b
        )
        np.testing.assert_allclose(
            np.asarray(out[b]), want.numpy(), rtol=2e-4, atol=2e-5
        )


def test_rsage_normalize_and_relative(rng):
    edges, attr, g = random_graph(rng, with_attr=True, self_loops=True)
    x = rng.randn(1, N, CIN).astype(np.float32)
    conv = RSAGEConv(CIN, COUT, act_type="relu", normalize=True, relative=True)
    params = conv.init(jax.random.PRNGKey(1), jnp.asarray(x), g, g.edge_attr)
    out = conv.apply(params, jnp.asarray(x), g, g.edge_attr)
    W = t(params["params"]["lin_r"]["kernel"])
    mlp_W = t(params["params"]["nn"]["Linear_0"]["Dense_0"]["kernel"])
    mlp_b = t(params["params"]["nn"]["Linear_0"]["Dense_0"]["bias"])
    want = oracle.sage_oracle(
        t(x[0]), torch.tensor(edges.astype(np.int64)), t(attr), W, mlp_W, mlp_b,
        relative=True, normalize=True, act="relu",
    )
    np.testing.assert_allclose(np.asarray(out[0]), want.numpy(), rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize(
    "aggr", ["softmax", "softmax_sg", "softmax_sum", "power", "power_sum",
             "add", "mean", "max"]
)
def test_genconv_all_aggregators(rng, aggr):
    edges = rng.randint(0, N, size=(2, E)).astype(np.int32)
    attr = rng.rand(E, 2).astype(np.float32)
    g = Graph.from_edges(edges, attr, N)
    x = rng.randn(1, N, CIN).astype(np.float32)
    conv = GENConv(
        CIN, COUT, aggr=aggr, t=1.3, p=1.7, y=0.2, encode_edge=True,
        edge_feat_dim=2, norm_type="none",
    )
    params = conv.init(jax.random.PRNGKey(2), jnp.asarray(x), g, g.edge_attr)
    out = conv.apply(params, jnp.asarray(x), g, g.edge_attr)

    pp = params["params"]
    oparams = {
        "edge_W": t(pp["edge_encoder"]["Dense_0"]["kernel"]),
        "edge_b": t(pp["edge_encoder"]["Dense_0"]["bias"]),
        "mlp": [
            (
                t(pp["feature_encoder"][f"Linear_{i}"]["Dense_0"]["kernel"]),
                t(pp["feature_encoder"][f"Linear_{i}"]["Dense_0"]["bias"]),
            )
            for i in range(2)
        ],
    }
    want = oracle.genconv_oracle(
        t(x[0]), torch.tensor(edges.astype(np.int64)), t(attr), oparams,
        aggr=aggr, t=1.3, p=1.7, y=0.2,
    )
    np.testing.assert_allclose(np.asarray(out[0]), want.numpy(), rtol=2e-4, atol=2e-5)


def test_gcn_parity(rng):
    edges, _, g = random_graph(rng, with_attr=False, self_loops=False)
    g = g.without_self_loops()
    edges = np.stack(
        [np.asarray(g.senders)[: g.n_edges], np.asarray(g.receivers)[: g.n_edges]]
    ).astype(np.int32)
    x = rng.randn(1, N, CIN).astype(np.float32)
    conv = GCNConv(CIN, COUT)
    params = conv.init(jax.random.PRNGKey(3), jnp.asarray(x), g)
    out = conv.apply(params, jnp.asarray(x), g)
    W = t(params["params"]["lin"]["kernel"])
    b = t(params["params"]["bias"])
    want = oracle.gcn_oracle(t(x[0]), torch.tensor(edges.astype(np.int64)), W, b)
    np.testing.assert_allclose(np.asarray(out[0]), want.numpy(), rtol=2e-4, atol=2e-5)


def test_gat_parity(rng):
    heads, dim = 3, 4
    edges, _, g = random_graph(rng, with_attr=False, self_loops=True)
    x = rng.randn(1, N, CIN).astype(np.float32)
    conv = GATConv(CIN, dim, heads=heads)
    params = conv.init(jax.random.PRNGKey(4), jnp.asarray(x), g)
    out = conv.apply(params, jnp.asarray(x), g)
    pp = params["params"]
    want = oracle.gat_oracle(
        t(x[0]), torch.tensor(edges.astype(np.int64)), t(pp["lin"]["kernel"]),
        t(pp["att_src"]), t(pp["att_dst"]), t(pp["bias"]), heads, dim,
    )
    np.testing.assert_allclose(np.asarray(out[0]), want.numpy(), rtol=2e-4, atol=2e-5)


def test_gin_parity(rng):
    edges, _, g = random_graph(rng, with_attr=False)
    x = rng.randn(1, N, CIN).astype(np.float32)
    conv = GINConv(CIN, COUT)
    params = conv.init(jax.random.PRNGKey(5), jnp.asarray(x), g)
    out = conv.apply(params, jnp.asarray(x), g)
    pp = params["params"]["nn"]["Linear_0"]["Dense_0"]
    want = oracle.gin_oracle(
        t(x[0]), torch.tensor(edges.astype(np.int64)), t(pp["kernel"]), t(pp["bias"])
    )
    np.testing.assert_allclose(np.asarray(out[0]), want.numpy(), rtol=2e-4, atol=2e-5)


def test_mr_parity(rng):
    edges, _, g = random_graph(rng, with_attr=False)
    x = rng.randn(1, N, CIN).astype(np.float32)
    conv = MRConv(CIN, COUT)
    params = conv.init(jax.random.PRNGKey(6), jnp.asarray(x), g)
    out = conv.apply(params, jnp.asarray(x), g)
    pp = params["params"]["nn"]["Linear_0"]["Dense_0"]
    want = oracle.mr_oracle(
        t(x[0]), torch.tensor(edges.astype(np.int64)), t(pp["kernel"]), t(pp["bias"])
    )
    np.testing.assert_allclose(np.asarray(out[0]), want.numpy(), rtol=2e-4, atol=2e-5)


def test_edgeconv_parity(rng):
    edges, _, g = random_graph(rng, with_attr=False)
    x = rng.randn(1, N, CIN).astype(np.float32)
    conv = EdgeConv(CIN, COUT)
    params = conv.init(jax.random.PRNGKey(7), jnp.asarray(x), g)
    out = conv.apply(params, jnp.asarray(x), g)
    pp = params["params"]["nn"]["Linear_0"]["Dense_0"]
    want = oracle.edgeconv_oracle(
        t(x[0]), torch.tensor(edges.astype(np.int64)), t(pp["kernel"]), t(pp["bias"])
    )
    np.testing.assert_allclose(np.asarray(out[0]), want.numpy(), rtol=2e-4, atol=2e-5)
