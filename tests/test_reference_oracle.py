"""Parity vs the REAL reference code (VERDICT r1 item #6).

These tests execute the actual modules under /root/reference (via the
pure-torch PyG shim in pyg_shim.py) with parameters injected from the flax
modules, and assert activation allclose — BASELINE's "vs reference
PyTorch/PyG" check, literally.  Covers the convs the shipped configs use
(RSAGEConv — torch_vertex.py:298-304; GENConv all aggregators —
torch_vertex.py:12-104, torch_message.py:8-85) plus MRConv
(torch_vertex.py:181-193, through the reference's own utils/pyg_util.py
scatter_ wrapper).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

import pyg_shim

pyg_shim.install()

from models.gcn_lib.sparse import torch_vertex as ref_tv  # noqa: E402

from multilevel_gnn_tpu.core.graph import Graph  # noqa: E402
from multilevel_gnn_tpu.nn import conv as fx  # noqa: E402

N, CIN, COUT, E = 13, 8, 6, 40


def t(x):
    return torch.tensor(np.asarray(x))


def set_lin(lin, kernel, bias=None):
    """flax Dense kernel (in, out) -> torch Linear weight (out, in)."""
    with torch.no_grad():
        lin.weight.copy_(t(kernel).T)
        if bias is not None:
            lin.bias.copy_(t(bias))


@pytest.fixture
def graph(rng):
    edges = rng.randint(0, N, size=(2, E)).astype(np.int32)
    attr = rng.rand(E, 1).astype(np.float32)
    return edges, attr


def test_rsage_vs_reference(rng, graph):
    edges, attr = graph
    g = Graph.from_edges(edges, attr, N).with_self_loops()
    x = rng.randn(1, N, CIN).astype(np.float32)
    conv = fx.RSAGEConv(CIN, COUT, act_type="leakyrelu")
    params = conv.init(jax.random.PRNGKey(0), jnp.asarray(x), g, g.edge_attr)
    out = conv.apply(params, jnp.asarray(x), g, g.edge_attr)

    ref = ref_tv.RSAGEConv(
        CIN, COUT, act="leakyrelu", norm=False, mlp_norm=None, bias=True,
        relative=False,
    )
    pp = params["params"]
    set_lin(ref.lin_r, pp["lin_r"]["kernel"])
    set_lin(
        ref.nn[0],
        pp["nn"]["Linear_0"]["Dense_0"]["kernel"],
        pp["nn"]["Linear_0"]["Dense_0"]["bias"],
    )
    with torch.no_grad():
        want = ref(t(x[0]), t(edges.astype(np.int64)), edge_attr=t(attr))
    np.testing.assert_allclose(
        np.asarray(out[0]), want.numpy(), rtol=2e-4, atol=2e-5
    )


def test_rsage_relative_normalize_vs_reference(rng, graph):
    edges, attr = graph
    g = Graph.from_edges(edges, attr, N).with_self_loops()
    x = rng.randn(1, N, CIN).astype(np.float32)
    conv = fx.RSAGEConv(
        CIN, COUT, act_type="relu", normalize=True, relative=True
    )
    params = conv.init(jax.random.PRNGKey(1), jnp.asarray(x), g, g.edge_attr)
    out = conv.apply(params, jnp.asarray(x), g, g.edge_attr)

    ref = ref_tv.RSAGEConv(
        CIN, COUT, act="relu", norm=True, mlp_norm=None, bias=True,
        relative=True,
    )
    pp = params["params"]
    set_lin(ref.lin_r, pp["lin_r"]["kernel"])
    set_lin(
        ref.nn[0],
        pp["nn"]["Linear_0"]["Dense_0"]["kernel"],
        pp["nn"]["Linear_0"]["Dense_0"]["bias"],
    )
    with torch.no_grad():
        want = ref(t(x[0]), t(edges.astype(np.int64)), edge_attr=t(attr))
    np.testing.assert_allclose(
        np.asarray(out[0]), want.numpy(), rtol=2e-4, atol=2e-5
    )


@pytest.mark.parametrize(
    "aggr", ["softmax", "softmax_sg", "softmax_sum", "power", "power_sum",
             "add", "mean", "max"]
)
def test_genconv_vs_reference(rng, aggr):
    edges = rng.randint(0, N, size=(2, E)).astype(np.int32)
    attr = rng.rand(E, 2).astype(np.float32)
    g = Graph.from_edges(edges, attr, N)
    x = rng.randn(1, N, CIN).astype(np.float32)
    conv = fx.GENConv(
        CIN, COUT, aggr=aggr, t=1.3, p=1.7, y=0.2, encode_edge=True,
        edge_feat_dim=2, norm_type="none",
    )
    params = conv.init(jax.random.PRNGKey(2), jnp.asarray(x), g, g.edge_attr)
    out = conv.apply(params, jnp.asarray(x), g, g.edge_attr)

    ref = ref_tv.GENConv(
        CIN, COUT, aggr=aggr, t=1.3, p=1.7, y=0.2, encode_edge=True,
        edge_feat_dim=2, norm="none", mlp_layers=2,
    )
    pp = params["params"]
    set_lin(
        ref.edge_encoder,
        pp["edge_encoder"]["Dense_0"]["kernel"],
        pp["edge_encoder"]["Dense_0"]["bias"],
    )
    lins = [m for m in ref.feature_encoder if isinstance(m, torch.nn.Linear)]
    for i, lin in enumerate(lins):
        set_lin(
            lin,
            pp["feature_encoder"][f"Linear_{i}"]["Dense_0"]["kernel"],
            pp["feature_encoder"][f"Linear_{i}"]["Dense_0"]["bias"],
        )
    with torch.no_grad():
        want = ref(t(x[0]), t(edges.astype(np.int64)), edge_attr=t(attr))
    np.testing.assert_allclose(
        np.asarray(out[0]), want.numpy(), rtol=2e-4, atol=2e-5
    )


def test_mrconv_vs_reference(rng):
    """MRConv rides the reference's own utils/pyg_util.py scatter_ ('max'
    sentinel wrapper) — real reference code end to end."""
    edges = rng.randint(0, N, size=(2, E)).astype(np.int32)
    g = Graph.from_edges(edges, None, N)
    x = rng.randn(1, N, CIN).astype(np.float32)
    conv = fx.MRConv(CIN, COUT)
    params = conv.init(jax.random.PRNGKey(6), jnp.asarray(x), g)
    out = conv.apply(params, jnp.asarray(x), g)

    ref = ref_tv.MRConv(CIN, COUT, act="relu", norm=None, bias=True)
    pp = params["params"]["nn"]["Linear_0"]["Dense_0"]
    set_lin(ref.nn[0], pp["kernel"], pp["bias"])
    with torch.no_grad():
        want = ref(t(x[0]), t(edges.astype(np.int64)))
    np.testing.assert_allclose(
        np.asarray(out[0]), want.numpy(), rtol=2e-4, atol=2e-5
    )


def test_graphconv_dispatcher_vs_reference(rng, graph):
    """GraphConv('sage') — the conv used by every shipped cohort config —
    through the reference dispatcher (torch_vertex.py:338-363)."""
    edges, attr = graph
    g = Graph.from_edges(edges, attr, N).with_self_loops()
    x = rng.randn(1, N, CIN).astype(np.float32)
    conv = fx.GraphConvLayer(CIN, COUT, conv="sage", act_type="relu")
    params = conv.init(jax.random.PRNGKey(3), jnp.asarray(x), g, g.edge_attr)
    out = conv.apply(params, jnp.asarray(x), g, g.edge_attr)

    ref = ref_tv.GraphConv(CIN, COUT, conv="sage", act="relu", norm=None)
    pp = params["params"]["gconv"]
    set_lin(ref.gconv.lin_r, pp["lin_r"]["kernel"])
    set_lin(
        ref.gconv.nn[0],
        pp["nn"]["Linear_0"]["Dense_0"]["kernel"],
        pp["nn"]["Linear_0"]["Dense_0"]["bias"],
    )
    with torch.no_grad():
        want = ref(t(x[0]), t(edges.astype(np.int64)), edge_attr=t(attr))
    np.testing.assert_allclose(
        np.asarray(out[0]), want.numpy(), rtol=2e-4, atol=2e-5
    )
