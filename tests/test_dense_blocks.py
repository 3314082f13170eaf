"""Dense gcn_lib (point-cloud blocks) — parity vs the REAL reference modules
under /root/reference/models/gcn_lib/dense/ (via the pure-torch PyG shim)."""
import numpy as np
import pytest
import torch

import pyg_shim

pyg_shim.install()

from models.gcn_lib.dense import torch_vertex as ref_tv  # noqa: E402
from models.gcn_lib.dense import torch_edge as ref_te  # noqa: E402
from models.gcn_lib.dense import torch_nn as ref_tn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multilevel_gnn_tpu.nn import dense_blocks as dbl  # noqa: E402

B, C, N, K = 2, 5, 17, 4


@pytest.fixture
def cloud(rng):
    return rng.randn(B, C, N, 1).astype(np.float32)


def test_dense_knn_matrix_parity(cloud):
    ours = np.asarray(dbl.dense_knn_matrix(jnp.asarray(cloud), k=K))
    ref = ref_te.dense_knn_matrix(torch.tensor(cloud), k=K).numpy()
    np.testing.assert_array_equal(ours, ref)


def test_batched_index_select_parity(cloud, rng):
    idx = rng.randint(0, N, size=(B, N, K))
    ours = np.asarray(dbl.batched_index_select(jnp.asarray(cloud),
                                               jnp.asarray(idx)))
    ref = ref_tn.batched_index_select(torch.tensor(cloud),
                                      torch.tensor(idx)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


def test_dense_dilated_slicing(cloud):
    d = 2
    ei = dbl.dense_knn_matrix(jnp.asarray(cloud), k=K * d)
    ours = np.asarray(dbl.dense_dilated(ei, K, dilation=d))
    ref_mod = ref_te.DenseDilated(K, d, False, 0.0)
    ref = ref_mod(torch.tensor(np.asarray(ei))).numpy()
    np.testing.assert_array_equal(ours, ref)


def _copy_basic_conv(flax_params, torch_seq, n_layers=1, norm=None):
    """flax BasicConv params -> torch BasicConv Sequential (conv, act[, norm])."""
    per_layer = 2 + (1 if norm else 0)
    with torch.no_grad():
        for i in range(n_layers):
            conv_p = flax_params[f"conv{i}"]
            tconv = torch_seq[i * per_layer]
            # flax (1, 1, in, out) -> torch (out, in, 1, 1)
            tconv.weight.copy_(
                torch.tensor(np.asarray(conv_p["kernel"]).transpose(3, 2, 0, 1)))
            if "bias" in conv_p:
                tconv.bias.copy_(torch.tensor(np.asarray(conv_p["bias"])))


@pytest.mark.parametrize("conv", ["edge", "mr"])
def test_graph_conv2d_parity(cloud, conv):
    cout = 7
    model = dbl.GraphConv2d(C, cout, conv=conv)
    ei = dbl.dense_knn_matrix(jnp.asarray(cloud), k=K)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(cloud), ei)
    out = model.apply(params, jnp.asarray(cloud), ei)

    ref = ref_tv.GraphConv2d(C, cout, conv=conv, act="relu", norm=None)
    inner = params["params"]["gconv"]["nn"]
    _copy_basic_conv(inner, ref.gconv.nn)
    ref.eval()
    with torch.no_grad():
        ref_out = ref(torch.tensor(cloud), torch.tensor(np.asarray(ei)))
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(),
                               rtol=1e-5, atol=1e-5)


def test_dyn_conv2d_dilated_parity(cloud):
    """edge_index=None path: kNN recomputed from features, dilation 2
    (torch_vertex.py:56-74)."""
    cout, d = 6, 2
    model = dbl.DynConv2d(C, cout, kernel_size=K, dilation=d, conv="edge")
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(cloud))
    out = model.apply(params, jnp.asarray(cloud))

    ref = ref_tv.DynConv2d(C, cout, kernel_size=K, dilation=d, conv="edge",
                           act="relu", norm=None, knn="matrix")
    _copy_basic_conv(params["params"]["body"]["gconv"]["nn"], ref.gconv.nn)
    ref.eval()
    with torch.no_grad():
        ref_out = ref(torch.tensor(cloud))
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(),
                               rtol=1e-5, atol=1e-5)


def test_res_and_dense_blocks_parity(cloud):
    res = dbl.ResDynBlock2d(C, kernel_size=K, res_scale=0.5)
    params = res.init(jax.random.PRNGKey(1), jnp.asarray(cloud))
    out = res.apply(params, jnp.asarray(cloud))
    ref = ref_tv.ResDynBlock2d(C, kernel_size=K, res_scale=0.5, knn="matrix")
    _copy_basic_conv(params["params"]["body"]["body"]["gconv"]["nn"],
                     ref.body.gconv.nn)
    ref.eval()
    with torch.no_grad():
        ref_out = ref(torch.tensor(cloud))
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(),
                               rtol=1e-5, atol=1e-5)

    dense = dbl.DenseDynBlock2d(C, 8, kernel_size=K)
    params = dense.init(jax.random.PRNGKey(2), jnp.asarray(cloud))
    out = dense.apply(params, jnp.asarray(cloud))
    ref = ref_tv.DenseDynBlock2d(C, 8, kernel_size=K, knn="matrix")
    _copy_basic_conv(params["params"]["body"]["body"]["gconv"]["nn"],
                     ref.body.gconv.nn)
    ref.eval()
    with torch.no_grad():
        ref_out = ref(torch.tensor(cloud))
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(),
                               rtol=1e-5, atol=1e-5)


def test_basic_conv_batchnorm_training(cloud):
    """BasicConv with norm='batch' in training mode (batch statistics)."""
    model = dbl.BasicConv([C, 6], act="relu", norm="batch")
    x = jnp.asarray(cloud)
    variables = model.init(jax.random.PRNGKey(3), x, True)
    out, _ = model.apply(variables, x, True, mutable=["batch_stats"])

    ref = ref_tn.BasicConv([C, 6], act="relu", norm="batch")
    _copy_basic_conv(variables["params"], ref, norm="batch")
    ref.train()
    with torch.no_grad():
        ref_out = ref(torch.tensor(cloud))
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_basic_conv_dropout2d_channel_semantics(cloud):
    """drop>0 in training uses torch Dropout2d semantics: whole channels
    are zeroed per sample (review finding: elementwise dropout diverged)."""
    model = dbl.BasicConv([C, 6], act=None, norm=None, drop=0.5)
    x = jnp.asarray(cloud)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, True)
    out = model.apply(variables, x, True,
                      rngs={"dropout": jax.random.PRNGKey(7)})
    out = np.asarray(out)  # (B, 6, N, k)
    per_channel = out.reshape(out.shape[0], out.shape[1], -1)
    zeroed = np.all(per_channel == 0, axis=-1)
    nonzero_elems = np.abs(per_channel[~zeroed])
    # every channel is either fully dropped or fully kept
    assert zeroed.any(), "expected some dropped channels at rate 0.5"
    assert (nonzero_elems > 0).mean() > 0.9  # kept channels keep their values
