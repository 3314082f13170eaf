"""MiNet (Cox survival net) — parity vs the REAL reference omics_net.

Reference models/minet.py is dead code in its own repo (SparseCoding.py:7
imports a missing ``Survival_CostFunc_CIndex``); we stub that one symbol so
the actual reference classes execute as oracles (same pattern as
test_reference_oracle.py).  Covers: forward parity (eval + training with
sub-network dropout masks), the SparseCoding threshold/interp utilities
value-for-value, Cox loss against a brute-force torch implementation, and a
training smoke test (loss decreases, c-index beats chance).
"""
import importlib.util
import sys
import types

import numpy as np
import pytest
import torch

import pyg_shim

pyg_shim.install()


def _torch_neg_par_log_likelihood(pred, ytime, yevent):
    """Brute-force Cox partial likelihood (Breslow), torch, for the stub."""
    pred = pred.view(-1)
    ytime = ytime.view(-1)
    yevent = yevent.view(-1).float()
    n_obs = max(float(yevent.sum()), 1.0)
    risk = (ytime.view(1, -1) >= ytime.view(-1, 1)).float()
    lse = torch.log((risk * torch.exp(pred.view(1, -1))).sum(1))
    return -((pred - lse) * yevent).sum() / n_obs


# Stub the missing module BEFORE importing reference SparseCoding/minet.
_stub = types.ModuleType("Survival_CostFunc_CIndex")
_stub.neg_par_log_likelihood = _torch_neg_par_log_likelihood
sys.modules.setdefault("Survival_CostFunc_CIndex", _stub)

# Load SparseCoding by explicit path (putting /root/reference/models on
# sys.path would shadow the reference `utils` package with models/utils.py).
_spec = importlib.util.spec_from_file_location(
    "SparseCoding", "/root/reference/models/SparseCoding.py")
ref_sc = importlib.util.module_from_spec(_spec)
sys.modules["SparseCoding"] = ref_sc
_spec.loader.exec_module(ref_sc)

from models.minet import omics_net as RefOmicsNet  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multilevel_gnn_tpu.models import minet  # noqa: E402

IN, GENE, PATH, H = 24, 12, 7, (6, 4)
B = 10


def _mask_to_idx(mask):
    """(out, in) binary mask -> [rows, cols] index lists for fixed_s_mask.

    The reference both indexes ``w[idx]`` expecting per-connection values AND
    passes ``idx`` as sparse-COO indices (SparseCoding.py:33) — the only
    format satisfying both is a [rows, cols] list pair, which pins the
    intended input format."""
    idx = np.argwhere(mask)
    return [idx[:, 0].tolist(), idx[:, 1].tolist()]


@pytest.fixture
def setup(rng):
    x = rng.randn(B, IN).astype(np.float32)
    age = rng.rand(B, 1).astype(np.float32)
    gene_mask = (rng.rand(GENE, IN) < 0.4).astype(np.float32)
    gene_mask[:, 0] = 1  # no empty rows/cols
    path_mask = (rng.rand(PATH, GENE) < 0.4).astype(np.float32)
    path_mask[:, 0] = 1
    return x, age, gene_mask, path_mask


def _mirror_params(params, net, gene_mask, path_mask):
    """Copy flax params into the torch reference net (kernel (in,out) -> weight (out,in))."""
    p = params["params"]
    with torch.no_grad():
        net.omics.weight.copy_(torch.tensor(np.asarray(p["omics_kernel"]).T))
        net.omics.bias.copy_(torch.tensor(np.asarray(p["omics_bias"])))
        net.gene.weight.copy_(torch.tensor(np.asarray(p["gene_kernel"]).T))
        net.gene.bias.copy_(torch.tensor(np.asarray(p["gene_bias"])))
        net.pathway.weight.copy_(torch.tensor(np.asarray(p["pathway"]["kernel"]).T))
        net.pathway.bias.copy_(torch.tensor(np.asarray(p["pathway"]["bias"])))
        net.hidden.weight.copy_(torch.tensor(np.asarray(p["hidden"]["kernel"]).T))
        net.hidden.bias.copy_(torch.tensor(np.asarray(p["hidden"]["bias"])))
        net.hidden2.weight.copy_(torch.tensor(np.asarray(p["hidden2"]["kernel"]).T))


def _init(setup):
    x, age, gene_mask, path_mask = setup
    model = minet.OmicsNet(IN, GENE, PATH, H)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(age),
        jnp.asarray(gene_mask), jnp.asarray(path_mask),
    )
    return model, params


def test_forward_parity_eval(setup):
    x, age, gene_mask, path_mask = setup
    model, params = _init(setup)
    out = model.apply(params, jnp.asarray(x), jnp.asarray(age),
                      jnp.asarray(gene_mask), jnp.asarray(path_mask))

    ref = RefOmicsNet(IN, GENE, PATH, list(H))
    _mirror_params(params, ref, gene_mask, path_mask)
    ref.eval()
    with torch.no_grad():
        ref_out = ref(torch.tensor(x), torch.tensor(age),
                      _mask_to_idx(gene_mask), _mask_to_idx(path_mask),
                      [0.0, 0.0])
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(),
                               rtol=1e-5, atol=1e-5)


def test_forward_parity_training_with_subnet_dropout(setup, rng):
    """Training mode: batch-stat BN + inverted sub-network dropout masks
    (reference minet.py:46-51)."""
    x, age, gene_mask, path_mask = setup
    model, params = _init(setup)
    do_m1 = minet.dropout_mask(rng, PATH, 0.3)
    do_m2 = minet.dropout_mask(rng, H[0], 0.2)
    dr = (0.3, 0.2)

    out, _ = model.apply(
        params, jnp.asarray(x), jnp.asarray(age), jnp.asarray(gene_mask),
        jnp.asarray(path_mask), jnp.asarray(do_m1), jnp.asarray(do_m2),
        dr, True, mutable=["batch_stats"],
    )

    ref = RefOmicsNet(IN, GENE, PATH, list(H))
    _mirror_params(params, ref, gene_mask, path_mask)
    ref.train()
    ref.do_m1 = torch.tensor(do_m1)
    ref.do_m2 = torch.tensor(do_m2)
    with torch.no_grad():
        ref_out = ref(torch.tensor(x), torch.tensor(age),
                      _mask_to_idx(gene_mask), _mask_to_idx(path_mask),
                      list(dr))
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_cox_loss_and_cindex(rng):
    pred = rng.randn(B).astype(np.float32)
    ytime = rng.rand(B).astype(np.float32) * 100
    yevent = (rng.rand(B) < 0.7).astype(np.float32)

    ours = float(minet.neg_partial_log_likelihood(
        jnp.asarray(pred), jnp.asarray(ytime), jnp.asarray(yevent)))
    ref = float(_torch_neg_par_log_likelihood(
        torch.tensor(pred), torch.tensor(ytime), torch.tensor(yevent)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)

    # c-index vs brute force
    ci = float(minet.concordance_index(
        jnp.asarray(pred), jnp.asarray(ytime), jnp.asarray(yevent)))
    num = den = 0.0
    for i in range(B):
        for j in range(B):
            if yevent[i] and ytime[i] < ytime[j]:
                den += 1
                num += 1.0 if pred[i] > pred[j] else (0.5 if pred[i] == pred[j] else 0.0)
    np.testing.assert_allclose(ci, num / max(den, 1.0), rtol=1e-6)


def test_sparse_coding_utils_value_parity(rng):
    """get_threshold / soft_threshold / get_best_sparsity vs the actual
    reference SparseCoding functions."""
    w = rng.randn(8, 6).astype(np.float32)
    m = rng.rand(8, 6) < 0.5
    m[0, 0] = True
    for sp in (99.0, 60.0, 25.0, 0.0):
        th_ref = float(ref_sc.get_threshold(torch.tensor(w), torch.tensor(m), sp))
        th_ours = minet.get_threshold(w, m.astype(np.float32), sp)
        np.testing.assert_allclose(th_ours, th_ref, rtol=1e-6)
        sw_ref = ref_sc.soft_threshold(torch.tensor(w), th_ref).numpy()
        np.testing.assert_allclose(minet.soft_threshold(w, th_ours), sw_ref,
                                   rtol=1e-6, atol=1e-7)

    s_set = np.array([99.0, 74.25, 49.5, 24.75, 0.0])
    losses = np.array([0.9, 0.5, 0.45, 0.6, 0.8])
    best_ref = float(ref_sc.get_best_sparsity(
        torch.tensor(s_set), torch.tensor(losses)))
    best_ours = minet.get_best_sparsity(s_set, losses)
    np.testing.assert_allclose(best_ours, best_ref, rtol=1e-4)


def test_training_smoke_and_sparse_func(rng):
    """A few Adam steps reduce the Cox loss; sparse_func then sparsifies the
    interior weights without destroying the risk ordering."""
    import optax

    n = 48
    x = rng.randn(n, IN).astype(np.float32)
    age = rng.rand(n, 1).astype(np.float32)
    gene_mask = (rng.rand(GENE, IN) < 0.5).astype(np.float32)
    path_mask = (rng.rand(PATH, GENE) < 0.5).astype(np.float32)
    # risk increases with feature 0
    ytime = (100.0 * np.exp(-x[:, 0]) * rng.uniform(0.8, 1.2, n)).astype(np.float32)
    yevent = (rng.rand(n) < 0.8).astype(np.float32)

    model = minet.OmicsNet(IN, GENE, PATH, H)
    variables = model.init(jax.random.PRNGKey(1), jnp.asarray(x), jnp.asarray(age),
                           jnp.asarray(gene_mask), jnp.asarray(path_mask))
    do_m1, do_m2 = np.ones(PATH, np.float32), np.ones(H[0], np.float32)

    def loss_fn(variables):
        pred, _ = model.apply(
            variables, jnp.asarray(x), jnp.asarray(age), jnp.asarray(gene_mask),
            jnp.asarray(path_mask), jnp.asarray(do_m1), jnp.asarray(do_m2),
            (0.0, 0.0), True, mutable=["batch_stats"])
        return minet.neg_partial_log_likelihood(pred, jnp.asarray(ytime),
                                                jnp.asarray(yevent))

    opt = optax.adam(5e-2)
    opt_state = opt.init(variables)
    loss0 = float(loss_fn(variables))
    value_and_grad = jax.jit(jax.value_and_grad(loss_fn))
    for _ in range(30):
        loss, grads = value_and_grad(variables)
        updates, opt_state = opt.update(grads, opt_state)
        variables = optax.apply_updates(variables, updates)
    assert float(loss) < loss0

    pred = model.apply(variables, jnp.asarray(x), jnp.asarray(age),
                       jnp.asarray(gene_mask), jnp.asarray(path_mask))
    ci = float(minet.concordance_index(pred, jnp.asarray(ytime), jnp.asarray(yevent)))
    assert ci > 0.6

    # sparse-coding phase
    def loss_of(params):
        return loss_fn(params)

    do_m3 = np.ones(H[1], np.float32)
    sparsified = minet.sparse_func(variables, loss_of, do_m1, do_m2, do_m3)
    w = sparsified["params"]["pathway"]["kernel"]
    w0 = np.asarray(variables["params"]["pathway"]["kernel"])
    assert w.shape == w0.shape
    # soft-thresholding shrinks magnitudes (or leaves them when best sp == 0)
    assert np.all(np.abs(w) <= np.abs(w0) + 1e-6)
    # the sparsified model still orders risk better than chance
    pred_sp = model.apply({"params": sparsified["params"],
                           "batch_stats": variables["batch_stats"]},
                          jnp.asarray(x), jnp.asarray(age),
                          jnp.asarray(gene_mask), jnp.asarray(path_mask))
    ci_sp = float(minet.concordance_index(pred_sp, jnp.asarray(ytime),
                                          jnp.asarray(yevent)))
    assert ci_sp > 0.55
