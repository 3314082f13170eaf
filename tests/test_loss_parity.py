"""Loss value AND gradient parity vs torch (reference train.py:38-68,
utils/loss.py:5-24).

The BCE gradient at saturated predictions is the critical case: torch's
binary_cross_entropy_backward clamps the denominator at 1e-12, so a
softmax output of exactly 0.0/1.0 yields a +-1e12 gradient — large but
finite, tamed by grad clip / Adam.  A naive clip(log(p)) JAX formulation
NaNs there (0 * inf in the chain rule) and NaN-poisons the params; this
was measured as 13 frozen NaN epochs in the synthetic-cohort GBM CV
before the custom-VJP fix.
"""
import numpy as np
import jax
import jax.numpy as jnp
import torch

from multilevel_gnn_tpu.train.step import bce_elementwise, smooth_cross_entropy


def _torch_bce_val_grad(p, t):
    x = torch.tensor([p], dtype=torch.float32, requires_grad=True)
    loss = torch.nn.functional.binary_cross_entropy(
        x, torch.tensor([t], dtype=torch.float32)
    )
    loss.backward()
    return float(loss.item()), float(x.grad.item())


SATURATION_CASES = [
    (0.0, 1.0), (0.0, 0.0), (1.0, 1.0), (1.0, 0.0),
    (1e-20, 1.0), (1.0 - 1e-7, 0.0), (0.5, 1.0), (1.0, 0.3),
    (0.3, 0.7), (1e-6, 0.0),
]


def test_bce_value_and_grad_match_torch_at_saturation():
    f = lambda p, t: bce_elementwise(p, t)
    g = jax.grad(f, argnums=0)
    for p, t in SATURATION_CASES:
        tv, tg = _torch_bce_val_grad(p, t)
        jv = float(bce_elementwise(jnp.float32(p), jnp.float32(t)))
        jg = float(g(jnp.float32(p), jnp.float32(t)))
        np.testing.assert_allclose(jv, tv, rtol=1e-5, atol=1e-6, err_msg=f"value p={p} t={t}")
        np.testing.assert_allclose(jg, tg, rtol=1e-4, atol=1e-6, err_msg=f"grad p={p} t={t}")
        assert np.isfinite(jg), (p, t, jg)


def test_bce_grad_finite_under_jit_batch():
    pred = jnp.asarray([[0.0, 1.0], [1e-30, 1.0 - 1e-7], [0.4, 0.6]])
    y = jnp.asarray([[1.0, 0.0], [0.0, 1.0], [0.0, 1.0]])

    def loss(p):
        return bce_elementwise(p, y).mean()

    g = jax.jit(jax.grad(loss))(pred)
    assert np.isfinite(np.asarray(g)).all()


def _load_reference_smooth_ce():
    src = open("/root/reference/utils/loss.py").read()
    ns = {}
    exec(compile(src, "ref_loss.py", "exec"), ns)
    return ns["SmoothCrossEntropy"]


def test_smooth_ce_matches_reference_module():
    """Logits path vs the REAL reference SmoothCrossEntropy (exec'd)."""
    SmoothCE = _load_reference_smooth_ce()
    rng = np.random.RandomState(0)
    logits = rng.randn(16, 4).astype(np.float32)
    gt = rng.randint(0, 4, size=16)

    ref = SmoothCE(smoothing=True, eps=0.2)(
        torch.tensor(logits), torch.tensor(gt)
    )
    ours = smooth_cross_entropy(
        jnp.asarray(logits), jnp.asarray(gt), smoothing=0.2, from_probs=False
    )
    np.testing.assert_allclose(float(ours), float(ref.item()), rtol=1e-5)

    # eps=0 path == plain cross entropy
    ref0 = SmoothCE(smoothing=False)(torch.tensor(logits), torch.tensor(gt))
    ours0 = smooth_cross_entropy(
        jnp.asarray(logits), jnp.asarray(gt), smoothing=0.0, from_probs=False
    )
    np.testing.assert_allclose(float(ours0), float(ref0.item()), rtol=1e-5)


def test_smooth_ce_probs_path_grad_safe():
    probs = jnp.asarray([[1.0, 0.0], [0.7, 0.3]])

    def loss(p):
        return smooth_cross_entropy(p, jnp.asarray([0, 1]), smoothing=0.2)

    val = loss(probs)
    g = jax.grad(loss)(probs)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(g)).all()
