"""Windowed (locality-blocked) SpMM vs XLA oracle, forward AND gradient.

Covers: banded graphs (fully in-window), random graphs (heavy residual),
node permutation (RCM path), masked/padding edges, empty graphs, bf16
data mode, and the custom VJP (transpose plan + transpose-residual).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multilevel_gnn_tpu.ops.pallas import windowed as W


def _oracle(x, w, src, dst, n):
    out = np.zeros((n, x.shape[1]), np.float64)
    for e in range(len(src)):
        out[dst[e]] += x[src[e]].astype(np.float64) * w[e, 0]
    return out


def _rand_graph(rng, n, e, banded=None):
    src = rng.randint(0, n, e)
    if banded is not None:
        dst = np.clip(src + rng.randint(-banded, banded + 1, e), 0, n - 1)
    else:
        dst = rng.randint(0, n, e)
    w = rng.randn(e, 1).astype(np.float32)
    return src.astype(np.int64), dst.astype(np.int64), w


@pytest.mark.parametrize("banded,n,e", [(40, 700, 4000), (None, 500, 3000)])
def test_windowed_forward_matches_oracle(banded, n, e):
    rng = np.random.RandomState(0)
    src, dst, w = _rand_graph(rng, n, e, banded)
    plan = W.build_plan(src, dst, n, Wb=256, nwin=2)
    if banded is not None:
        # tile span 128 + 2*banded <= Wb guarantees an aligned fit
        assert plan.in_window_frac == 1.0
    x = rng.randn(n, 192).astype(np.float32)
    out = W.windowed_spmm_2d(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(src, jnp.int32),
        jnp.asarray(dst, jnp.int32), plan,
    )
    ref = _oracle(x, w, src, dst, n)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=1e-4)


def test_windowed_with_perm_and_mask():
    rng = np.random.RandomState(1)
    n, e = 600, 3000
    # two shuffled communities -> identity ordering is bad, RCM recovers
    comm = rng.randint(0, 2, n)
    order = np.argsort(rng.rand(n))
    src, dst = [], []
    for _ in range(e):
        c = rng.randint(0, 2)
        nodes = order[comm[order] == c]
        src.append(nodes[rng.randint(len(nodes))])
        dst.append(nodes[rng.randint(len(nodes))])
    src, dst = np.array(src), np.array(dst)
    w = rng.randn(e, 1).astype(np.float32)
    mask = rng.rand(e) > 0.1

    perm, f_id, f_best = W.choose_node_perm(
        src[mask], dst[mask], n, Wb=128, nwin=2
    )
    plan = W.build_plan(src, dst, n, mask=mask, perm=perm, Wb=128, nwin=2)
    x = rng.randn(n, 64).astype(np.float32)
    out = W.windowed_spmm_2d(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(src, jnp.int32),
        jnp.asarray(dst, jnp.int32), plan,
    )
    ref = _oracle(x, w * mask[:, None], src, dst, n)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=1e-4)


def test_windowed_gradient_matches_oracle():
    rng = np.random.RandomState(2)
    n, e = 400, 2500
    src, dst, w = _rand_graph(rng, n, e, banded=60)
    # drop some edges out of window by making a few long-range
    src[:100] = rng.randint(0, n, 100)
    plan = W.build_plan(src, dst, n, Wb=128, nwin=2)
    assert 0.5 < plan.in_window_frac < 1.0
    x = rng.randn(n, 128).astype(np.float32)
    g = rng.randn(n, 128).astype(np.float32)

    def f(xx):
        out = W.windowed_spmm_2d(
            xx, jnp.asarray(w), jnp.asarray(src, jnp.int32),
            jnp.asarray(dst, jnp.int32), plan,
        )
        return jnp.vdot(out, jnp.asarray(g))

    dx = jax.grad(f)(jnp.asarray(x))
    # oracle: d_x[src] += g[dst] * w
    ref = _oracle(g, w, dst, src, n)
    np.testing.assert_allclose(np.asarray(dx), ref, rtol=2e-5, atol=1e-4)


def test_windowed_bf16_mode():
    rng = np.random.RandomState(3)
    n, e = 300, 1500
    src, dst, w = _rand_graph(rng, n, e, banded=50)
    plan = W.build_plan(src, dst, n, Wb=128, nwin=2)
    x = rng.randn(n, 64).astype(np.float32)
    out = W.windowed_spmm_2d(
        jnp.asarray(x).astype(jnp.bfloat16),
        jnp.asarray(w), jnp.asarray(src, jnp.int32),
        jnp.asarray(dst, jnp.int32), plan,
    )
    ref = _oracle(x, w, src, dst, n)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(
        np.asarray(out), ref, atol=0.03 * scale, rtol=0.05
    )


def test_windowed_bf16_gradient_with_residual():
    """bf16 message mode must stay bf16 on the BACKWARD side too (the
    cotangent rides the single-pass kernel + bf16 residual weights) and
    still match the f64 oracle at bf16 tolerance."""
    rng = np.random.RandomState(4)
    n, e = 400, 2500
    src, dst, w = _rand_graph(rng, n, e, banded=60)
    src[:150] = rng.randint(0, n, 150)  # long-range -> residual spill
    plan = W.build_plan(src, dst, n, Wb=128, nwin=2)
    assert 0.5 < plan.in_window_frac < 1.0
    x = rng.randn(n, 64).astype(np.float32)
    g = rng.randn(n, 64).astype(np.float32)

    def f(xx):
        out = W.windowed_spmm_2d(
            xx.astype(jnp.bfloat16), jnp.asarray(w),
            jnp.asarray(src, jnp.int32), jnp.asarray(dst, jnp.int32), plan,
        )
        return jnp.vdot(out, jnp.asarray(g))

    dx = jax.grad(f)(jnp.asarray(x))
    ref = _oracle(g, w, dst, src, n)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(
        np.asarray(dx), ref, atol=0.03 * scale, rtol=0.05
    )


def test_windowed_empty_graph():
    plan = W.build_plan(
        np.zeros(0, np.int64), np.zeros(0, np.int64), 200, Wb=128, nwin=2
    )
    x = jnp.ones((200, 64), jnp.float32)
    out = W.windowed_spmm_2d(
        x, jnp.zeros((0, 1), jnp.float32), jnp.zeros(0, jnp.int32),
        jnp.zeros(0, jnp.int32), plan,
    )
    assert out.shape == (200, 64)
    assert float(jnp.abs(out).max()) == 0.0
