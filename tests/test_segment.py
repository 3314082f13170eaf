"""Kernel unit tests: segment reduces vs dense numpy references, including
empty segments and padding masks (SURVEY.md §4.1)."""
import numpy as np
import jax.numpy as jnp
import pytest

from multilevel_gnn_tpu.ops import (
    segment_sum,
    segment_mean,
    segment_max,
    segment_min,
    segment_softmax,
)


def np_segment_reduce(data, seg, n, op):
    out = np.zeros((n,) + data.shape[1:], data.dtype)
    for s in range(n):
        rows = data[seg == s]
        if len(rows) == 0:
            continue
        out[s] = op(rows, axis=0)
    return out


@pytest.mark.parametrize("shape", [(40,), (40, 7), (3, 40, 5)])
def test_segment_sum_mean(rng, shape):
    n = 11
    E = shape[-1] if len(shape) == 1 else shape[-2]
    seg = rng.randint(0, n - 2, size=E).astype(np.int32)  # segments n-2, n-1 empty
    if len(shape) == 1:
        data = rng.randn(E, 1).astype(np.float32)
        axis = 0
    elif len(shape) == 2:
        data = rng.randn(*shape).astype(np.float32)
        axis = -2
    else:
        data = rng.randn(*shape).astype(np.float32)
        axis = -2
    got = segment_sum(jnp.asarray(data), jnp.asarray(seg), n, axis=axis)
    d2 = np.moveaxis(data, axis, 0)
    want = np_segment_reduce(d2, seg, n, np.sum)
    np.testing.assert_allclose(np.moveaxis(np.asarray(got), axis, 0), want, rtol=1e-5, atol=1e-5)

    got_m = segment_mean(jnp.asarray(data), jnp.asarray(seg), n, axis=axis)
    want_m = np_segment_reduce(d2, seg, n, np.mean)
    np.testing.assert_allclose(np.moveaxis(np.asarray(got_m), axis, 0), want_m, rtol=1e-5, atol=1e-5)


def test_segment_max_min_empty_is_zero(rng):
    n, E, C = 6, 20, 4
    seg = rng.randint(0, n - 1, size=E).astype(np.int32)
    data = rng.randn(E, C).astype(np.float32) - 5.0  # all negative-ish
    got = segment_max(jnp.asarray(data), jnp.asarray(seg), n, axis=0)
    want = np_segment_reduce(data, seg, n, np.max)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)
    assert np.all(np.asarray(got)[n - 1] == 0.0)  # empty segment -> 0

    got = segment_min(jnp.asarray(data), jnp.asarray(seg), n, axis=0)
    want = np_segment_reduce(data, seg, n, np.min)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


def test_segment_with_mask(rng):
    n, E, C = 5, 30, 3
    seg = rng.randint(0, n, size=E).astype(np.int32)
    mask = rng.rand(E) > 0.3
    data = rng.randn(E, C).astype(np.float32)
    got = segment_sum(jnp.asarray(data), jnp.asarray(seg), n, axis=0, mask=jnp.asarray(mask))
    want = np_segment_reduce(data[mask], seg[mask], n, np.sum)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)

    got = segment_mean(jnp.asarray(data), jnp.asarray(seg), n, axis=0, mask=jnp.asarray(mask))
    want = np_segment_reduce(data[mask], seg[mask], n, np.mean)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)

    got = segment_max(jnp.asarray(data), jnp.asarray(seg), n, axis=0, mask=jnp.asarray(mask))
    want = np_segment_reduce(data[mask], seg[mask], n, np.max)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_segment_softmax(rng):
    n, E, C = 7, 50, 4
    seg = rng.randint(0, n - 1, size=E).astype(np.int32)
    data = (rng.randn(E, C) * 10).astype(np.float32)
    got = np.asarray(segment_softmax(jnp.asarray(data), jnp.asarray(seg), n, axis=0))
    # dense reference per segment per column
    want = np.zeros_like(data)
    for s in range(n):
        rows = seg == s
        if rows.sum() == 0:
            continue
        z = data[rows]
        z = z - z.max(axis=0, keepdims=True)
        e = np.exp(z)
        want[rows] = e / e.sum(axis=0, keepdims=True)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # weights sum to 1 per non-empty segment
    sums = np_segment_reduce(got, seg, n, np.sum)
    np.testing.assert_allclose(sums[:-1], np.ones((n - 1, C)), rtol=1e-5)


def test_segment_softmax_batched_with_mask(rng):
    n, B, E, C = 4, 2, 25, 3
    seg = rng.randint(0, n, size=E).astype(np.int32)
    mask = rng.rand(E) > 0.4
    data = rng.randn(B, E, C).astype(np.float32)
    got = np.asarray(
        segment_softmax(jnp.asarray(data), jnp.asarray(seg), n, axis=-2, mask=jnp.asarray(mask))
    )
    assert got.shape == (B, E, C)
    assert np.all(got[:, ~mask, :] == 0.0)
    assert np.all(np.isfinite(got))
    for b in range(B):
        for s in range(n):
            rows = (seg == s) & mask
            if rows.sum():
                np.testing.assert_allclose(got[b, rows].sum(0), np.ones(C), rtol=1e-5)
