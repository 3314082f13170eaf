"""Pallas sorted-segment-sum kernel vs XLA oracle (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multilevel_gnn_tpu.ops.pallas.segment_sum import (
    SortedSegments,
    segment_sum_by,
    sorted_segment_sum,
)


def xla_oracle(data, ids, n):
    return jax.ops.segment_sum(jnp.moveaxis(data, -2, 0), jnp.asarray(ids), n)


@pytest.mark.parametrize(
    "E,N,C,B", [(700, 300, 64, 1), (1000, 150, 96, 3), (50, 700, 130, 2)]
)
def test_sorted_segment_sum(rng, E, N, C, B):
    ids = np.sort(rng.randint(0, N, size=E))
    seg = SortedSegments.build(ids, N, tn=128, te=256)
    assert seg.perm is None
    data = rng.randn(B, E, C).astype(np.float32)
    got = sorted_segment_sum(jnp.asarray(data), seg, interpret=True)
    want = np.moveaxis(np.asarray(xla_oracle(jnp.asarray(data), ids, N)), 0, -2)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-4)


def test_unsorted_with_perm_and_dropped(rng):
    E, N, C = 900, 200, 64
    ids = rng.randint(-1, N, size=E)  # includes -1 (dropped)
    mask = rng.rand(E) > 0.2
    seg = SortedSegments.build(ids, N, mask=mask)
    assert seg.perm is not None
    data = rng.randn(E, C).astype(np.float32)
    got = segment_sum_by(jnp.asarray(data), seg, interpret=True)
    keep = mask & (ids >= 0)
    want = np.zeros((N, C), np.float32)
    for i in np.where(keep)[0]:
        want[ids[i]] += data[i]
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-4)


def test_empty_segments_and_skew(rng):
    # hub-heavy distribution: one segment receives half the edges
    E, N, C = 2000, 500, 32
    ids = np.concatenate(
        [np.full(E // 2, 7), rng.randint(0, N, size=E - E // 2)]
    )
    ids = np.sort(ids)
    seg = SortedSegments.build(ids, N)
    data = rng.randn(E, C).astype(np.float32)
    got = segment_sum_by(jnp.asarray(data), seg, interpret=True)
    want = np.moveaxis(
        np.asarray(xla_oracle(jnp.asarray(data)[None], ids, N))[:, 0], 0, 0
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-4)


def test_flat_layout_edge_cases(rng):
    from multilevel_gnn_tpu.ops.pallas.segment_sum import (
        flat_segment_sum,
        flatten_rows,
    )

    # every tile owns >= 1 chunk even when empty; owners nondecreasing
    for E, N in [(5, 700), (300, 120), (0, 256)]:
        ids = np.sort(rng.randint(0, N, size=E)) if E else np.zeros(0, np.int64)
        seg = SortedSegments.build(ids, N, tn=128, te=256)
        own = np.asarray(seg.owner)
        assert (np.diff(own) >= 0).all()
        assert set(range(seg.n_tiles)) <= set(own.tolist())
        data = rng.randn(E, 40).astype(np.float32)
        got = flat_segment_sum(flatten_rows(jnp.asarray(data), seg), seg,
                               interpret=True)
        want = np.zeros((N, 40), np.float32)
        for i in range(E):
            want[ids[i]] += data[i]
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-4)


def test_flat_matches_tile_major_on_skew(rng):
    from multilevel_gnn_tpu.ops.pallas.segment_sum import flat_segment_sum, flatten_rows

    E, N, C = 2000, 500, 32
    ids = np.sort(
        np.concatenate([np.full(E // 2, 7), rng.randint(0, N, size=E - E // 2)])
    )
    seg = SortedSegments.build(ids, N, te=256)
    data = rng.randn(E, C).astype(np.float32)
    a = flat_segment_sum(flatten_rows(jnp.asarray(data), seg), seg, interpret=True)
    b = sorted_segment_sum(jnp.asarray(data)[None], seg, interpret=True)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-4)


def test_flat_weighted_kernel_both_dtypes(rng):
    """flat_segment_sum(w=): the r5 weighted kernel — bf16 folds the
    per-edge weight into the one-hot (in-kernel), f32 pre-multiplies
    exactly; both must match the weighted XLA oracle."""
    from multilevel_gnn_tpu.ops.pallas.segment_sum import (
        SortedSegments,
        flat_segment_sum,
        flatten_rows,
    )

    E, N, C = 900, 220, 64
    ids = rng.randint(0, N, size=E)
    mask = rng.rand(E) > 0.1
    data = rng.randn(E, C).astype(np.float32)
    w = rng.rand(E).astype(np.float32)
    seg = SortedSegments.build(ids, N, te=128, mask=mask)
    wf = jnp.take(
        jnp.concatenate([jnp.asarray(w), jnp.zeros(1)]), seg.perm_pad
    )
    want = jax.ops.segment_sum(
        jnp.asarray(data * w[:, None] * mask[:, None]), jnp.asarray(ids), N
    )

    got_f32 = flat_segment_sum(
        flatten_rows(jnp.asarray(data), seg), seg, interpret=True, w=wf
    )
    np.testing.assert_allclose(np.asarray(got_f32), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    d16 = jnp.asarray(data, jnp.bfloat16)
    got_bf16 = flat_segment_sum(
        flatten_rows(d16, seg), seg, interpret=True, w=wf
    )
    want16 = jax.ops.segment_sum(
        (d16 * jnp.asarray(w, jnp.bfloat16)[:, None]).astype(jnp.float32)
        * jnp.asarray(mask)[:, None],
        jnp.asarray(ids), N,
    )
    np.testing.assert_allclose(
        np.asarray(got_bf16), np.asarray(want16), rtol=2e-2, atol=2e-2
    )
