"""Pallas flat segment-max kernel vs numpy oracle (interpret mode on CPU),
plus the edge_segment_max VJP (VERDICT r1 item #5)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multilevel_gnn_tpu.core.graph import Graph
from multilevel_gnn_tpu.ops.pallas.segment_max import segment_max_by
from multilevel_gnn_tpu.ops.pallas.segment_sum import SortedSegments
from multilevel_gnn_tpu.ops import spmm


def np_segment_max(data, ids, n, mask=None):
    out = np.zeros((n,) + data.shape[1:], np.float32)
    touched = np.zeros(n, bool)
    for i in range(len(ids)):
        if mask is not None and not mask[i]:
            continue
        s = ids[i]
        if s < 0 or s >= n:
            continue
        out[s] = np.maximum(out[s], data[i]) if touched[s] else data[i]
        touched[s] = True
    return out


@pytest.mark.parametrize(
    "E,N,C", [(700, 300, 64), (1000, 150, 96), (50, 700, 130), (2000, 40, 32)]
)
def test_segment_max_matches_oracle(rng, E, N, C):
    ids = rng.randint(0, N, size=E)
    seg = SortedSegments.build(ids, N, tn=128, te=256)
    data = rng.randn(E, C).astype(np.float32)  # negatives included
    got = segment_max_by(jnp.asarray(data), seg, interpret=True)
    want = np_segment_max(data, ids, N)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-6)


def test_segment_max_negative_and_empty(rng):
    """All-negative data must keep true (negative) maxima; empty segments 0."""
    E, N, C = 300, 200, 32
    ids = rng.randint(0, N // 2, size=E)  # upper half of segments empty
    seg = SortedSegments.build(ids, N)
    data = (-1.0 - rng.rand(E, C)).astype(np.float32)
    got = np.asarray(segment_max_by(jnp.asarray(data), seg, interpret=True))
    want = np_segment_max(data, ids, N)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    assert (got[N // 2 :] == 0).all()
    assert (got[np.unique(ids)] < 0).all()


def test_segment_max_masked(rng):
    E, N, C = 500, 100, 16
    ids = rng.randint(0, N, size=E)
    mask = rng.rand(E) > 0.3
    seg = SortedSegments.build(ids, N, mask=mask)
    data = rng.randn(E, C).astype(np.float32)
    got = segment_max_by(jnp.asarray(data), seg, interpret=True)
    want = np_segment_max(data, ids, N, mask)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-6)


def test_edge_segment_max_forward_and_grad(rng):
    E, N, C, B = 400, 120, 24, 3
    edges = rng.randint(0, N, size=(2, E)).astype(np.int32)
    g = Graph.from_edges(edges, None, N).with_sorted_meta()
    msg = jnp.asarray(rng.randn(B, E, C).astype(np.float32))

    recv = np.asarray(g.receivers)  # graph edge order is destination-sorted
    out = spmm.edge_segment_max(msg, g.receivers, g.edge_mask, g.csr)
    want = np.stack(
        [np_segment_max(np.asarray(msg)[b], recv, N) for b in range(B)]
    )
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-6, atol=1e-6)

    # gradient == XLA segment_max gradient (no ties in random float data)
    from multilevel_gnn_tpu.ops import segment as seg_ops

    def f_pallas(m):
        return (
            spmm.edge_segment_max(m, g.receivers, g.edge_mask, g.csr) ** 2
        ).sum()

    def f_xla(m):
        return (
            seg_ops.segment_max(m, g.receivers, N, mask=g.edge_mask) ** 2
        ).sum()

    gp = jax.grad(f_pallas)(msg)
    gx = jax.grad(f_xla)(msg)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), rtol=1e-5, atol=1e-6)


def test_edge_segment_min(rng):
    E, N, C = 300, 80, 16
    edges = rng.randint(0, N, size=(2, E)).astype(np.int32)
    g = Graph.from_edges(edges, None, N).with_sorted_meta()
    msg = jnp.asarray(rng.randn(E, C).astype(np.float32))
    got = spmm.edge_segment_min(msg, g.receivers, g.edge_mask, g.csr)
    want = -np_segment_max(-np.asarray(msg), np.asarray(g.receivers), N)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-6)
