"""Cross-fold executable-shape stability (compile-once CV).

The CV driver buckets edge counts so folds share jit compilations, but the
flat-segment and windowed-plan static shapes used to depend on the edge
DISTRIBUTION (per-tile chunk counts, residual sizes) — every fold was a new
executable and the experiment re-paid ~seconds of (remote) compile per fold.
SortedSegments.flat_bucket + the windowed CHUNK/RES buckets round those
shapes; this test pins the invariant: two different edge subsets at the
same bucketed edge count yield identical pytree structures AND shapes for
the graph metadata, so jit caches hit across folds.
"""
import numpy as np
import jax

from multilevel_gnn_tpu.core.graph import Graph
from multilevel_gnn_tpu.ops.pallas.segment_sum import SortedSegments
from multilevel_gnn_tpu.ops.pallas import windowed as W


def _shapes(tree):
    return jax.tree.map(
        lambda a: (a.shape, str(a.dtype)) if hasattr(a, "shape") else a, tree
    )


def test_sorted_segments_shapes_stable_across_distributions():
    """Fold-like variation (different subsets of one topology class) must
    bucket to identical shapes.  Pathological skew (everything in one tile)
    legitimately needs more chunks and is NOT required to match."""
    n, e = 1500, 6000
    segs = []
    for seed in (0, 1, 2, 3):
        rng = np.random.RandomState(seed)
        ids = rng.randint(0, n, e)
        segs.append(SortedSegments.build(ids, n, te=256))
    s0 = _shapes(segs[0])
    for s in segs[1:]:
        assert _shapes(s) == s0


def test_windowed_plan_shapes_stable_across_folds():
    rng = np.random.RandomState(0)
    n, e = 1200, 6000
    base_src = rng.randint(0, n, e)
    base_dst = np.clip(base_src + rng.randint(-60, 61, e), 0, n - 1)
    base_dst[:500] = rng.randint(0, n, 500)  # residual spill
    plans = []
    for seed in (1, 2, 3):
        # fold = a different random mask at the same bucketed count
        m = np.zeros(e, bool)
        m[np.random.RandomState(seed).choice(e, 5000, replace=False)] = True
        plans.append(
            W.build_plan(base_src, base_dst, n, mask=m, Wb=128, nwin=2)
        )
    p0 = _shapes(plans[0])
    for p in plans[1:]:
        assert _shapes(p) == p0


def test_fold_graph_meta_shapes_stable():
    """End-to-end: Graph.with_window_meta + with_sorted_meta over two
    different edge subsets padded to the same bucket — identical shapes."""
    rng = np.random.RandomState(0)
    n, e = 900, 4000
    src = rng.randint(0, n, e)
    dst = np.clip(src + rng.randint(-50, 51, e), 0, n - 1)
    shapes = []
    for seed in (5, 6):
        keep = np.random.RandomState(seed).rand(e) < 0.8
        g = Graph.from_edges(
            np.stack([src[keep], dst[keep]]),
            rng.rand(int(keep.sum())).astype(np.float32),
            n,
        ).pad_edges_to(4096)
        g = g.with_window_meta(Wb=128, nwin=2).with_sorted_meta()
        shapes.append(_shapes((g.csr, g.csc, g.winplan)))
    assert shapes[0] == shapes[1]
