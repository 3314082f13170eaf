"""KNN graph, on-device PCA, dynamic blocks, native parser, cache,
optimizer zoo, label smoothing."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multilevel_gnn_tpu.ops.knn import knn_graph, pairwise_sq_dists
from multilevel_gnn_tpu.ops.pca import pca_lowrank, pca_svd


def test_pairwise_and_knn(rng):
    N, D, k = 30, 4, 5
    x = rng.randn(N, D).astype(np.float32)
    d = np.asarray(pairwise_sq_dists(jnp.asarray(x)))
    want = ((x[:, None] - x[None]) ** 2).sum(-1)
    np.testing.assert_allclose(d, want, rtol=1e-3, atol=1e-4)
    send, recv = knn_graph(jnp.asarray(x), k)
    send, recv = np.asarray(send), np.asarray(recv)
    assert send.shape == (N * k,)
    for i in range(N):
        mine = set(send[recv == i].tolist())
        order = np.argsort(want[i] + np.where(np.arange(N) == i, 1e9, 0))
        assert mine == set(order[:k].tolist())


def test_knn_dilated(rng):
    x = rng.randn(20, 3).astype(np.float32)
    send, recv = knn_graph(jnp.asarray(x), k=3, dilation=2)
    assert send.shape == (60,)


def test_pca_svd_matches_sklearn(rng):
    from sklearn.decomposition import PCA

    x = rng.randn(40, 7).astype(np.float32)
    got = np.asarray(pca_svd(jnp.asarray(x), 3, center=True))
    ref = PCA(n_components=3, svd_solver="full").fit_transform(x)
    # signs per component are arbitrary
    for j in range(3):
        a, b = got[:, j], ref[:, j]
        assert min(np.abs(a - b).max(), np.abs(a + b).max()) < 1e-3


def test_pca_lowrank_subspace(rng):
    # decaying spectrum (randomized PCA assumes one, like real omics data)
    u, _ = np.linalg.qr(rng.randn(50, 10))
    v, _ = np.linalg.qr(rng.randn(10, 10))
    x = (u @ np.diag([20, 10, 5, 1, 0.5, 0.2, 0.1, 0.05, 0.02, 0.01]) @ v.T).astype(
        np.float32
    )
    got = np.asarray(pca_lowrank(jnp.asarray(x), 3, niter=4))
    ref = np.asarray(pca_svd(jnp.asarray(x), 3, center=False))
    # projections span the same top-3 subspace: norms match per column
    np.testing.assert_allclose(
        np.sort(np.linalg.norm(got, axis=0)),
        np.sort(np.linalg.norm(ref, axis=0)),
        rtol=1e-3,
    )


def test_dyn_blocks(rng):
    from multilevel_gnn_tpu.nn.blocks import DenseDynBlock, DynConv, ResDynBlock

    x = jnp.asarray(rng.randn(25, 8).astype(np.float32))
    m = DynConv(8, 8, kernel_size=4, conv="edge")
    p = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(p, x)
    assert out.shape == (25, 8)
    r = ResDynBlock(8, kernel_size=4)
    pr = r.init(jax.random.PRNGKey(1), x)
    assert r.apply(pr, x).shape == (25, 8)
    d = DenseDynBlock(8, 6, kernel_size=4)
    pd_ = d.init(jax.random.PRNGKey(2), x)
    assert d.apply(pd_, x).shape == (25, 14)


def test_native_parser_matches_pandas(tmp_path):
    import pandas as pd

    from multilevel_gnn_tpu.data import native

    rows = [("G%d" % i, "G%d" % (i + 1), 0.1 * i) for i in range(50)]
    df = pd.DataFrame(rows, columns=["TF", "target", "importance"])
    p = str(tmp_path / "e.tsv")
    df.to_csv(p, sep="\t", index=False)
    srcs, dsts, vals = native.parse_edge_tsv(p)
    assert srcs == df["TF"].tolist()
    assert dsts == df["target"].tolist()
    np.testing.assert_allclose(vals, df["importance"].to_numpy(), rtol=1e-9)


def test_native_fill_node_features(rng):
    from multilevel_gnn_tpu.data import native

    vals = rng.randn(5, 8).astype(np.float32)
    slots = np.array([3, -1, 0, 7, 2, 2, -1, 5], np.int64)
    out = native.fill_node_features(vals, slots, 9)
    assert out.shape == (5, 9)
    np.testing.assert_allclose(out[:, 3], vals[:, 0])
    np.testing.assert_allclose(out[:, 2], vals[:, 5])  # later col wins
    assert np.all(out[:, 1] == 0)


def test_preprocess_cache(tmp_path):
    from multilevel_gnn_tpu.data.cache import PreprocessCache, content_key

    c = PreprocessCache(str(tmp_path))
    k = content_key("mi", ("p1", "p2"), 7)
    assert c.get(k) is None
    c.put(k, {"x": np.arange(3)})
    got = c.get(k)
    np.testing.assert_array_equal(got["x"], np.arange(3))
    assert content_key("mi", ("p1", "p2"), 8) != k


def test_optimizer_zoo_and_smoothing():
    from multilevel_gnn_tpu.core.config import Config
    from multilevel_gnn_tpu.train.step import make_optimizer, smooth_cross_entropy

    cfg = Config(lr=1e-3, warmup_epochs=2, warmup_lr=1e-5, step=5)
    params = {"w": jnp.ones(3)}
    for name in ("adam", "radam", "adamw"):
        tx = make_optimizer(cfg, steps_per_epoch=4, name=name)
        state = tx.init(params)
        up, _ = tx.update({"w": jnp.ones(3)}, state, params)
        assert np.isfinite(np.asarray(up["w"])).all()
    probs = jnp.asarray([[0.9, 0.1], [0.2, 0.8]])
    l = smooth_cross_entropy(probs, jnp.asarray([0, 1]), smoothing=0.1)
    assert np.isfinite(float(l)) and float(l) > 0


def test_runtime_pca_reduction(rng):
    """Flagship with reduction_method='pca_svd' (reference :243-256)."""
    from multilevel_gnn_tpu.core.batch import Batch
    from multilevel_gnn_tpu.data.synthetic import make_synthetic_cohort
    from multilevel_gnn_tpu.models.multilevel_gnn import MultilevelGNN

    from test_data_pipeline import gbm_like_cfg

    cfg = gbm_like_cfg(reduction_method="pca_svd")
    cohort = make_synthetic_cohort(cfg, seed=0, n_patients=20, n_pathways=4)
    cfg = cfg.replace(
        pathway_num=cohort.n_pathways, node_num=cohort.num_nodes // 3,
        slot_sizes=cohort.slot_sizes(),
    )
    fold = cohort.fold(np.arange(12), 0)
    B = 6
    b = Batch(
        x=jnp.asarray(cohort.X[:B]), y=jnp.asarray(cohort.Y[:B]),
        age=jnp.asarray(cohort.ages[:B]), sample_mask=jnp.ones(B, bool),
    )
    m = MultilevelGNN(cfg)
    params = m.init(jax.random.PRNGKey(0), b, fold.ctx, False)
    pred, feat = m.apply(params, b, fold.ctx, False)
    assert pred.shape == (B, 2)
    assert bool(jnp.isfinite(pred).all())
    assert feat.shape == (B, cfg.final_channels, cohort.n_pathways, 3 * cfg.pca_dim)
