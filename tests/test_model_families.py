"""PathCNN / DiffPool / AE / VAE / VQ-VAE model-family tests (SURVEY.md §4.3)
+ pretrain -> fine-tune transfer."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from multilevel_gnn_tpu.core.batch import Batch
from multilevel_gnn_tpu.core.config import Config
from multilevel_gnn_tpu.data.synthetic import make_synthetic_cohort
from multilevel_gnn_tpu.models.diffpool import (
    DenseSAGEConv,
    DiffPool,
    dense_diff_pool,
)
from multilevel_gnn_tpu.models.pathcnn import PathCNN
from multilevel_gnn_tpu.models.autoencoder import AutoEncoder
from multilevel_gnn_tpu.models.vae import VAE, vae_loss
from multilevel_gnn_tpu.models.vq_vae import VQVAE, vqvae_loss
from multilevel_gnn_tpu.train.pretrain import (
    pretrain_autoencoder,
    transfer_pretrained,
)

from test_data_pipeline import gbm_like_cfg


def make_cohort(**kw):
    cfg = gbm_like_cfg(**kw)
    cohort = make_synthetic_cohort(cfg, seed=0, n_patients=30, n_pathways=5)
    cfg = cfg.replace(
        pathway_num=cohort.n_pathways,
        node_num=cohort.num_nodes // 3,
        slot_sizes=cohort.slot_sizes(),
    )
    return cfg, cohort


def batch_of(cohort, fold, B=4, raw=False):
    b = Batch(
        x=jnp.asarray(cohort.X[:B]),
        y=jnp.asarray(cohort.Y[:B]),
        age=jnp.asarray(cohort.ages[:B]),
        sample_mask=jnp.ones(B, bool),
        raw_data=jnp.asarray(
            cohort.raw_datas[
                [cohort.pca_patients.index(p) for p in cohort.patients[:B]]
            ].astype(np.float32)
        )
        if raw
        else None,
    )
    return b


def test_pathcnn_forward():
    cfg, cohort = make_cohort(
        model="pathcnn", pathcnn_kernel_size=3, learnable_pca=True
    )
    fold = cohort.fold(np.arange(18), 0)
    b = batch_of(cohort, fold, raw=True)
    m = PathCNN(cfg)
    params = m.init(jax.random.PRNGKey(0), b, fold.ctx, False)
    pred, feat = m.apply(params, b, fold.ctx, False)
    assert pred.shape == (4, 2)
    np.testing.assert_allclose(np.asarray(pred.sum(-1)), np.ones(4), rtol=1e-5)
    assert feat.shape == (4, 1, cohort.n_pathways, 3 * cfg.pca_dim)


def test_dense_sage_conv_vs_torch(rng):
    """DenseSAGEConv parity vs explicit torch reference."""
    B, N, Cin, Cout = 2, 10, 6, 5
    x = rng.randn(B, N, Cin).astype(np.float32)
    adj = (rng.rand(N, N) > 0.6).astype(np.float32)
    conv = DenseSAGEConv(Cout, normalize=True)
    params = conv.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(adj))
    out = conv.apply(params, jnp.asarray(x), jnp.asarray(adj))
    Wr = torch.tensor(np.asarray(params["params"]["lin_rel"]["kernel"]))
    br = torch.tensor(np.asarray(params["params"]["lin_rel"]["bias"]))
    Wt = torch.tensor(np.asarray(params["params"]["lin_root"]["kernel"]))
    bt = torch.tensor(np.asarray(params["params"]["lin_root"]["bias"]))
    tx, tadj = torch.tensor(x), torch.tensor(adj)
    agg = tadj @ tx / tadj.sum(-1, keepdim=True).clamp(min=1)
    want = (agg @ Wr + br) + (tx @ Wt + bt)
    want = torch.nn.functional.normalize(want, p=2, dim=-1)
    np.testing.assert_allclose(np.asarray(out), want.numpy(), rtol=1e-4, atol=1e-5)


def test_dense_diff_pool_losses(rng):
    B, N, C, K = 2, 8, 4, 3
    x = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    adj = jnp.asarray((rng.rand(N, N) > 0.5).astype(np.float32))
    s = jnp.asarray(rng.randn(B, N, K).astype(np.float32))
    out, out_adj, l, e = dense_diff_pool(x, adj, s)
    assert out.shape == (B, K, C) and out_adj.shape == (B, K, K)
    ts = torch.softmax(torch.tensor(np.asarray(s)), dim=-1)
    tadj = torch.tensor(np.asarray(adj)).expand(B, N, N)
    want_l = torch.norm(tadj - ts @ ts.transpose(1, 2), p=2) / tadj.numel()
    want_e = (-ts * torch.log(ts + 1e-15)).sum(-1).mean()
    np.testing.assert_allclose(float(l), float(want_l), rtol=1e-4)
    np.testing.assert_allclose(float(e), float(want_e), rtol=1e-4)


def test_diffpool_stack_coarsening(rng):
    cfg = gbm_like_cfg()
    B, P, C = 3, 16, 8
    x = jnp.asarray(rng.randn(B, P, C).astype(np.float32))
    adj = jnp.asarray((rng.rand(P, P) > 0.5).astype(np.float32))
    m = DiffPool(cfg, C, P, num_layers=2, gnn_hidden_dim=6, gnn_output_dim=6)
    params = m.init(jax.random.PRNGKey(0), x, adj, False)
    out, l, e = m.apply(params, x, adj, False)
    # 16 -> ceil(4) -> ... final level has ceil(0.25*16)=4 then 1
    assert out.shape[0] == B
    assert out.shape[1] == 1  # ceil(4 * 0.25)
    assert np.isfinite(float(l)) and np.isfinite(float(e))


def test_autoencoder_roundtrip_and_transfer():
    cfg, cohort = make_cohort(model="autoencoder", decoder_type="flatten")
    cfg = cfg.replace(decoder_dim=64, epochs=2, batch_size=8, lr=1e-3)
    params, model, ctx, fold = pretrain_autoencoder(cfg, cohort, "autoencoder", epochs=2)
    b = batch_of(cohort, fold, raw=True)
    recon, h = model.apply(params, b, ctx, False)
    assert recon.shape == (4, cohort.num_nodes)
    assert bool(jnp.isfinite(recon).all())

    # transfer into the classifier
    from multilevel_gnn_tpu.models.multilevel_gnn import MultilevelGNN

    clf = MultilevelGNN(cfg)
    cparams = clf.init(jax.random.PRNGKey(1), b, ctx, False)
    merged = transfer_pretrained(params, cparams)
    # gnn + pca leaves must now match the pretrained ones
    import flax

    src = flax.traverse_util.flatten_dict(params)
    dst = flax.traverse_util.flatten_dict(merged)
    shared = [p for p in dst if p in src and src[p].shape == dst[p].shape]
    assert any("gnn_0" in "/".join(p) for p in shared)
    for p in shared:
        np.testing.assert_array_equal(np.asarray(dst[p]), np.asarray(src[p]))
    pred, _ = clf.apply(merged, b, ctx, False)
    assert bool(jnp.isfinite(pred).all())


def test_autoencoder_foreach_decoder():
    cfg, cohort = make_cohort(model="autoencoder", decoder_type="foreach_diffhidden")
    cfg = cfg.replace(decoder_dim=32)
    fold = cohort.fold(np.arange(18), 0)
    b = batch_of(cohort, fold, raw=True)
    m = AutoEncoder(cfg)
    params = m.init(jax.random.PRNGKey(0), b, fold.ctx, False)
    recon, h = m.apply(params, b, fold.ctx, False)
    assert recon.shape == (4, cohort.num_pca_rows)


@pytest.mark.slow  # quick tier (VERDICT r4 Next #8): heavy CPU-mesh equivalence; covered by faster smokes in the quick tier
def test_vae_forward_and_loss():
    cfg, cohort = make_cohort(model="vae", decoder_type="foreach")
    cfg = cfg.replace(decoder_dim=32)
    fold = cohort.fold(np.arange(18), 0)
    b = batch_of(cohort, fold, raw=True)
    m = VAE(cfg)
    key = jax.random.PRNGKey(0)
    params = m.init({"params": key, "sample": key}, b, fold.ctx, False)
    out = m.apply(params, b, fold.ctx, False)
    assert out["pred_x"].shape == (4, cohort.num_pca_rows)
    d = vae_loss(out["pred_x"], b.raw_data, out["z"], out["mu"], out["sigma"],
                 cfg, key)
    assert np.isfinite(float(d["loss"]))
    assert np.isfinite(float(d["MMD"]))

    # fine-tune head over DiffPool pooling
    cfg2 = cfg.replace(reorder_type="diff_pooling", diff_pooling_layer=1,
                       diff_pooling_hidden_dim=8, diff_pooling_output_dim=8)
    m2 = VAE(cfg2)
    adj = jnp.asarray(np.eye(cohort.n_pathways, dtype=np.float32))
    params2 = m2.init(
        {"params": key, "sample": key}, b, fold.ctx, False,
        mode="finetune", pathway_adj=adj,
    )
    (pred, img, l, e), aux = m2.apply(
        params2, b, fold.ctx, False, mode="finetune", pathway_adj=adj
    )
    assert pred.shape == (4, 2)
    np.testing.assert_allclose(np.asarray(pred.sum(-1)), np.ones(4), rtol=1e-5)


@pytest.mark.slow  # quick tier (VERDICT r4 Next #8): heavy CPU-mesh equivalence; covered by faster smokes in the quick tier
def test_vqvae_straight_through():
    cfg, cohort = make_cohort(model="vq_vae", decoder_type="foreach")
    cfg = cfg.replace(decoder_dim=32, vqvae_num_embeddings=16)
    fold = cohort.fold(np.arange(18), 0)
    b = batch_of(cohort, fold, raw=True)
    m = VQVAE(cfg)
    params = m.init(jax.random.PRNGKey(0), b, fold.ctx, False)
    out = m.apply(params, b, fold.ctx, False)
    d = vqvae_loss(out["pred_x"], b.raw_data, out["vq_loss"], cfg)
    assert np.isfinite(float(d["loss"]))
    # straight-through: gradient flows to encoder params through quantized z
    def loss(p):
        o = m.apply(p, b, fold.ctx, False)
        return jnp.sum(o["quantized"] ** 2)

    g = jax.grad(loss)(params)
    emb_grad = jax.tree_util.tree_leaves(
        g["params"]["node_embedding"]
    )[0]
    assert float(jnp.abs(emb_grad).sum()) > 0


def test_pretrain_epoch_scan_equivalence():
    """The device-side pretraining epoch scan (cfg.epoch_scan, the shipped
    default) reproduces the per-step host loop exactly: same batches from
    the same host permutation stream, same fold_in key sequence, same
    final params."""
    import flax

    cfg, cohort = make_cohort(model="autoencoder", decoder_type="flatten")
    cfg = cfg.replace(decoder_dim=64, epochs=2, batch_size=8, lr=1e-3)
    p_scan, _, _, _ = pretrain_autoencoder(
        cfg.replace(epoch_scan=True), cohort, "autoencoder", epochs=2
    )
    p_loop, _, _, _ = pretrain_autoencoder(
        cfg.replace(epoch_scan=False), cohort, "autoencoder", epochs=2
    )
    a = flax.traverse_util.flatten_dict(p_scan)
    b = flax.traverse_util.flatten_dict(p_loop)
    assert set(a) == set(b)
    for path in a:
        np.testing.assert_allclose(
            np.asarray(a[path]), np.asarray(b[path]), rtol=1e-6, atol=1e-6,
            err_msg="/".join(map(str, path)),
        )
