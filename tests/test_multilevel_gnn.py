"""Model-level golden test: MultilevelGNN forward vs a full torch oracle
with identical injected parameters (SURVEY.md §4.3, BASELINE activation
parity requirement)."""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from multilevel_gnn_tpu.core.batch import Batch, make_fold_context
from multilevel_gnn_tpu.core.config import Config
from multilevel_gnn_tpu.core.graph import Graph
from multilevel_gnn_tpu.models.multilevel_gnn import (
    MultilevelGNN,
    get_feature_loss,
    seed_pca_params,
)

import torch_oracle as oracle

N_GENES, N_PATH, K = 20, 4, 2
NODES = 3 * (N_GENES + N_PATH)  # gene-omics slots + pathway zero slots
B = 3


def tiny_cfg():
    return Config(
        model="multilevel_gnn",
        gnn_name="sage",
        gnn_act="leakyrelu",
        num_layers=2,
        hidden_channels=8,
        final_channels=4,
        final_head=2,
        node_embedding=True,
        node_embedding_dim=6,
        node_num=N_GENES + N_PATH,
        pathway_num=N_PATH,
        pca_dim=K,
        pathway_pool_dim=4,
        pca_pool_dim=2,
        conv_channel_list=[3, 5],
        conv_kernel_list=[1, 3],
        head_dim=7,
        use_age=True,
        value_att_mask=True,
        mutual_info_mask=True,
        pca_match_mask=True,
        weighted_edge=True,
        pca_indep_loss=True,
        feature_drop=True,
        learnable_pca=True,
    )


def build_fixture(rng):
    E = 60
    edges = rng.randint(0, NODES, size=(2, E))
    attr = rng.rand(E, 1).astype(np.float32)
    graph = Graph.from_edges(edges, attr, NODES).with_self_loops()
    G = 30
    gene_pca_match = rng.randint(-1, NODES, size=G).astype(np.int32)
    raw_indice = np.sort(rng.randint(0, 3 * N_PATH, size=G)).astype(np.int32)
    info_mask = (rng.rand(G, 1) > 0.3).astype(np.float32)
    ctx = make_fold_context(
        graph, gene_pca_match, raw_indice, info_mask, n_pathways=N_PATH
    )
    x = rng.randn(B, NODES).astype(np.float32)
    y = np.zeros((B, 2), np.float32)
    y[np.arange(B), rng.randint(0, 2, B)] = 1
    age = rng.rand(B).astype(np.float32) * 80
    batch = Batch(
        x=jnp.asarray(x),
        y=jnp.asarray(y),
        age=jnp.asarray(age),
        sample_mask=jnp.ones(B, bool),
    )
    return ctx, batch, edges, attr


def torch_forward(pp, cfg, batch, ctx, edges, attr):
    """Full-reference-semantics torch forward with flax params injected."""
    t = lambda a: torch.tensor(np.asarray(a))
    x = t(batch.x)  # (B, NODES)
    emb = t(pp["node_embedding"])  # (NODES, D)
    h = x[:, :, None] * emb  # (B, NODES, D)
    # 2 sage layers
    for li in range(2):
        g = pp[f"gnn_{li}"]["gconv"]
        W = t(g["lin_r"]["kernel"])
        mW = t(g["nn"]["Linear_0"]["Dense_0"]["kernel"])
        mb = t(g["nn"]["Linear_0"]["Dense_0"]["bias"])
        out = []
        for b in range(x.shape[0]):
            out.append(
                oracle.sage_oracle(
                    h[b], torch.tensor(edges.astype(np.int64)), t(attr), W, mW, mb
                )
            )
        h = torch.stack(out)
    # value attention merge
    h = h * x[:, :, None]
    # gather PCA rows with torch negative indexing
    match = t(ctx.gene_pca_match).long()
    xg = h[:, match, :] * (match >= 0).float()[None, :, None]
    # learnable PCA contraction
    P = t(pp["learnable_pca_params"]) * t(ctx.info_mask)
    prod = xg.unsqueeze(3) * P[None, :, None, :]  # (B, G, C, K)
    prod = prod.permute(0, 2, 1, 3)  # (B, C, G, K)
    Bn, C, G, Kk = prod.shape
    S = 3 * cfg.pathway_num
    idx = t(ctx.raw_indice).long()[None, None, :, None].expand(Bn, C, G, Kk)
    img = torch.zeros(Bn, C, S, Kk).scatter_reduce(2, idx, prod, reduce="sum")
    img = img.reshape(Bn, C, cfg.pathway_num, 3 * Kk)
    pca_feature = img
    # conv stack (xavier weights from flax; NHWC kernel -> NCHW)
    h2 = img
    for ci, (out_ch, k) in enumerate(
        zip(cfg.conv_channel_list, cfg.conv_kernel_list)
    ):
        kern = t(pp["conv_head"][f"Conv_{ci}"]["kernel"]).permute(3, 2, 0, 1)
        bias = t(pp["conv_head"][f"Conv_{ci}"]["bias"])
        h2 = F.conv2d(h2, kern, bias, padding=k // 2)
        h2 = F.relu(h2)
    h2 = F.max_pool2d(h2, (cfg.pathway_pool_dim, cfg.pca_pool_dim))
    h2 = torch.flatten(h2, start_dim=1)
    h2 = torch.cat([h2, t(batch.age)[:, None]], dim=-1)
    W0 = t(pp["conv_head"]["head_0"]["Dense_0"]["kernel"])
    b0 = t(pp["conv_head"]["head_0"]["Dense_0"]["bias"])
    W1 = t(pp["conv_head"]["head_1"]["Dense_0"]["kernel"])
    b1 = t(pp["conv_head"]["head_1"]["Dense_0"]["bias"])
    h2 = F.relu(h2 @ W0 + b0)
    h2 = torch.softmax(h2 @ W1 + b1, dim=-1)
    return h2, pca_feature


def test_multilevel_gnn_forward_parity(rng):
    cfg = tiny_cfg()
    ctx, batch, edges, attr = build_fixture(rng)
    model = MultilevelGNN(cfg)
    params = model.init(jax.random.PRNGKey(0), batch, ctx, False)
    pred, feat = model.apply(params, batch, ctx, False)
    assert pred.shape == (B, 2)
    np.testing.assert_allclose(np.asarray(pred.sum(-1)), np.ones(B), rtol=1e-5)

    want_pred, want_feat = torch_forward(
        params["params"], cfg, batch, ctx, edges, attr
    )
    np.testing.assert_allclose(
        np.asarray(feat), want_feat.numpy(), rtol=2e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(pred), want_pred.numpy(), rtol=2e-4, atol=1e-5
    )


def test_seeded_pca_params_and_feature_loss(rng):
    cfg = tiny_cfg()
    ctx, batch, edges, attr = build_fixture(rng)
    model = MultilevelGNN(cfg)
    params = model.init(jax.random.PRNGKey(0), batch, ctx, False)
    seed = rng.randn(ctx.num_pca_rows, K).astype(np.float32)
    params = seed_pca_params(params, jnp.asarray(seed))
    np.testing.assert_array_equal(
        np.asarray(params["params"]["learnable_pca_params"]), seed
    )
    _, feat = model.apply(params, batch, ctx, False)
    loss = get_feature_loss(
        params["params"]["learnable_pca_params"], ctx, feat, cfg
    )
    # torch-side reference of the indep loss with the preserved quirks
    t = lambda a: torch.tensor(np.asarray(a))
    P = t(seed) * t(ctx.info_mask)
    seg = t(ctx.raw_indice).long()
    S = 3 * cfg.pathway_num
    indep, count = 0.0, 0
    for i in range(K - 1):
        for j in range(i + 1, K):
            count += 1
            mul = torch.zeros(S).scatter_reduce(0, seg, P[:, i] * P[:, j], reduce="sum")
            ln = torch.sqrt(
                torch.zeros(S).scatter_reduce(0, seg, P[:, i] ** 2, reduce="sum")
                * torch.zeros(S).scatter_reduce(0, seg, P[:, j] ** 2, reduce="sum")
            )
        indep += torch.mean(torch.abs(mul / (ln + 1e-7)))
    want = indep / count
    np.testing.assert_allclose(float(loss), float(want), rtol=1e-5)

    # training-mode call needs dropout rng and must stay finite
    pred, _ = model.apply(
        params, batch, ctx, True, rngs={"dropout": jax.random.PRNGKey(1)}
    )
    assert bool(jnp.isfinite(pred).all())


def test_precise_orthogonal_and_scalar_params(rng):
    from multilevel_gnn_tpu.models.multilevel_gnn import (
        collect_scalar_params,
        init_precise_orthogonal,
    )
    from multilevel_gnn_tpu.nn.conv import GENConv
    from multilevel_gnn_tpu.core.graph import Graph

    G, K = 50, 3
    seg = np.sort(rng.randint(0, 7, G))
    mask = (rng.rand(G) > 0.3).astype(np.float32)
    p0 = rng.rand(G, K).astype(np.float32)
    p = init_precise_orthogonal(p0, seg, mask)
    np.testing.assert_array_equal(p[mask == 0], p0[mask == 0])
    for s in np.unique(seg):
        idx = np.where((seg == s) & (mask > 0))[0]
        if len(idx) >= 2:
            gram = p[idx].T @ p[idx]
            off = np.abs(gram - np.diag(np.diag(gram))).max()
            assert off < 1e-4 * max(np.abs(gram).max(), 1e-6)

    edges = rng.randint(0, 10, size=(2, 30)).astype(np.int32)
    g = Graph.from_edges(edges, None, 10)
    conv = GENConv(4, 4, aggr="softmax_sum", learn_t=True, learn_y=True,
                   norm_type="none")
    params = conv.init(
        jax.random.PRNGKey(0), jnp.ones((1, 10, 4)), g, None
    )
    scalars = collect_scalar_params(params)
    assert any(k.endswith("/t") for k in scalars)
    assert any(k.endswith("/y") for k in scalars)
