"""Full-model forward parity vs the ACTUAL reference MultilevelGNN class.

test_multilevel_gnn.py checks the flagship against a hand-written torch
oracle; this file closes the loop on VERDICT r1 item #6 / BASELINE's
"per-layer activations vs reference PyTorch/PyG" by instantiating
/root/reference/models/multilevel_gnn.py:MultilevelGNN itself (via the
pure-torch PyG shim), injecting the flax parameters, and asserting the
full forward (multilevel_gnn.py:132-291) and get_feature_loss (:329-348)
allclose at the reference's HARD-CODED production dimensions
(node_num*3 = 15405 nodes, 25015 learnable-PCA rows, 146 pathways —
multilevel_gnn.py:34,74 — these cannot be shrunk without editing the
reference, so the fixture runs at full GBM scale with a reduced edge
count and batch).
"""
import types

import numpy as np
import pytest
import torch

import pyg_shim

pyg_shim.install()

from models.multilevel_gnn import MultilevelGNN as RefMultilevelGNN  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multilevel_gnn_tpu.core.batch import Batch, make_fold_context  # noqa: E402
from multilevel_gnn_tpu.core.config import Config  # noqa: E402
from multilevel_gnn_tpu.core.graph import Graph  # noqa: E402
from multilevel_gnn_tpu.models.multilevel_gnn import (  # noqa: E402
    MultilevelGNN,
    get_feature_loss,
)

B = 2
NODES = 15405  # reference node_num=5135 (hardcoded :34) x 3 omics
G_ROWS = 25015  # reference learnable_pca_params rows (hardcoded :74)
N_PATH = 146
E_RAND = 6000


def t(a):
    return torch.tensor(np.asarray(a))


def gbm_like_cfg():
    """The GBM protocol's model settings (configs/gbm.yaml), f32 + XLA
    backend for bit-comparable CPU parity (the pallas/bf16 paths have their
    own equivalence tests)."""
    return Config(
        cancer_type="gbm",
        model="multilevel_gnn",
        gnn_name="sage",
        num_layers=2,
        hidden_channels=64,
        final_channels=32,
        final_head=4,
        node_embedding=True,
        node_embedding_dim=64,
        value_att_mask=True,
        weighted_edge=True,
        mutual_info_mask=True,
        pca_match_mask=True,
        pca_dim=2,
        pca_loss=True,
        pca_indep_loss=True,
        feature_drop=True,
        head_dim=256,
        use_age=True,
        weight_balance=True,
        pathway_num=N_PATH,
        batch_size=B,
    )


# every attribute the reference __init__/forward reads off `args`
_REF_ARG_FIELDS = (
    "pca_compare pca_prelinear learnable_pca pca_loss pca_indep_loss pca_dim "
    "pathway_pool_dim pca_pool_dim mutual_info_mask mutual_info_threshold "
    "pca_loss_coef node_select_threshold mutual_neighbors head_dim used_omics "
    "input_drop input_emb_drop node_embedding node_embedding_dim "
    "embedding_init_type freeze_node_embedding emb_val hidden_channels "
    "num_layers final_channels final_head gnn_act gnn_name gnn_mlp_norm "
    "gnn_last_norm gnn_dropout pca_init_type freeze_pca_weight edge_type "
    "dense_gnn conv_channel_list conv_kernel_list feature_drop use_age "
    "device_num weighted_edge resgnn repeat_mask repeat_cyclic repeat_norm "
    "value_att_mask merge_mode add_coef1 add_coef2 pca_match_mask "
    "reduction_method reorder_pathway pathway_num random_state "
    "freeze_mutual_select_init remain_all_tf pca_lowrank_niter "
    "pathcnn_kernel_size more_conv"
).split()


def ref_args(cfg):
    ns = types.SimpleNamespace()
    for f in _REF_ARG_FIELDS:
        setattr(ns, f, getattr(cfg, f))
    return ns


def set_lin(lin, kernel, bias=None):
    with torch.no_grad():
        lin.weight.copy_(t(kernel).T)
        if bias is not None:
            lin.bias.copy_(t(bias))


def inject_params(ref, pp, cfg):
    """Copy the flax param tree into the reference torch module."""
    with torch.no_grad():
        ref.node_embedding.data.copy_(t(pp["node_embedding"]))
        ref.learnable_pca_params.data.copy_(t(pp["learnable_pca_params"]))
        for i in range(cfg.num_layers):
            g = pp[f"gnn_{i}"]["gconv"]
            set_lin(ref.gnn_model[i].gconv.lin_r, g["lin_r"]["kernel"])
            set_lin(
                ref.gnn_model[i].gconv.nn[0],
                g["nn"]["Linear_0"]["Dense_0"]["kernel"],
                g["nn"]["Linear_0"]["Dense_0"]["bias"],
            )
        conv_idx = 0
        for m in ref.conv_model:
            if isinstance(m, torch.nn.Conv2d):
                k = t(pp["conv_head"][f"Conv_{conv_idx}"]["kernel"])
                m.weight.copy_(k.permute(3, 2, 0, 1))  # HWIO -> OIHW
                m.bias.copy_(t(pp["conv_head"][f"Conv_{conv_idx}"]["bias"]))
                conv_idx += 1
        set_lin(
            ref.head[0],
            pp["conv_head"]["head_0"]["Dense_0"]["kernel"],
            pp["conv_head"]["head_0"]["Dense_0"]["bias"],
        )
        set_lin(
            ref.head[3],
            pp["conv_head"]["head_1"]["Dense_0"]["kernel"],
            pp["conv_head"]["head_1"]["Dense_0"]["bias"],
        )


def build_fixture(rng, cfg):
    edges = rng.randint(0, NODES, size=(2, E_RAND)).astype(np.int32)
    attr = rng.rand(E_RAND, 1).astype(np.float32)
    graph = Graph.from_edges(edges, attr, NODES).with_self_loops()
    gene_pca_match = rng.randint(-1, NODES, size=G_ROWS).astype(np.int32)
    raw_indice = rng.randint(0, 3 * N_PATH, size=G_ROWS).astype(np.int32)
    info_mask = (rng.rand(G_ROWS, 1) > 0.4).astype(np.float32)
    ctx = make_fold_context(
        graph, gene_pca_match, raw_indice, info_mask, n_pathways=N_PATH
    )
    x = rng.randn(B, NODES).astype(np.float32)
    age = (rng.rand(B) * 80).astype(np.float32)
    y = np.zeros((B, 2), np.float32)
    y[np.arange(B), rng.randint(0, 2, B)] = 1
    batch = Batch(
        x=jnp.asarray(x),
        y=jnp.asarray(y),
        age=jnp.asarray(age),
        sample_mask=jnp.ones(B, bool),
    )

    model = MultilevelGNN(cfg)
    params = model.init(jax.random.PRNGKey(0), batch, ctx, False)

    # --- the actual reference model, same params
    ref = RefMultilevelGNN(ref_args(cfg))
    ref.eval()
    inject_params(ref, params["params"], cfg)
    ref.set_info_mask(t(info_mask))
    ref.set_pathway_indexs(t(raw_indice.astype(np.int64)))

    # PyG-style batched graph: B copies with node offsets (the reference
    # consumes the block-diagonal Batch the PyG DataLoader would build)
    eb = np.concatenate(
        [edges.astype(np.int64) + b * NODES for b in range(B)], axis=1
    )
    ab = np.tile(attr, (B, 1))
    input_batch = types.SimpleNamespace(
        x=t(x.reshape(-1)),
        edge_index=t(eb),
        edge_attr=t(ab),
        gene_pca_match=t(np.tile(gene_pca_match.astype(np.int64), (B, 1))),
        raw_indice=t(np.tile(raw_indice.astype(np.int64), (B, 1))),
        age=t(age),
    )
    return model, params, ctx, batch, ref, input_batch


@pytest.mark.slow
def test_full_model_vs_reference(rng):
    cfg = gbm_like_cfg()
    model, params, ctx, batch, ref, input_batch = build_fixture(rng, cfg)
    pred, feat = jax.jit(
        lambda p, b: model.apply(p, b, ctx, False)
    )(params, batch)

    with torch.no_grad():
        want_pred, want_feat = ref(input_batch)

    np.testing.assert_allclose(
        np.asarray(feat), want_feat.detach().numpy(), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(pred), want_pred.detach().numpy(), rtol=2e-4, atol=2e-5
    )

    # --- auxiliary losses (reference get_feature_loss :329-348)
    ours = get_feature_loss(
        params["params"]["learnable_pca_params"], ctx, feat, cfg
    )
    want = ref.get_feature_loss(want_feat.detach())
    np.testing.assert_allclose(
        float(ours), float(want), rtol=2e-4, atol=1e-6
    )


@pytest.mark.slow
def test_full_train_loss_and_grads_vs_reference(rng):
    """End-to-end TRAINING gradient parity vs the actual reference: the
    weighted BCE + feature loss of reference train.py:48-62 (weight_balance
    -> BCELoss(weight=w), train.py:118-121) back-propagated through the
    whole reference model, compared leaf-by-leaf against jax.grad of our
    loss.  Dropout off (eval-mode graph) so both sides are deterministic."""
    cfg = gbm_like_cfg()
    model, params, ctx, batch, ref, input_batch = build_fixture(rng, cfg)
    class_weight = np.asarray([1.0, 3.5], np.float32)

    from multilevel_gnn_tpu.train.step import classification_loss

    def loss_fn(p):
        pred, feat = model.apply(p, batch, ctx, False)
        loss = classification_loss(
            pred, batch.y, jnp.asarray(class_weight), batch.sample_mask, cfg
        )
        return loss + get_feature_loss(
            p["params"]["learnable_pca_params"], ctx, feat, cfg
        )

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    gp = grads["params"]

    # reference loss: criterion = BCELoss(weight=class_weight) (train.py:118)
    criterion = torch.nn.BCELoss(weight=t(class_weight))
    pred, feat = ref(input_batch)
    ref_loss = criterion(pred.to(torch.float32), t(np.asarray(batch.y)))
    ref_loss = ref_loss + ref.get_feature_loss(feat)
    ref.zero_grad()
    ref_loss.backward()

    np.testing.assert_allclose(
        float(loss), float(ref_loss.detach()), rtol=2e-4, atol=1e-6
    )

    def g(torch_param):
        return torch_param.grad.detach().numpy()

    checks = [
        (gp["node_embedding"], g(ref.node_embedding)),
        (gp["learnable_pca_params"], g(ref.learnable_pca_params)),
    ]
    for i in range(cfg.num_layers):
        fg = gp[f"gnn_{i}"]["gconv"]
        tg_ = ref.gnn_model[i].gconv
        checks.append((fg["lin_r"]["kernel"], g(tg_.lin_r.weight).T))
        checks.append(
            (fg["nn"]["Linear_0"]["Dense_0"]["kernel"], g(tg_.nn[0].weight).T)
        )
        checks.append(
            (fg["nn"]["Linear_0"]["Dense_0"]["bias"], g(tg_.nn[0].bias))
        )
    conv_idx = 0
    for m in ref.conv_model:
        if isinstance(m, torch.nn.Conv2d):
            fk = gp["conv_head"][f"Conv_{conv_idx}"]
            checks.append(
                (fk["kernel"], np.transpose(g(m.weight), (2, 3, 1, 0)))
            )
            checks.append((fk["bias"], g(m.bias)))
            conv_idx += 1
    checks.append(
        (gp["conv_head"]["head_0"]["Dense_0"]["kernel"], g(ref.head[0].weight).T)
    )
    checks.append(
        (gp["conv_head"]["head_1"]["Dense_0"]["kernel"], g(ref.head[3].weight).T)
    )

    for ours_g, want_g in checks:
        scale = max(np.abs(want_g).max(), 1e-8)
        np.testing.assert_allclose(
            np.asarray(ours_g), want_g, rtol=2e-3, atol=2e-5 * scale
        )


def test_pathcnn_vs_reference(rng):
    """PathCNN (reference models/pathcnn.py:13-134) forward parity at the
    reference's hard-coded dims (24542 learnable-PCA rows, 146 pathways)."""
    from models.pathcnn import PathCNN as RefPathCNN

    from multilevel_gnn_tpu.models.pathcnn import PathCNN

    G_PC = 24542  # reference pathcnn.py:36 hardcoded row count
    cfg = Config(
        model="pathcnn",
        learnable_pca=True,
        mutual_info_mask=True,
        pca_dim=2,
        pathcnn_kernel_size=3,
        head_dim=128,
        use_age=True,
        pathway_num=N_PATH,
        batch_size=B,
    )
    raw_data = rng.randn(B, G_PC).astype(np.float32)
    raw_indice = rng.randint(0, 3 * N_PATH, size=G_PC).astype(np.int32)
    info_mask = (rng.rand(G_PC, 1) > 0.4).astype(np.float32)
    age = (rng.rand(B) * 80).astype(np.float32)
    dummy = Graph.from_edges(
        np.zeros((2, 1), np.int32), np.ones((1, 1), np.float32), 4
    )
    ctx = make_fold_context(
        dummy,
        np.zeros(G_PC, np.int32),
        raw_indice,
        info_mask,
        n_pathways=N_PATH,
    )
    batch = Batch(
        x=jnp.zeros((B, 4), jnp.float32),
        y=jnp.zeros((B, 2), jnp.float32),
        age=jnp.asarray(age),
        sample_mask=jnp.ones(B, bool),
        raw_data=jnp.asarray(raw_data),
    )
    model = PathCNN(cfg)
    params = model.init(jax.random.PRNGKey(0), batch, ctx, False)
    pred, feat = model.apply(params, batch, ctx, False)

    ref = RefPathCNN(ref_args(cfg))
    ref.eval()
    pp = params["params"]
    with torch.no_grad():
        ref.learnable_pca_params.data.copy_(t(pp["learnable_pca_params"]))
        for name, m in (("conv1", ref.conv1), ("conv2", ref.conv2)):
            m.weight.copy_(t(pp[name]["kernel"]).permute(3, 2, 0, 1))
            m.bias.copy_(t(pp[name]["bias"]))
    set_lin(
        ref.head[0],
        pp["head_0"]["Dense_0"]["kernel"],
        pp["head_0"]["Dense_0"]["bias"],
    )
    set_lin(
        ref.head[3],
        pp["head_1"]["Dense_0"]["kernel"],
        pp["head_1"]["Dense_0"]["bias"],
    )
    ref.set_info_mask(t(info_mask))

    input_batch = types.SimpleNamespace(
        raw_data=t(raw_data),
        raw_indice=t(np.tile(raw_indice.astype(np.int64), (B, 1))),
        age=t(age),
    )
    with torch.no_grad():
        want_pred, want_feat = ref(input_batch)
    np.testing.assert_allclose(
        np.asarray(feat), want_feat.detach().numpy(), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(pred), want_pred.detach().numpy(), rtol=2e-4, atol=2e-5
    )


@pytest.mark.parametrize(
    "block,no_inter_norm",
    [("res+", False), ("res+", True), ("plain", False), ("plain", True)],
)
def test_deepergcn_vs_reference(rng, block, no_inter_norm):
    """DeeperGCN (reference models/deepergcn.py:17-323) forward parity:
    linear encoders + node-embedding lookup (incl. the pathway-rows->
    embedding-row-0 quirk), one-hot pathway-edge Embedding, per-conv
    edge re-encoding (conv_encode_edge), vnode feature injection, res+ /
    plain GENConv stacks with inter layer-norms (and the no_inter_norm
    gate, reference :236-246,270-278), maxpool-4 readout with
    pre-concat age, and the softmax head.  no_inter_drop is
    training-mode-only (dropout is off in eval) — covered by
    test_deepergcn_no_inter_drop."""
    from models.deepergcn import DeeperGCN as RefDeeperGCN

    from multilevel_gnn_tpu.data.synthetic import make_synthetic_cohort
    from multilevel_gnn_tpu.models.deepergcn import DeeperGCN
    from test_data_pipeline import gbm_like_cfg as pipeline_cfg

    cfg = pipeline_cfg(
        model="deepergcn",
        conv="gen",
        gcn_aggr="softmax",
        block=block,
        no_inter_norm=no_inter_norm,
        num_layers=3,
        hidden_channels=16,
        mlp_layers=2,
        norm="layer",
        node_embedding=True,
        node_embedding_dim=4,
        use_edge_attr=True,
        conv_encode_edge=True,
        global_edge="onehot",
        pathway_readout="maxpool",
        graph_pooling="mean",
        num_layer_head=2,
        pre_concat_age=True,
        pre_readout_drop=True,
        use_age=True,
        dropout=0.25,
        learn_t=True,
    )
    cohort = make_synthetic_cohort(cfg, seed=3, n_patients=24, n_pathways=8)
    cfg = cfg.replace(
        pathway_num=cohort.n_pathways,
        node_num=cohort.node_size + cohort.n_pathways,
    )
    fold = cohort.deepergcn_fold(np.arange(16), 0)
    cfg = cfg.replace(pathway_edge_num=max(cohort.pathway_edge_num, 1))
    Xg = cohort.gene_level_features()
    Bn = 3
    batch = Batch(
        x=jnp.asarray(Xg[:Bn]),
        y=jnp.asarray(cohort.Y[:Bn]),
        age=jnp.asarray(cohort.ages[:Bn]),
        sample_mask=jnp.ones(Bn, bool),
        raw_data=jnp.asarray(fold.pathway_node_attr[:Bn].astype(np.float32)),
    )
    model = DeeperGCN(cfg)
    params = model.init(jax.random.PRNGKey(0), batch, fold.ctx, False)
    pred, _ = model.apply(params, batch, fold.ctx, False)

    # --- reference model
    args = ref_args(cfg)
    for f in (
        "num_tasks", "block", "conv", "gcn_aggr", "t", "learn_t", "p", "conv_encode_edge",
        "learn_p", "msg_norm", "learn_msg_scale", "norm", "mlp_layers",
        "graph_pooling", "pca_only", "gnn_encoder", "node_num",
        "use_column", "global_edge", "pathway_edge_num", "use_edge_attr",
        "pathway_global_node", "num_layer_head", "pathway_readout",
        "head_dropout", "init_emb", "mul_attr", "dropout",
        "pre_readout_drop", "pre_concat_age",
    ):
        setattr(args, f, getattr(cfg, f))
    args.no_inter_drop = False
    args.no_inter_norm = no_inter_norm
    args.head_init = False
    # params are mirrored from flax below, so the torch-side re-init is
    # irrelevant to parity — keep it off to avoid extra RNG draws
    args.all_init = False
    ref = RefDeeperGCN(args)
    ref.eval()

    pp = params["params"]
    with torch.no_grad():
        ref.node_embedding_encoder.weight.copy_(
            t(pp["node_embedding_encoder"]["embedding"])
        )
        ref.edge_encoder.weight.copy_(t(pp["edge_encoder"]["embedding"]))
    set_lin(
        ref.node_features_encoder,
        pp["node_features_encoder"]["Dense_0"]["kernel"],
        pp["node_features_encoder"]["Dense_0"]["bias"],
    )
    set_lin(
        ref.pathway_features_encoder,
        pp["pathway_features_encoder"]["Dense_0"]["kernel"],
        pp["pathway_features_encoder"]["Dense_0"]["bias"],
    )
    for i in range(cfg.num_layers):
        fg = pp[f"gcn_{i}"]
        set_lin(
            ref.gcns[i].edge_encoder,
            fg["edge_encoder"]["Dense_0"]["kernel"],
            fg["edge_encoder"]["Dense_0"]["bias"],
        )
        lins = [
            m for m in ref.gcns[i].feature_encoder if isinstance(m, torch.nn.Linear)
        ]
        for j, lin in enumerate(lins):
            set_lin(
                lin,
                fg["feature_encoder"][f"Linear_{j}"]["Dense_0"]["kernel"],
                fg["feature_encoder"][f"Linear_{j}"]["Dense_0"]["bias"],
            )
    set_lin(
        ref.readout_func[0],
        pp["readout"]["Dense_0"]["kernel"],
        pp["readout"]["Dense_0"]["bias"],
    )
    head_mods = [
        m for m in ref.graph_pred_linear if isinstance(m, torch.nn.Linear)
    ]
    set_lin(
        head_mods[0],
        pp["head_0"]["Dense_0"]["kernel"],
        pp["head_0"]["Dense_0"]["bias"],
    )
    set_lin(
        head_mods[-1],
        pp["head_out"]["Dense_0"]["kernel"],
        pp["head_out"]["Dense_0"]["bias"],
    )

    # --- PyG-batched reference inputs
    g = fold.ctx.graph
    emask = np.asarray(g.edge_mask)
    snd = np.asarray(g.senders)[emask].astype(np.int64)
    rcv = np.asarray(g.receivers)[emask].astype(np.int64)
    eids = np.asarray(g.edge_attr)[emask][:, -1].astype(np.int64)
    N = Xg.shape[1]
    P = cfg.pathway_num
    n_genes = N - P
    ids_col = np.concatenate(
        [np.arange(n_genes), np.zeros(P)]
    ).astype(np.float32)
    x_rows = np.concatenate(
        [
            np.concatenate([Xg[b], ids_col[:, None]], axis=-1)
            for b in range(Bn)
        ]
    )
    eb = np.concatenate(
        [np.stack([snd, rcv]) + b * N for b in range(Bn)], axis=1
    )
    input_batch = types.SimpleNamespace(
        x=t(x_rows),
        edge_index=t(eb),
        edge_attr=t(np.tile(eids, Bn)),
        batch=t(np.repeat(np.arange(Bn), N)),
        age=t(np.asarray(cohort.ages[:Bn], np.float32)),
        pathway_node_attr=t(
            fold.pathway_node_attr[:Bn].astype(np.float32).reshape(-1, 6)
        ),
        node_size=t(np.full(Bn, N, np.int64)),
    )
    with torch.no_grad():
        want = ref(input_batch)
    np.testing.assert_allclose(
        np.asarray(pred), want.detach().numpy(), rtol=5e-4, atol=5e-5
    )


@pytest.mark.slow
def test_autoencoder_vs_reference(rng):
    """AutoEncoder (reference models/autoencoder.py:23-145, flatten decoder)
    forward parity at the reference's hardcoded dims: encoder without the
    value-attention merge (commented out in the reference, :96-102), the
    '>0' gather-mask quirk (:107), learnable-PCA contraction, and the
    4096-style flatten MLP decoder."""
    from models.autoencoder import AutoEncoder as RefAutoEncoder

    from multilevel_gnn_tpu.models.autoencoder import AutoEncoder

    cfg = gbm_like_cfg().replace(
        model="autoencoder",
        decoder_type="flatten",
        decoder_dim=256,
        node_num=5135,
    )
    E_AE = 4000
    edges = rng.randint(0, NODES, size=(2, E_AE)).astype(np.int32)
    attr = rng.rand(E_AE, 1).astype(np.float32)
    graph = Graph.from_edges(edges, attr, NODES).with_self_loops()
    gene_pca_match = rng.randint(-1, NODES, size=G_ROWS).astype(np.int32)
    raw_indice = rng.randint(0, 3 * N_PATH, size=G_ROWS).astype(np.int32)
    info_mask = (rng.rand(G_ROWS, 1) > 0.4).astype(np.float32)
    ctx = make_fold_context(
        graph, gene_pca_match, raw_indice, info_mask, n_pathways=N_PATH
    )
    x = rng.randn(B, NODES).astype(np.float32)
    batch = Batch(
        x=jnp.asarray(x),
        y=jnp.zeros((B, 2), jnp.float32),
        age=jnp.zeros(B, jnp.float32),
        sample_mask=jnp.ones(B, bool),
    )
    model = AutoEncoder(cfg)
    params = model.init(jax.random.PRNGKey(0), batch, ctx, False)
    recon, latent = jax.jit(
        lambda p, b: model.apply(p, b, ctx, False)
    )(params, batch)

    args = ref_args(cfg)
    args.decoder_dim = cfg.decoder_dim
    args.decoder_type = cfg.decoder_type
    ref = RefAutoEncoder(args)
    ref.eval()
    pp = params["params"]
    with torch.no_grad():
        ref.node_embedding.data.copy_(t(pp["node_embedding"]))
        ref.learnable_pca_params.data.copy_(t(pp["learnable_pca_params"]))
    for i in range(cfg.num_layers):
        g = pp[f"gnn_{i}"]["gconv"]
        set_lin(ref.gnn_model[i].gconv.lin_r, g["lin_r"]["kernel"])
        set_lin(
            ref.gnn_model[i].gconv.nn[0],
            g["nn"]["Linear_0"]["Dense_0"]["kernel"],
            g["nn"]["Linear_0"]["Dense_0"]["bias"],
        )
    for di, name in ((0, "dec_0"), (2, "dec_1"), (4, "dec_2")):
        set_lin(
            ref.decoder[di],
            pp[name]["Dense_0"]["kernel"],
            pp[name]["Dense_0"]["bias"],
        )
    ref.set_info_mask(t(info_mask))

    eb = np.concatenate(
        [edges.astype(np.int64) + b * NODES for b in range(B)], axis=1
    )
    input_batch = types.SimpleNamespace(
        x=t(x.reshape(-1)),
        edge_index=t(eb),
        edge_attr=t(np.tile(attr, (B, 1))),
        gene_pca_match=t(np.tile(gene_pca_match.astype(np.int64), (B, 1))),
        raw_indice=t(np.tile(raw_indice.astype(np.int64), (B, 1))),
    )
    with torch.no_grad():
        want_recon, want_h, _ = ref(input_batch)
    np.testing.assert_allclose(
        np.asarray(latent), want_h.detach().numpy(), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(recon), want_recon.detach().numpy(), rtol=5e-4, atol=5e-5
    )


@pytest.mark.slow
def test_vae_vs_reference(rng):
    """VAE (reference models/vae.py:39-232) parity: encoder (GNN +
    learnable-PCA + mu/log-sigma heads + aux std/corr losses), the foreach
    per-slot decoder on an injected latent, the closed-form KLD, and the
    actual reference RBF/IMQ MMD kernels."""
    from models.vae import VAE as RefVAE

    from multilevel_gnn_tpu.models.vae import VAE, _kernel_matrix, vae_loss

    raw_indice = np.sort(
        rng.randint(0, 3 * N_PATH, size=G_ROWS).astype(np.int32)
    )
    slot_sizes = np.bincount(raw_indice, minlength=3 * N_PATH)
    cfg = gbm_like_cfg().replace(
        model="mmd_vae",
        decoder_type="foreach",
        decoder_dim=32,
        node_num=5135,
        slot_sizes=tuple(int(v) for v in slot_sizes),
        mmd_kernel_type="rbf",
        z_var=2.0,
    )
    Bv = 4  # B=2 makes every pairwise corr exactly +-1 (eps-dominated)
    E_VAE = 4000
    edges = rng.randint(0, NODES, size=(2, E_VAE)).astype(np.int32)
    attr = rng.rand(E_VAE, 1).astype(np.float32)
    graph = Graph.from_edges(edges, attr, NODES).with_self_loops()
    gene_pca_match = rng.randint(-1, NODES, size=G_ROWS).astype(np.int32)
    info_mask = (rng.rand(G_ROWS, 1) > 0.4).astype(np.float32)
    ctx = make_fold_context(
        graph, gene_pca_match, raw_indice, info_mask, n_pathways=N_PATH
    )
    x = rng.randn(Bv, NODES).astype(np.float32)
    batch = Batch(
        x=jnp.asarray(x),
        y=jnp.zeros((Bv, 2), jnp.float32),
        age=jnp.zeros(Bv, jnp.float32),
        sample_mask=jnp.ones(Bv, bool),
    )
    model = VAE(cfg)
    params = model.init(
        jax.random.PRNGKey(0), batch, ctx, False,
        rng_key=jax.random.PRNGKey(5),
    )
    out = model.apply(
        params, batch, ctx, False, rng_key=jax.random.PRNGKey(5)
    )

    args = ref_args(cfg)
    args.decoder_dim = cfg.decoder_dim
    args.decoder_type = cfg.decoder_type
    args.reorder_type = "pca"
    args.mmd_kernel_type = cfg.mmd_kernel_type
    args.z_var = cfg.z_var
    ref = RefVAE(args, pathway_indexs=t(raw_indice.astype(np.int64)))
    ref.eval()
    pp = params["params"]
    with torch.no_grad():
        ref.node_embedding.data.copy_(t(pp["node_embedding"]))
        ref.learnable_pca_params.data.copy_(t(pp["learnable_pca_params"]))
    for i in range(cfg.num_layers):
        g = pp[f"gnn_{i}"]["gconv"]
        set_lin(ref.gnn_model[i].gconv.lin_r, g["lin_r"]["kernel"])
        set_lin(
            ref.gnn_model[i].gconv.nn[0],
            g["nn"]["Linear_0"]["Dense_0"]["kernel"],
            g["nn"]["Linear_0"]["Dense_0"]["bias"],
        )
    set_lin(
        ref.enc_mu,
        pp["enc_mu"]["Dense_0"]["kernel"],
        pp["enc_mu"]["Dense_0"]["bias"],
    )
    set_lin(
        ref.enc_log_sigma,
        pp["enc_log_sigma"]["Dense_0"]["kernel"],
        pp["enc_log_sigma"]["Dense_0"]["bias"],
    )
    for s in range(3 * N_PATH):
        if slot_sizes[s] == 0:
            continue
        set_lin(
            ref.decoder[s][0],
            pp[f"dec_slot{s}_0"]["Dense_0"]["kernel"],
            pp[f"dec_slot{s}_0"]["Dense_0"]["bias"],
        )
        set_lin(
            ref.decoder[s][2],
            pp[f"dec_slot{s}_1"]["Dense_0"]["kernel"],
            pp[f"dec_slot{s}_1"]["Dense_0"]["bias"],
        )
    ref.set_info_mask(t(info_mask))

    eb = np.concatenate(
        [edges.astype(np.int64) + b * NODES for b in range(Bv)], axis=1
    )
    input_batch = types.SimpleNamespace(
        x=t(x.reshape(-1)),
        edge_index=t(eb),
        edge_attr=t(np.tile(attr, (Bv, 1))),
        gene_pca_match=t(np.tile(gene_pca_match.astype(np.int64), (Bv, 1))),
        raw_indice=t(np.tile(raw_indice.astype(np.int64), (Bv, 1))),
    )
    with torch.no_grad():
        q_z, embedding, (l_std, _, l_corr), _gene = ref.encoder(input_batch)
    H = int(np.asarray(out["mu"]).shape[-1])
    want_mu = embedding[..., :H].detach().numpy()
    want_sigma = embedding[..., H:].detach().numpy()
    np.testing.assert_allclose(
        np.asarray(out["mu"]), want_mu, rtol=5e-4, atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["sigma"]), want_sigma, rtol=5e-4, atol=5e-5
    )
    np.testing.assert_allclose(
        float(out["aux_losses"]["std"]), float(l_std), rtol=2e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        float(out["aux_losses"]["corr"]), float(l_corr), rtol=1e-3, atol=1e-5
    )

    # decoder on OUR z (reference rsamples internally, so inject)
    with torch.no_grad():
        want_recon = ref.foreach_decoder(t(np.asarray(out["z"])))
    np.testing.assert_allclose(
        np.asarray(out["pred_x"]), want_recon.detach().numpy(),
        rtol=5e-4, atol=5e-5,
    )

    # closed-form KLD vs torch.distributions (deterministic part of
    # vae_loss, reference :350-353)
    want_kld = float(
        torch.distributions.kl_divergence(
            q_z, torch.distributions.Normal(0.0, 1.0)
        ).sum(-1).mean()
    )
    mu_j, sig_j = out["mu"], out["sigma"]
    ours_kld = float(
        ((sig_j**2 + mu_j**2) / 2.0 - 0.5 - jnp.log(sig_j)).sum(-1).mean()
    )
    np.testing.assert_allclose(ours_kld, want_kld, rtol=1e-4, atol=1e-6)

    # MMD kernels vs the actual reference functions (vae.py:376-433)
    za = rng.randn(8, 16).astype(np.float32)
    zb = rng.randn(8, 16).astype(np.float32)
    x1 = t(za)[:, None, :].expand(8, 8, 16)
    x2 = t(zb)[None, :, :].expand(8, 8, 16)
    want_rbf = ref.compute_rbf(x1, x2).numpy()
    ours_rbf = _kernel_matrix(jnp.asarray(za), jnp.asarray(zb), cfg)
    np.testing.assert_allclose(np.asarray(ours_rbf), want_rbf, rtol=1e-5)
    icfg = cfg.replace(mmd_kernel_type="imq")
    ref.args.mmd_kernel_type = "imq"
    want_imq = float(ref.compute_inv_mult_quad(x1, x2))
    # reference excludes the diagonal of the SAME-argument matrix
    ours_imq = float(_kernel_matrix(jnp.asarray(za), jnp.asarray(zb), icfg))
    np.testing.assert_allclose(ours_imq, want_imq, rtol=1e-5)


def test_vector_quantizer_vs_reference(rng):
    """VectorQuantizer (reference models/vq_vae.py:36-83) value AND
    gradient parity: codebook injected, forward quantization + vq_loss,
    straight-through gradient to the latents, codebook gradient from the
    embedding loss."""
    from models.vq_vae import VectorQuantizer as RefVQ

    from multilevel_gnn_tpu.models.vq_vae import VectorQuantizer

    K, D = 11, 6
    latents = rng.randn(4, 9, D).astype(np.float32)
    vq = VectorQuantizer(K, D, beta=0.25)
    params = vq.init(jax.random.PRNGKey(0), jnp.asarray(latents))

    ref = RefVQ(K, D, beta=0.25)
    with torch.no_grad():
        ref.embedding.weight.copy_(t(params["params"]["embedding"]))

    def f(p, lat):
        q, l = vq.apply(p, lat)
        return (q**2).sum() + 3.0 * l, (q, l)

    (obj, (q, l)), grads = jax.value_and_grad(f, argnums=(0, 1), has_aux=True)(
        params, jnp.asarray(latents)
    )

    lat_t = t(latents).requires_grad_(True)
    want_q, want_l = ref(lat_t)
    want_obj = (want_q**2).sum() + 3.0 * want_l
    want_obj.backward()

    np.testing.assert_allclose(
        np.asarray(q), want_q.detach().numpy(), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(float(l), float(want_l), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(grads[1]), lat_t.grad.numpy(), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(grads[0]["params"]["embedding"]),
        ref.embedding.weight.grad.numpy(),
        rtol=1e-4, atol=1e-6,
    )


@pytest.mark.slow
def test_training_trajectory_vs_reference(rng):
    """Multi-step TRAINING TRAJECTORY parity vs the actual reference loop
    (train.py:38-68 + run():111-114): 5 Adam steps with grad clipping
    (clip_grad_norm_ max_norm=20), coupled-L2 weight decay
    (optim.Adam(weight_decay=wd)), and a StepLR decay boundary
    (StepLR(step_size=2, gamma=0.5) stepped per epoch, 1 step/epoch here).
    Losses must match at every step and the final updated parameters must
    still produce allclose predictions — this pins optimizer semantics,
    bias correction, the lr schedule, and clip ordering, not just one
    gradient."""
    import optax

    from multilevel_gnn_tpu.train.step import (
        classification_loss,
        make_optimizer,
    )

    cfg = gbm_like_cfg().replace(
        lr=1e-3, step=2, gamma=0.5, clip_grad=True, wd=1e-3
    )
    model, params, ctx, batch, ref, input_batch = build_fixture(rng, cfg)
    class_weight = np.asarray([1.0, 3.5], np.float32)

    def loss_fn(p):
        pred, feat = model.apply(p, batch, ctx, False)
        loss = classification_loss(
            pred, batch.y, jnp.asarray(class_weight), batch.sample_mask, cfg
        )
        return loss + get_feature_loss(
            p["params"]["learnable_pca_params"], ctx, feat, cfg
        )

    tx = make_optimizer(cfg, steps_per_epoch=1)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(p, s):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    criterion = torch.nn.BCELoss(weight=t(class_weight))
    optimizer = torch.optim.Adam(
        ref.parameters(), lr=cfg.lr, betas=(cfg.beta1, cfg.beta2),
        weight_decay=cfg.wd,
    )
    scheduler = torch.optim.lr_scheduler.StepLR(
        optimizer, step_size=cfg.step, gamma=cfg.gamma
    )

    for i in range(5):
        params, opt_state, loss = train_step(params, opt_state)

        pred, feat = ref(input_batch)
        ref_loss = criterion(pred.to(torch.float32), t(np.asarray(batch.y)))
        ref_loss = ref_loss + ref.get_feature_loss(feat)
        optimizer.zero_grad()
        ref_loss.backward()
        torch.nn.utils.clip_grad_norm_(
            parameters=ref.parameters(), max_norm=20, norm_type=2
        )
        optimizer.step()
        scheduler.step()  # per-epoch in the reference; 1 step/epoch here

        np.testing.assert_allclose(
            float(loss), float(ref_loss.detach()), rtol=5e-4, atol=1e-6,
            err_msg=f"loss diverged at step {i}",
        )

    pred, _ = jax.jit(lambda p, b: model.apply(p, b, ctx, False))(
        params, batch
    )
    with torch.no_grad():
        want_pred, _ = ref(input_batch)
    np.testing.assert_allclose(
        np.asarray(pred), want_pred.numpy(), rtol=2e-3, atol=2e-4
    )


@pytest.mark.slow
@pytest.mark.parametrize(
    "variant",
    [
        # resgnn needs final == hidden channels (the reference's residual
        # add at :191-192 broadcasts only then; ours has the same shape
        # constraint)
        dict(resgnn=True, final_channels=64),
        dict(repeat_mask=True, repeat_cyclic=1, repeat_norm=True),
        dict(merge_mode="add", add_coef1=0.7, add_coef2=0.3),
        dict(dense_gnn=True),
    ],
    ids=["resgnn", "repeat_mask_norm", "merge_add", "dense_gnn"],
)
def test_variant_modes_vs_reference(rng, variant):
    """Non-default flagship modes vs the actual reference forward
    (multilevel_gnn.py:184-211): residual stack, cyclic mask re-apply with
    L2 re-norm, additive value-attention merge, dense feature concat."""
    cfg = gbm_like_cfg().replace(**variant)
    model, params, ctx, batch, ref, input_batch = build_fixture(rng, cfg)
    pred, feat = jax.jit(
        lambda p, b: model.apply(p, b, ctx, False)
    )(params, batch)
    with torch.no_grad():
        want_pred, want_feat = ref(input_batch)
    np.testing.assert_allclose(
        np.asarray(feat), want_feat.detach().numpy(), rtol=5e-4, atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(pred), want_pred.detach().numpy(), rtol=5e-4, atol=5e-5
    )


@pytest.mark.slow
def test_merge_mode_semantics(rng):
    """edge_type='merge' (the MultilevelGNNSeq edge-list mode, reference
    :170-182).  The reference's own list branch is UNRUNNABLE: its plain
    `layer(x, edge_index)` loop routes through GraphConv.forward
    (torch_vertex.py:362-363), which always forwards edge_attr=None into
    convs that either call edge_attr.dim() (SAGEConv :276) or don't
    accept the kwarg (SemiGCNConv :323) — every conv raises into the bare
    `except: pdb.set_trace()`.  We implement the evident intent
    (documented in docs/PARITY.md) and pin its key semantics here:

      1. weight sharing — ONE stack serves both graphs (no _g2 leaves);
      2. unweighted aggregation — output invariant to edge_attr values;
      3. doubled trunk width — the pathway image has 2*final channels;
      4. both graphs contribute — muting graph2 changes the output.
    """
    import dataclasses as dc

    cfg = gbm_like_cfg().replace(edge_type="merge")
    edges = rng.randint(0, NODES, size=(2, E_RAND)).astype(np.int32)
    attr = rng.rand(E_RAND, 1).astype(np.float32)
    graph = Graph.from_edges(edges, attr, NODES).with_self_loops()
    edges2 = rng.randint(0, NODES, size=(2, 4000)).astype(np.int32)
    attr2 = rng.rand(4000, 1).astype(np.float32)
    g2 = Graph.from_edges(edges2, attr2, NODES).with_self_loops()
    gene_pca_match = rng.randint(-1, NODES, size=G_ROWS).astype(np.int32)
    raw_indice = rng.randint(0, 3 * N_PATH, size=G_ROWS).astype(np.int32)
    ctx = make_fold_context(
        graph, gene_pca_match, raw_indice, n_pathways=N_PATH
    )
    ctx = dc.replace(ctx, graph2=g2)
    x = rng.randn(B, NODES).astype(np.float32)
    batch = Batch(
        x=jnp.asarray(x),
        y=jnp.zeros((B, 2), jnp.float32),
        age=jnp.zeros(B, jnp.float32),
        sample_mask=jnp.ones(B, bool),
    )
    model = MultilevelGNN(cfg)
    params = model.init(jax.random.PRNGKey(0), batch, ctx, False)

    # 1. shared weights: exactly num_layers gnn_* leaves, no suffix copies
    gnn_keys = [k for k in params["params"] if k.startswith("gnn_")]
    assert sorted(gnn_keys) == [f"gnn_{i}" for i in range(cfg.num_layers)]

    fwd = jax.jit(lambda p, b, c: model.apply(p, b, c, False))
    pred, feat = fwd(params, batch, ctx)
    assert np.isfinite(np.asarray(pred)).all()

    # 3. trunk width doubles: image is (B, 2*final, P, 3*pca_dim)
    assert feat.shape[1] == 2 * cfg.final_channels

    # 2. unweighted: scaling every edge weight by 10 changes nothing
    ctx_w = dc.replace(
        ctx,
        graph=dc.replace(graph, edge_attr=graph.edge_attr * 10.0),
        graph2=dc.replace(g2, edge_attr=g2.edge_attr * 10.0),
    )
    pred_w, feat_w = fwd(params, batch, ctx_w)
    np.testing.assert_allclose(
        np.asarray(feat_w), np.asarray(feat), rtol=0, atol=0
    )

    # 4. graph2 contributes: replacing it with a self-loop-only graph
    # changes the output
    g2_empty = Graph.from_edges(
        np.zeros((2, 0), np.int32), None, NODES
    ).with_self_loops()
    # pad to the same edge count so shapes stay static-compatible
    g2_empty = g2_empty.pad_edges_to(g2.num_padded_edges)
    pred_e, feat_e = fwd(params, batch, dc.replace(ctx, graph2=g2_empty))
    assert not np.allclose(np.asarray(feat_e), np.asarray(feat))
