"""DeeperGCN — GENConv residual stack over the gene+pathway-node graph.

Re-implements reference models/deepergcn.py:17-358 TPU-first:

  * node encoder: Linear(3 [+node-embedding]) -> hidden  (ref :86-89,197-210)
  * edge encoder: Linear(attr) or one-hot pathway-edge Embedding (:90,102-104)
  * pathway-global-node feature injection (:217-223) — the reference's
    batch-irregular Python cumsum loop becomes a static slice write because
    pathway nodes occupy the trailing node slots of our dense layout
  * res+ / res / plain GENConv blocks with inter-norms (:232-281)
  * pathway readout: pool | 'MSA' transformer | maxpool-4 + MLP (:283-317)
  * age concat + softmax head (:318-323)

Reference quirk preserved: pathway-node rows of x are zero, so their
node-embedding lookup index is 0 — every pathway node shares embedding row 0
(predefine_data writes node ids only for gene rows, multiloader.py:968-969).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from multilevel_gnn_tpu.core.config import Config
from multilevel_gnn_tpu.nn.basic import (
    EmbedTable,
    Linear,
    Norm,
    act,
    onehot_embed,
    xavier_uniform,
)
from multilevel_gnn_tpu.nn.conv import GENConv


class TransformerEncoderLayer(nn.Module):
    """torch.nn.TransformerEncoderLayer (post-norm, relu, ffn 2048)."""

    d_model: int
    nhead: int = 8
    dim_feedforward: int = 2048
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, training: bool = False):
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead,
            qkv_features=self.d_model,
            kernel_init=xavier_uniform,
            deterministic=not training,
            dropout_rate=self.dropout,
        )(x, x)
        x = nn.LayerNorm(epsilon=1e-5)(
            x + nn.Dropout(self.dropout, deterministic=not training)(attn)
        )
        ff = Linear(self.dim_feedforward, kernel_init=xavier_uniform)(x)
        ff = jax.nn.relu(ff)
        ff = nn.Dropout(self.dropout, deterministic=not training)(ff)
        ff = Linear(self.d_model, kernel_init=xavier_uniform)(ff)
        x = nn.LayerNorm(epsilon=1e-5)(
            x + nn.Dropout(self.dropout, deterministic=not training)(ff)
        )
        return x


def apply_init_weight(params, rng, head_only: bool = False):
    """Reference DeeperGCN weight re-init, applied post-init.

    all_init (reference deepergcn.py:169-170 -> init_weight :351-358):
    xavier_uniform on every Linear/Conv weight + zero biases.  head_init
    (:171-175): the same restricted to the prediction head
    (graph_pred_linear == our head_* Linears).

    Implemented as a params transform because torch mutates modules in
    place while flax params are a pytree.  Scope mirrors
    `isinstance(m, nn.Linear)`: 2-D `kernel` leaves and their sibling
    biases.  Divergence (documented in docs/PARITY.md): the fused
    flax attention kernels of the MSA readout are 3-D and skipped, whereas
    torch re-inits MultiheadAttention's out_proj (a Linear) but not its
    in_proj (a bare Parameter)."""
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    kernels = {
        path for path, leaf in flat.items()
        if path[-1] == "kernel" and jnp.ndim(leaf) == 2
    }
    if head_only:
        kernels = {p for p in kernels if any(s.startswith("head") for s in p)}
    i = 0
    for path in sorted(kernels):
        i += 1
        flat[path] = xavier_uniform(
            jax.random.fold_in(rng, i), flat[path].shape, flat[path].dtype
        )
        bpath = path[:-1] + ("bias",)
        if bpath in flat:
            flat[bpath] = jnp.zeros_like(flat[bpath])
    return flax.traverse_util.unflatten_dict(flat)


class DeeperGCN(nn.Module):
    """apply(params, batch, ctx, training) -> (pred, aux=None-like).

    batch.x: (B, N, 3) gene-level omics features (pathway rows zero);
    ctx.graph: gene-level + pathway-edge topology; edge ids ride
    ctx.graph.edge_attr column 1 when global_edge == 'onehot'
    (column 0 = float attr).
    batch.raw_data: (B, P, 3*pca_dim) pathway node attrs.
    """

    cfg: Config

    @nn.compact
    def __call__(self, batch, ctx, training: bool = False):
        cfg = self.cfg
        x = batch.x  # (B, N, 3)
        B, N, _ = x.shape
        P = cfg.pathway_num if cfg.pathway_global_node else 0
        H = cfg.hidden_channels
        graph = ctx.graph

        if not cfg.pca_only:
            if cfg.node_embedding:
                # full table + slice/broadcast instead of nn.Embed's row
                # gather: take's transpose is an XLA scatter-add (banned —
                # tests/test_hlo_scatter_free_families.py); param path
                # (node_embedding_encoder/embedding) is unchanged
                table = EmbedTable(
                    cfg.node_num,
                    cfg.node_embedding_dim,
                    embedding_init=xavier_uniform if cfg.init_emb else None
                    or jax.nn.initializers.normal(1.0),
                    name="node_embedding_encoder",
                )()
                n_genes = N - P
                emb = jnp.concatenate(
                    [
                        table[:n_genes],
                        # quirk: pathway rows -> embedding row 0
                        jnp.broadcast_to(
                            table[:1], (P, cfg.node_embedding_dim)
                        ),
                    ]
                )  # (N, D)
                feats = jnp.concatenate(
                    [x, jnp.broadcast_to(emb, (B, N, emb.shape[-1]))], axis=-1
                )
            else:
                feats = x
            h = Linear(H, kernel_init=xavier_uniform, name="node_features_encoder")(
                feats
            )

            if cfg.use_edge_attr and graph.edge_attr is not None:
                if cfg.global_edge == "onehot":
                    ids = graph.edge_attr[:, -1].astype(jnp.int32)
                    etable = EmbedTable(
                        max(cfg.pathway_edge_num, 1),
                        H,
                        embedding_init=xavier_uniform,
                        name="edge_encoder",
                    )()
                    # one-hot MXU matmul lookup: scatter-free table gradient
                    edge_emb = onehot_embed(
                        jnp.clip(ids, 0, max(cfg.pathway_edge_num, 1) - 1),
                        etable,
                    )
                else:
                    edge_emb = Linear(
                        H, kernel_init=xavier_uniform, name="edge_encoder"
                    )(graph.edge_attr[:, :1])
            else:
                edge_emb = None
        else:
            h = None
            edge_emb = None

        if cfg.pathway_global_node and batch.raw_data is not None:
            p_emb = Linear(
                H, kernel_init=xavier_uniform, name="pathway_features_encoder"
            )(batch.raw_data)  # (B, P, H)
            if not cfg.pca_only:
                # slice+concat, not .at[].set: the latter lowers to an XLA
                # scatter (banned op class) on both fwd and grad sides
                h = jnp.concatenate([h[:, : N - P, :], p_emb], axis=1)
            else:
                h = jax.nn.relu(p_emb)

        # mixed precision: conv stack in bf16, encoders/readout/head f32
        cdt = (
            jnp.bfloat16
            if cfg.compute_dtype in ("bfloat16", "bf16")
            else None
        )
        if cdt is not None and h is not None:
            h = h.astype(cdt)
            if edge_emb is not None:
                edge_emb = edge_emb.astype(cdt)
        # conv_encode_edge mirrors the reference exactly (deepergcn.py:76):
        # when true each GENConv re-encodes the already-H-dim edge_emb
        # through its own Linear(H, H) edge encoder (double encoding is the
        # reference's behavior, preserved)
        gcns = [
            GENConv(
                H, H, aggr=cfg.gcn_aggr, t=cfg.t, learn_t=cfg.learn_t,
                p=cfg.p, learn_p=cfg.learn_p, msg_norm=cfg.msg_norm,
                learn_msg_scale=cfg.learn_msg_scale,
                encode_edge=cfg.conv_encode_edge, edge_feat_dim=H,
                norm_type=cfg.norm, mlp_layers=cfg.mlp_layers,
                dtype=cdt,
                name=f"gcn_{i}",
            )
            for i in range(cfg.num_layers)
        ]
        norms = [
            Norm(cfg.norm, H, dtype=cdt, name=f"norm_{i}")
            for i in range(cfg.num_layers)
        ]

        def drop(v):
            return nn.Dropout(cfg.dropout, deterministic=not training)(v)

        # no_inter_norm / no_inter_drop gate the inter-layer norm / dropout
        # exactly where the reference reads them (deepergcn.py:236-246 res+,
        # :270-278 plain; the res branch never consults them)
        if cfg.block == "res+":
            h = gcns[0](h, graph, edge_emb, training)
            for l in range(1, cfg.num_layers):
                h1 = norms[l - 1](h, training) if not cfg.no_inter_norm else h
                h2 = jax.nn.relu(h1)
                if not cfg.no_inter_drop:
                    h2 = drop(h2)
                h = gcns[l](h2, graph, edge_emb, training) + h
            h = norms[cfg.num_layers - 1](h, training)
            if not cfg.no_inter_drop:
                h = drop(h)
        elif cfg.block == "res":
            h = jax.nn.relu(norms[0](gcns[0](h, graph, edge_emb, training), training))
            h = drop(h)
            for l in range(1, cfg.num_layers):
                h1 = gcns[l](h, graph, edge_emb, training)
                h = jax.nn.relu(norms[l](h1, training)) + h
                h = drop(h)
        elif cfg.block == "plain":
            h = jax.nn.relu(norms[0](gcns[0](h, graph, edge_emb, training), training))
            h = drop(h)
            for l in range(1, cfg.num_layers):
                h1 = gcns[l](h, graph, edge_emb, training)
                h2 = norms[l](h1, training) if not cfg.no_inter_norm else h1
                # reference :273: the last layer keeps its relu when
                # pca_only is set
                h = (
                    jax.nn.relu(h2)
                    if l != cfg.num_layers - 1 or cfg.pca_only
                    else h2
                )
                if not cfg.no_inter_drop:
                    h = drop(h)
        else:
            raise NotImplementedError(cfg.block)
        h = h.astype(jnp.float32)  # readout + head stay f32

        if cfg.pathway_global_node:
            pw = h[:, -P:, :] if not cfg.pca_only else h[:, :P, :]  # (B, P, H)
            if cfg.pathway_readout is None:
                h_graph = pw.mean(axis=1)
            elif cfg.pathway_readout == "MSA":
                # BatchNorm1d over the pathway-channel dim (B, P, H)
                m = pw.mean(axis=(0, 2), keepdims=True)
                v = pw.var(axis=(0, 2), keepdims=True)
                scale = self.param("pred_norm_scale", nn.initializers.ones, (P,))
                bias = self.param("pred_norm_bias", nn.initializers.zeros, (P,))
                pwn = (pw - m) * jax.lax.rsqrt(v + 1e-5)
                pwn = pwn * scale[None, :, None] + bias[None, :, None]
                pwn = TransformerEncoderLayer(H, name="readout_msa")(pwn, training)
                h_graph = pwn.mean(axis=1)
            elif cfg.pathway_readout == "maxpool":
                if cfg.feature_drop:
                    pw = nn.Dropout(0.25, deterministic=not training)(pw)
                # max_pool1d(window 4) over the pathway axis, flatten (H, P//4)
                t = jnp.transpose(pw, (0, 2, 1))  # (B, H, P)
                trim = (P // 4) * 4
                t = t[:, :, :trim].reshape(B, H, P // 4, 4).max(axis=-1)
                h_graph = t.reshape(B, -1)
                if cfg.pre_concat_age:
                    h_graph = jnp.concatenate(
                        [h_graph, batch.age[:, None]], axis=-1
                    )
                h_graph = Linear(H, kernel_init=xavier_uniform, name="readout")(
                    h_graph
                )
                h_graph = jax.nn.relu(h_graph)
                if not cfg.pre_readout_drop:
                    h_graph = nn.Dropout(0.5, deterministic=not training)(h_graph)
            else:
                raise NotImplementedError(cfg.pathway_readout)
        else:
            if cfg.graph_pooling == "sum":
                h_graph = h.sum(axis=1)
            elif cfg.graph_pooling == "max":
                h_graph = h.max(axis=1)
            else:
                h_graph = h.mean(axis=1)

        if cfg.use_age and not cfg.pre_concat_age:
            h_graph = jnp.concatenate([h_graph, batch.age[:, None]], axis=-1)

        for i in range(cfg.num_layer_head - 1):
            h_graph = Linear(
                h_graph.shape[-1], kernel_init=xavier_uniform, name=f"head_{i}"
            )(h_graph)
            h_graph = jax.nn.relu(h_graph)
            if cfg.head_dropout:
                h_graph = nn.Dropout(cfg.dropout, deterministic=not training)(
                    h_graph
                )
        out = Linear(cfg.num_tasks, kernel_init=xavier_uniform, name="head_out")(
            h_graph
        )
        return jax.nn.softmax(out, axis=-1), None
