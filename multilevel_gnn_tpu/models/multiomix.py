"""MultiOmixGCN — per-omics virtual-node encoders + joint head.

Re-implements reference models/deepergcn_virtual_node.py:11-295:
three DeeperGCN_Vnode encoders (one per omics) whose res+ blocks interleave
GENConv over the gene graph with PathwayConv over the per-omics
pathway-edge graph (applied with the pathway-vnode mask, :184-196), pathway
readout (pool | MSA | maxpool-4 + Linear), concat of the three graph
embeddings + age, softmax head.

Dense-batched layout: pathway virtual nodes occupy the trailing node slots,
so the reference's cumsum slice loops (:178-180, :231-234) are static
slices; per-omics pathway edge lists ride separate Graph objects in the
model's VnodeContext.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from multilevel_gnn_tpu.core.batch import Batch, FoldContext
from multilevel_gnn_tpu.core.config import Config
from multilevel_gnn_tpu.core.graph import Graph
from multilevel_gnn_tpu.models.deepergcn import TransformerEncoderLayer
from multilevel_gnn_tpu.nn.basic import (
    EmbedTable,
    Linear,
    Norm,
    xavier_uniform,
)
from multilevel_gnn_tpu.nn.conv import GENConv, PathwayConv

OMIX_NAMES = ("mrna", "cnv", "mt")


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class VnodeContext:
    """Per-omics pathway-edge graphs + masks alongside the base FoldContext.

    pathway_graphs: dict omix -> Graph over the same node space whose edges
    connect genes to their pathway virtual nodes (trailing P slots).
    pathway_masks: dict omix -> (N, 1) 1.0 at pathway-vnode rows reached by
    an edge (reference format_pathway_data :256-268).
    pathway_attrs: dict omix -> (B?, P, A) per-pathway node features.
    """

    base: FoldContext
    pathway_graphs: Dict[str, Graph]
    pathway_masks: Dict[str, jax.Array]


class DeeperGCNVnode(nn.Module):
    cfg: Config
    omix: str

    @nn.compact
    def __call__(self, batch: Batch, ctx: VnodeContext, pathway_attr,
                 training: bool = False):
        cfg = self.cfg
        x = batch.x  # (B, N, 3[+1])
        B, N = x.shape[0], x.shape[1]
        P = cfg.pathway_num
        H = cfg.hidden_channels
        graph = ctx.base.graph

        if cfg.node_embedding:
            # full table + slice/broadcast, not nn.Embed's row gather (its
            # transpose is an XLA scatter-add — banned op class); the
            # pathway rows share embedding row 0 (reference quirk)
            table = EmbedTable(
                cfg.node_num, cfg.node_embedding_dim,
                embedding_init=xavier_uniform, name="node_embedding_encoder",
            )()
            n_genes = N - P
            D = cfg.node_embedding_dim
            rows = jnp.concatenate(
                [table[:n_genes], jnp.broadcast_to(table[:1], (P, D))]
            )
            emb = jnp.broadcast_to(rows, (B, N, D))
            feats = jnp.concatenate([x, emb], axis=-1)
        else:
            feats = x
        h = Linear(H, kernel_init=xavier_uniform, name="node_features_encoder")(
            feats
        )
        if cfg.use_edge_attr and graph.edge_attr is not None:
            edge_emb = Linear(H, kernel_init=xavier_uniform, name="edge_encoder")(
                graph.edge_attr[:, :1]
            )
        else:
            edge_emb = None
        if cfg.pathway_global_node and pathway_attr is not None:
            p_emb = Linear(
                H, kernel_init=xavier_uniform, name="pathway_features_encoder"
            )(pathway_attr)
            # slice+concat, not .at[].set (scatter-free — see deepergcn.py)
            h = jnp.concatenate([h[:, : N - P, :], p_emb], axis=1)

        pgraph = ctx.pathway_graphs[self.omix]
        pmask = ctx.pathway_masks[self.omix]

        gcns = [
            GENConv(H, H, aggr=cfg.gcn_aggr, t=cfg.t, learn_t=cfg.learn_t,
                    p=cfg.p, learn_p=cfg.learn_p, msg_norm=cfg.msg_norm,
                    learn_msg_scale=cfg.learn_msg_scale,
                    # per-conv re-encoding of the H-dim edge_emb, exactly as
                    # the reference (deepergcn_virtual_node.py:105)
                    encode_edge=cfg.conv_encode_edge, edge_feat_dim=H,
                    norm_type=cfg.norm, mlp_layers=cfg.mlp_layers,
                    name=f"gcn_{i}")
            for i in range(cfg.num_layers)
        ]
        pgcns = [
            PathwayConv(H, H, edge_feat_dim=H, aggr=cfg.gcn_aggr, t=cfg.t,
                        learn_t=cfg.learn_t, norm_type=cfg.norm,
                        mlp_layers=cfg.mlp_layers, name=f"pathway_gcn_{i}")
            for i in range(cfg.num_layers)
        ]
        norms = [Norm(cfg.norm, H, name=f"norm_{i}")
                 for i in range(cfg.num_layers)]

        def drop(v):
            return nn.Dropout(cfg.dropout, deterministic=not training)(v)

        # PathwayConv consumes the raw (E, A) pathway edge attrs directly —
        # the outer-product message sizes its encoder as Linear(A*H -> H)
        # (reference PathwayConv msg_encoder Linear(2*in, in))
        pw_edge_emb = pgraph.edge_attr

        if cfg.block == "res+":
            h = gcns[0](h, graph, edge_emb, training)
            for l in range(1, cfg.num_layers):
                h1 = norms[l - 1](h, training)
                h2 = drop(jax.nn.relu(h1))
                h2 = gcns[l](h2, graph, edge_emb, training)
                h = pgcns[l](h2, pgraph, pw_edge_emb, pmask, training) + h2
            h = norms[cfg.num_layers - 1](h, training)
            h = drop(h)
        else:  # res / plain fall back to the gene-graph-only stack
            h = jax.nn.relu(norms[0](gcns[0](h, graph, edge_emb, training), training))
            h = drop(h)
            for l in range(1, cfg.num_layers):
                h1 = gcns[l](h, graph, edge_emb, training)
                h2 = norms[l](h1, training)
                h = (jax.nn.relu(h2) + h) if cfg.block == "res" else jax.nn.relu(h2)
                h = drop(h)

        pw = h[:, -P:, :]  # (B, P, H)
        if cfg.pathway_readout is None:
            return pw.mean(axis=1)
        if cfg.pathway_readout == "MSA":
            m = pw.mean(axis=(0, 2), keepdims=True)
            v = pw.var(axis=(0, 2), keepdims=True)
            scale = self.param("pred_norm_scale", nn.initializers.ones, (P,))
            bias = self.param("pred_norm_bias", nn.initializers.zeros, (P,))
            pwn = (pw - m) * jax.lax.rsqrt(v + 1e-5)
            pwn = pwn * scale[None, :, None] + bias[None, :, None]
            pwn = TransformerEncoderLayer(H, name="readout_msa")(pwn, training)
            return pwn.mean(axis=1)
        # maxpool readout (:247-250)
        t = jnp.transpose(pw, (0, 2, 1))
        trim = (P // 4) * 4
        t = t[:, :, :trim].reshape(B, H, P // 4, 4).max(axis=-1)
        hg = t.reshape(B, -1)
        return Linear(H, kernel_init=xavier_uniform, name="readout")(hg)


class MultiOmixGCN(nn.Module):
    """apply(params, batch, ctx: VnodeContext, pathway_attrs, training)
    -> (pred, None).  pathway_attrs: dict omix -> (B, P, 2)."""

    cfg: Config

    @nn.compact
    def __call__(self, batch: Batch, ctx: VnodeContext,
                 pathway_attrs: Dict[str, jax.Array],
                 training: bool = False):
        cfg = self.cfg
        results = []
        for omix in OMIX_NAMES:
            enc = DeeperGCNVnode(cfg, omix, name=f"{omix}_encoder")
            results.append(enc(batch, ctx, pathway_attrs.get(omix), training))
        h = jnp.concatenate(results, axis=-1)
        if cfg.use_age:
            h = jnp.concatenate([h, batch.age[:, None]], axis=-1)
        for i in range(cfg.num_layer_head - 1):
            h = Linear(h.shape[-1], kernel_init=xavier_uniform,
                       name=f"head_{i}")(h)
            h = jax.nn.relu(h)
            if cfg.head_dropout:
                h = nn.Dropout(cfg.dropout, deterministic=not training)(h)
        out = Linear(cfg.num_tasks, kernel_init=xavier_uniform, name="head_out")(h)
        return jax.nn.softmax(out, axis=-1), None
