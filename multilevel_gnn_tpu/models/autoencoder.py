"""AutoEncoder pretraining head over the MultilevelGNN encoder.

Re-implements reference models/autoencoder.py:23-152: the shared GNN +
learnable-PCA encoder (without the value-attention merge, :97-103; gather
mask uses the reference's ``gene_pca_match > 0`` quirk, :107) and three
decoder variants: 'flatten' MLP, per-pathway 'foreach' MLPs, and
'foreach_diffhidden' (hidden dim = next pow2 of sqrt(out*C), :46-58).

Subclasses MultilevelGNN so parameter names match for partial pretrain
loading (reference multilevel_gnn.py:386-394 load_autoencoder_pretrain).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from multilevel_gnn_tpu.core.batch import Batch, FoldContext
from multilevel_gnn_tpu.models.multilevel_gnn import (
    MultilevelGNN,
    _node_embedding_init,
    _pca_param_init,
)
from multilevel_gnn_tpu.nn.basic import Linear, xavier_uniform
from multilevel_gnn_tpu.ops.pathway import pathway_contract


def next_pow2(n: int) -> int:
    return 1 << max(int(n) - 1, 0).bit_length()


class AutoEncoder(MultilevelGNN):
    """apply(params, batch, ctx, training) -> (recon, latent)."""

    @nn.compact
    def __call__(self, batch: Batch, ctx: FoldContext, training: bool = False):
        h = self.encode_latent(batch, ctx, training)
        recon = self.decode(h, ctx, training)
        return recon, h

    def encode_latent(self, batch: Batch, ctx: FoldContext, training: bool):
        cfg = self.cfg
        x = batch.x
        if cfg.node_embedding:
            emb = self.param(
                "node_embedding",
                _node_embedding_init(cfg),
                (ctx.graph.n_nodes, cfg.node_embedding_dim),
            )
            h = x[..., None] * emb
        else:
            h = x[..., None]
        h = self.gnn_stack(h, x, ctx, training, apply_value_mask=False)
        # gather with the reference AE '>' quirk (autoencoder.py:107)
        nodes = h.shape[-2]
        match = ctx.gene_pca_match
        idx = jnp.where(match >= 0, match, nodes + match)
        from multilevel_gnn_tpu.ops import spmm

        if spmm.get_backend() == "pallas" and ctx.pca_gather_seg is not None:
            # Pallas segment-sum cotangent (a plain jnp.take transposes to
            # XLA scatter-add — tests/test_hlo_scatter_free_families.py)
            xg = spmm.gather_rows(h, idx, ctx.pca_gather_seg)
        else:
            xg = jnp.take(h, idx, axis=-2)
        if cfg.pca_match_mask:
            xg = xg * (match > 0).astype(h.dtype)[:, None]
        pca_params = self.param(
            "learnable_pca_params",
            _pca_param_init(cfg),
            (ctx.num_pca_rows, cfg.pca_dim),
        )
        p = pca_params * ctx.info_mask
        out = pathway_contract(xg, p, ctx.raw_indice, 3 * cfg.pathway_num)
        # (B, C, 3P, K)
        if self.cfg.decoder_type == "flatten":
            B, C, S, K = out.shape
            return out.reshape(B, C, cfg.pathway_num, 3 * K)
        return out  # foreach: (B, C, 3P, K)

    def decode(self, h, ctx: FoldContext, training: bool):
        cfg = self.cfg
        out_dim = cfg.node_num * 3
        if cfg.decoder_type == "flatten":
            z = h.reshape(h.shape[0], -1)
            z = Linear(cfg.decoder_dim, kernel_init=xavier_uniform,
                       name="dec_0")(z)
            z = jax.nn.relu(z)
            z = Linear(cfg.decoder_dim, kernel_init=xavier_uniform,
                       name="dec_1")(z)
            z = jax.nn.relu(z)
            return Linear(out_dim, kernel_init=xavier_uniform, name="dec_2")(z)
        # foreach: per pathway-slot MLPs sized by that slot's gene count
        # (reference :38-58); h: (B, C, S, K) -> per slot (B, C*K)
        z = jnp.transpose(h, (0, 2, 1, 3))  # (B, S, C, K)
        z = z.reshape(z.shape[0], z.shape[1], -1)
        # per-slot output sizes are model structure => must be static
        # (cfg.slot_sizes, set by the pretrain driver from the cohort)
        assert cfg.slot_sizes is not None, (
            "foreach decoders need cfg.slot_sizes (genes per pathway-omics "
            "slot); set it from Cohort.slot_sizes()"
        )
        outs = []
        n_slots = 3 * cfg.pathway_num
        for s in range(n_slots):
            n_out = int(cfg.slot_sizes[s])
            if n_out == 0:
                continue
            hidden = (
                cfg.decoder_dim
                if cfg.decoder_type == "foreach"
                else next_pow2(int(math.sqrt(n_out * cfg.final_channels)))
            )
            y = Linear(hidden, kernel_init=xavier_uniform,
                       name=f"dec_slot{s}_0")(z[:, s, :])
            y = jax.nn.relu(y)
            outs.append(
                Linear(n_out, kernel_init=xavier_uniform,
                       name=f"dec_slot{s}_1")(y)
            )
        return jnp.concatenate(outs, axis=-1)


def reconstruction_loss(recon, target, cfg, std_weight=None):
    """MAE reconstruction with optional per-row std weighting (reference
    vae.py:359-374 get_vae_sim_loss)."""
    err = jnp.abs(recon - target)
    if cfg.std_weight and std_weight is not None:
        return cfg.std_weight_coef * jnp.mean(std_weight[None, :] * err)
    return jnp.mean(err)
