"""VQ-VAE pretraining head (reference models/vq_vae.py:36-484).

VectorQuantizer: L2-nearest codebook lookup, commitment + embedding losses,
straight-through estimator (:53-83).  Encoder/decoder mirror the VAE without
the mu/sigma heads (:168-231); vae_loss = beta * recon + vq_loss (:353-360).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from multilevel_gnn_tpu.core.batch import Batch, FoldContext
from multilevel_gnn_tpu.models.autoencoder import AutoEncoder
from multilevel_gnn_tpu.nn.basic import Linear, xavier_uniform


class VectorQuantizer(nn.Module):
    num_embeddings: int
    embedding_dim: int
    beta: float = 0.25

    @nn.compact
    def __call__(self, latents):
        codebook = self.param(
            "embedding",
            lambda k, s: jax.random.uniform(k, s, jnp.float32, -1.0, 1.0),
            (self.num_embeddings, self.embedding_dim),
        )
        flat = latents.reshape(-1, self.embedding_dim)
        dist = (
            jnp.sum(flat**2, axis=1, keepdims=True)
            + jnp.sum(codebook**2, axis=1)[None, :]
            - 2.0 * flat @ codebook.T
        )
        idx = jnp.argmin(dist, axis=1)
        # one-hot MXU matmul lookup: the codebook gradient of the embedding
        # loss becomes a transposed matmul instead of XLA's scatter-add
        # transpose of take (banned op class; codebook is small)
        from multilevel_gnn_tpu.nn.basic import onehot_embed

        quantized = onehot_embed(idx, codebook).reshape(latents.shape)
        commitment = jnp.mean((jax.lax.stop_gradient(quantized) - latents) ** 2)
        embedding = jnp.mean((quantized - jax.lax.stop_gradient(latents)) ** 2)
        vq_loss = commitment * self.beta + embedding
        # straight-through estimator
        quantized = latents + jax.lax.stop_gradient(quantized - latents)
        return quantized, vq_loss


class VQVAE(AutoEncoder):
    """apply -> dict(pred_x, z, quantized, vq_loss, embedding)."""

    @nn.compact
    def __call__(self, batch: Batch, ctx: FoldContext, training: bool = False):
        cfg = self.cfg
        h = self.encode_latent(batch, ctx, training)  # (B,C,P,3K)/(B,C,3P,K)
        x = jnp.transpose(h, (0, 2, 1, 3))
        z = x.reshape(x.shape[0], x.shape[1], -1)  # (B, S, H)
        quantized, vq_loss = VectorQuantizer(
            cfg.vqvae_num_embeddings, z.shape[-1], cfg.vqvae_beta,
            name="quantizer",
        )(z)
        recon = self._decode(quantized, training)
        return {
            "pred_x": recon,
            "z": z,
            "quantized": quantized,
            "vq_loss": vq_loss,
            "embedding": quantized,
        }

    def _decode(self, z, training):
        cfg = self.cfg
        if cfg.decoder_type == "flatten":
            zz = z.reshape(z.shape[0], -1)
            h = Linear(cfg.decoder_dim, kernel_init=xavier_uniform, name="dec_0")(zz)
            h = jax.nn.relu(h)
            h = Linear(cfg.decoder_dim, kernel_init=xavier_uniform, name="dec_1")(h)
            h = jax.nn.relu(h)
            return Linear(cfg.node_num * 3, kernel_init=xavier_uniform,
                          name="dec_2")(h)
        outs = []
        for s in range(3 * cfg.pathway_num):
            n_out = int(cfg.slot_sizes[s])
            if n_out == 0:
                continue
            y = Linear(cfg.decoder_dim, kernel_init=xavier_uniform,
                       name=f"dec_slot{s}_0")(z[:, s, :])
            y = jax.nn.relu(y)
            outs.append(Linear(n_out, kernel_init=xavier_uniform,
                               name=f"dec_slot{s}_1")(y))
        return jnp.concatenate(outs, axis=-1)


def vqvae_loss(recon, target, vq_loss, cfg):
    """beta * recon + vq (reference vq_vae.py:353-360)."""
    recons_loss = jnp.mean((recon - target) ** 2)
    return {
        "loss": cfg.mmd_beta * recons_loss + vq_loss,
        "Reconstruction_Loss": recons_loss,
        "VQ_Loss": vq_loss,
    }
