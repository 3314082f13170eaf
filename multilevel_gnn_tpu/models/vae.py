"""VAE / MMD-WAE pretraining + fine-tune heads (reference models/vae.py).

Encoder: the MultilevelGNN GNN + learnable-PCA path (value-att merge
skipped, vae.py:154-160), mu/log-sigma heads (:200-208), aux losses
(-std(mu) and per-pathway |corr|, :204-207).  Decoders mirror the AE.
Losses: MMD-WAE recon + KLD + RBF/IMQ kernel MMD (:334-357, 376-447).
Fine-tune: predict_head with the conv stack, no_pooling, or DiffPool over
the pathway-correlation adjacency (:233-265); reconstruct_head resizes the
classifier for each variant (:267-299).

Reference divergence (documented): with decoder_type='flatten' the
reference's enc_mu Linear(H=C*K) cannot consume the (B, P, C*3K) flattened
image (vae.py:84-86 vs :180-184) — a latent-dim mismatch that would crash
torch; we size the latent heads from the actual input.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from multilevel_gnn_tpu.core.batch import Batch, FoldContext
from multilevel_gnn_tpu.models.autoencoder import AutoEncoder
from multilevel_gnn_tpu.models.diffpool import DiffPool
from multilevel_gnn_tpu.models.multilevel_gnn import ConvHead
from multilevel_gnn_tpu.nn.basic import Linear, xavier_uniform


class VAE(AutoEncoder):
    """apply -> dict(pred_x, mu, sigma, z, aux_losses, embedding)."""

    @nn.compact
    def __call__(
        self,
        batch: Batch,
        ctx: FoldContext,
        training: bool = False,
        rng_key=None,
        mode: str = "pretrain",
        pathway_adj=None,
    ):
        """mode='pretrain': reconstruction dict.  mode='finetune' /
        'finetune_sample': classifier through predict_head (reference
        train_step/eval_step vae.py:90-116)."""
        if mode != "pretrain":
            return self._finetune(
                batch, ctx, pathway_adj, training, rng_key,
                generate_sample=(mode == "finetune_sample"),
            )
        mu, sigma, aux = self.encode_gaussian(batch, ctx, training)
        if rng_key is None:
            rng_key = self.make_rng("sample") if training else jax.random.PRNGKey(0)
        z = mu + sigma * jax.random.normal(rng_key, mu.shape)
        recon = self.decode_latent(z, ctx, training)
        return {
            "pred_x": recon,
            "mu": mu,
            "sigma": sigma,
            "z": z,
            "aux_losses": aux,
            "embedding": jnp.concatenate([mu, sigma], axis=-1),
        }

    def encode_gaussian(self, batch, ctx, training):
        """(B, S_lat, H) latents: S_lat = P (flatten) or 3P (foreach)."""
        cfg = self.cfg
        h = self.encode_latent(batch, ctx, training)  # (B,C,P,3K)/(B,C,3P,K)
        x = jnp.transpose(h, (0, 2, 1, 3))  # (B, S, C, K')
        x = x.reshape(x.shape[0], x.shape[1], -1)
        H = x.shape[-1]
        mu = Linear(H, kernel_init=xavier_uniform, name="enc_mu")(x)
        log_sigma = Linear(H, kernel_init=xavier_uniform, name="enc_log_sigma")(x)
        sigma = jnp.exp(log_sigma) + 1e-7
        # aux losses (reference :204-207)
        loss_std = -jnp.std(mu.reshape(mu.shape[0], -1), axis=0, ddof=1).mean()
        m = mu - mu.mean(axis=0, keepdims=True)  # corr over batch per pathway
        cov = jnp.einsum("bsh,bsg->shg", m, m)
        d = jnp.sqrt(jnp.clip(jnp.einsum("bsh,bsh->sh", m, m), 1e-12, None))
        corr = cov / (d[:, :, None] * d[:, None, :])
        eye = jnp.eye(mu.shape[-1])[None]
        loss_corr = jnp.abs(corr * (1.0 - eye)).mean()
        return mu, sigma, {"std": loss_std, "idp": 0.0, "corr": loss_corr}

    def decode_latent(self, z, ctx, training):
        cfg = self.cfg
        if cfg.decoder_type == "flatten":
            zz = z.reshape(z.shape[0], -1)
            h = Linear(cfg.decoder_dim, kernel_init=xavier_uniform, name="dec_0")(zz)
            h = jax.nn.relu(h)
            h = Linear(cfg.decoder_dim, kernel_init=xavier_uniform, name="dec_1")(h)
            h = jax.nn.relu(h)
            return Linear(cfg.node_num * 3, kernel_init=xavier_uniform,
                          name="dec_2")(h)
        # foreach decoders reuse the AE per-slot structure on z (B, S, H)
        outs = []
        for s in range(3 * cfg.pathway_num):
            n_out = int(cfg.slot_sizes[s])
            if n_out == 0:
                continue
            # foreach_diffhidden sizes each slot's hidden dim from its gene
            # count (reference vae.py:63-74), same as the AE decoder
            if cfg.decoder_type == "foreach_diffhidden":
                from multilevel_gnn_tpu.models.autoencoder import next_pow2
                import math as _math

                hidden = next_pow2(
                    int(_math.sqrt(n_out * cfg.final_channels))
                )
            else:
                hidden = cfg.decoder_dim
            y = Linear(hidden, kernel_init=xavier_uniform,
                       name=f"dec_slot{s}_0")(z[:, s, :])
            y = jax.nn.relu(y)
            outs.append(Linear(n_out, kernel_init=xavier_uniform,
                               name=f"dec_slot{s}_1")(y))
        return jnp.concatenate(outs, axis=-1)

    # ---------------- fine-tune path (reference :90-116, 233-265) --------
    def _finetune(
        self,
        batch: Batch,
        ctx: FoldContext,
        pathway_adj,
        training: bool = False,
        rng_key=None,
        generate_sample: bool = False,
    ):
        cfg = self.cfg
        mu, sigma, aux = self.encode_gaussian(batch, ctx, training)
        h = mu
        if generate_sample and rng_key is not None:
            h = mu + sigma * jax.random.normal(rng_key, mu.shape)
        B, S, Ch = h.shape
        if cfg.channel_one:
            img = h.reshape(B, 1, cfg.pathway_num, -1)
        else:
            img = jnp.transpose(h, (0, 2, 1)).reshape(
                B, Ch, cfg.pathway_num, -1
            )
        if cfg.reorder_pathway:
            from multilevel_gnn_tpu.ops.spmm import permute_take

            img = permute_take(img, ctx.reorder_idxs, 2)
        return self.predict_head(img, batch.age, pathway_adj, training), aux

    def predict_head(self, img, age, pathway_adj, training):
        cfg = self.cfg
        l = e = 0.0
        if cfg.reorder_type == "diff_pooling":
            B, C, P, D = img.shape
            x = jnp.transpose(img, (0, 3, 2, 1)).reshape(-1, cfg.pathway_num, C)
            x, l, e = DiffPool(
                cfg, C, cfg.pathway_num, cfg.diff_pooling_layer,
                cfg.diff_pooling_hidden_dim, cfg.diff_pooling_output_dim,
                name="diff_pooling",
            )(x, pathway_adj, training)
            x = x.reshape(B, -1)
            x = nn.Dropout(0.25 if cfg.feature_drop else 0.0,
                           deterministic=not training)(x)
            if cfg.use_age:
                x = jnp.concatenate([x, age[:, None]], axis=-1)
            x = Linear(cfg.head_dim, kernel_init=xavier_uniform, name="head_0")(x)
            x = jax.nn.relu(x)
            x = nn.Dropout(0.5, deterministic=not training)(x)
            x = Linear(2, kernel_init=xavier_uniform, name="head_1")(x)
            return jax.nn.softmax(x, axis=-1), img, l, e
        pred = ConvHead(cfg, img.shape[1], name="conv_head")(img, age, training)
        return pred, img, l, e


class VAEClassifier(VAE):
    """VAE fine-tune classifier under the uniform driver protocol:
    apply(params, batch, ctx, training) -> (pred, pca_feature, extra_loss)
    where extra_loss carries the DiffPool link+entropy terms (reference
    eval_step/train_step vae.py:90-116; pathway adjacency from
    ctx.pathway_adj)."""

    @nn.compact
    def __call__(self, batch: Batch, ctx: FoldContext, training: bool = False):
        (pred, img, l, e), aux = self._finetune(
            batch, ctx, ctx.pathway_adj, training,
            rng_key=None, generate_sample=False,
        )
        return pred, img, l + e


def embedding_reorder(embeddings) -> "np.ndarray":
    """Pathway reorder from saved per-omics embedding matrices (reference
    get_embedding_similarity vae.py:308-332, xlsx-free): concatenate the
    per-omics (P, d) embeddings, correlation-chain order."""
    import numpy as np

    cat = np.concatenate(
        [np.asarray(e).reshape(np.asarray(e).shape[0], -1) for e in embeddings],
        axis=-1,
    )
    P = cat.shape[0]
    corr = np.corrcoef(cat) - np.eye(P)
    corr = np.nan_to_num(corr, nan=-1.0)
    mx = corr.argmax()
    order = [mx // P, mx % P]
    remain = set(range(P)) - set(order)
    sort_m = np.argsort(corr)
    while len(order) < P:
        src = order[-1]
        for t in sort_m[src][::-1]:
            if t in remain:
                order.append(int(t))
                remain.remove(int(t))
                break
    return np.array(order, np.int32)


def vae_loss(recon, target, z, mu, sigma, cfg, rng_key):
    """MMD-WAE objective (reference vae.py:334-357)."""
    b = target.shape[0]
    bias_corr = b * (b - 1)
    recons_loss = jnp.mean((recon - target) ** 2)
    mmd = compute_mmd_per_slot(z, cfg, rng_key)
    # closed-form KL(N(mu, sigma) || N(0, 1))
    kld = (
        (sigma**2 + mu**2) / 2.0 - 0.5 - jnp.log(sigma)
    ).sum(-1).mean()
    loss = (
        cfg.mmd_beta * recons_loss
        + (1.0 - cfg.mmd_alpha) * cfg.kld_weight * kld
        + (cfg.mmd_alpha + cfg.mmd_reg_weight - 1.0) / bias_corr * mmd
    )
    return {
        "loss": loss,
        "Reconstruction_Loss": recons_loss,
        "MMD": mmd,
        "KLD": -kld,
    }


def _kernel_matrix(x1, x2, cfg):
    d = x2.shape[-1]
    if cfg.mmd_kernel_type == "rbf":
        sigma = 2.0 * d * cfg.z_var
        return jnp.exp(-jnp.mean((x1[:, None] - x2[None]) ** 2, -1) / sigma)
    # imq (reference :415-433): sum excludes the diagonal
    C = 2.0 * d * cfg.z_var
    k = C / (1e-7 + C + jnp.sum((x1[:, None] - x2[None]) ** 2, -1))
    # eye-mask, not jnp.diag: diagonal extraction transposes to an XLA
    # scatter under grad (tests/test_hlo_scatter_free_families.py)
    return jnp.sum(k * (1.0 - jnp.eye(k.shape[0], dtype=k.dtype)))


def compute_mmd_per_slot(z, cfg, rng_key):
    """Mean over latent slots of MMD(z_slot, N(0,1)) (reference :343-346)."""
    def one(zs, key):
        prior = jax.random.normal(key, zs.shape)
        if cfg.mmd_kernel_type == "rbf":
            return (
                _kernel_matrix(prior, prior, cfg).mean()
                + _kernel_matrix(zs, zs, cfg).mean()
                - 2 * _kernel_matrix(prior, zs, cfg).mean()
            )
        return (
            _kernel_matrix(prior, prior, cfg)
            + _kernel_matrix(zs, zs, cfg)
            - 2 * _kernel_matrix(prior, zs, cfg)
        )

    S = z.shape[1]
    keys = jax.random.split(rng_key, S)
    vals = jax.vmap(one, in_axes=(1, 0))(z, keys)
    return vals.mean()
