"""Golden tests for VAE/VQ loss math vs explicit torch oracles
(SURVEY.md §4.3: MMD kernels, KLD, VQ straight-through)."""
import numpy as np
import jax
import jax.numpy as jnp
import torch

from multilevel_gnn_tpu.core.config import Config
from multilevel_gnn_tpu.models.vae import _kernel_matrix, vae_loss


def torch_imq(x1, x2, z_var):
    d = x2.shape[-1]
    C = 2 * d * z_var
    k = C / (1e-7 + C + (x1[:, None] - x2[None]).pow(2).sum(-1))
    return k.sum() - k.diag().sum()


def torch_rbf(x1, x2, z_var):
    d = x2.shape[-1]
    sigma = 2.0 * d * z_var
    return torch.exp(-((x1[:, None] - x2[None]) ** 2).mean(-1) / sigma)


def test_kernel_matrices_match_torch(rng):
    cfg = Config(z_var=2.0, mmd_kernel_type="imq")
    a = rng.randn(6, 4).astype(np.float32)
    b = rng.randn(6, 4).astype(np.float32)
    got = float(_kernel_matrix(jnp.asarray(a), jnp.asarray(b), cfg))
    want = float(torch_imq(torch.tensor(a), torch.tensor(b), 2.0))
    np.testing.assert_allclose(got, want, rtol=1e-5)

    cfg = Config(z_var=2.0, mmd_kernel_type="rbf")
    got = np.asarray(_kernel_matrix(jnp.asarray(a), jnp.asarray(b), cfg))
    want = torch_rbf(torch.tensor(a), torch.tensor(b), 2.0).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_vae_loss_composition(rng):
    """loss = mmd_beta*MSE + (1-alpha)*kld_w*KLD + (alpha+reg-1)/bias*MMD,
    KLD closed form vs torch.distributions."""
    cfg = Config(mmd_beta=10.5, mmd_alpha=-9.0, kld_weight=0.2,
                 mmd_reg_weight=110.0, z_var=2.0, mmd_kernel_type="imq")
    B, S, H = 5, 3, 4
    recon = rng.randn(B, 7).astype(np.float32)
    target = rng.randn(B, 7).astype(np.float32)
    mu = rng.randn(B, S, H).astype(np.float32)
    sigma = np.abs(rng.randn(B, S, H)).astype(np.float32) + 0.5
    z = rng.randn(B, S, H).astype(np.float32)
    d = vae_loss(jnp.asarray(recon), jnp.asarray(target), jnp.asarray(z),
                 jnp.asarray(mu), jnp.asarray(sigma), cfg,
                 jax.random.PRNGKey(0))
    # KLD oracle
    q = torch.distributions.Normal(torch.tensor(mu), torch.tensor(sigma))
    kld = torch.distributions.kl_divergence(
        q, torch.distributions.Normal(0.0, 1.0)
    ).sum(-1).mean()
    np.testing.assert_allclose(float(-d["KLD"]), float(kld), rtol=1e-5)
    # recon oracle
    mse = torch.nn.functional.mse_loss(torch.tensor(recon), torch.tensor(target))
    np.testing.assert_allclose(float(d["Reconstruction_Loss"]), float(mse),
                               rtol=1e-6)
    # composition identity (MMD itself is stochastic via the prior sample)
    want = (
        cfg.mmd_beta * float(mse)
        + (1 - cfg.mmd_alpha) * cfg.kld_weight * float(kld)
        + (cfg.mmd_alpha + cfg.mmd_reg_weight - 1) / (B * (B - 1)) * float(d["MMD"])
    )
    np.testing.assert_allclose(float(d["loss"]), want, rtol=1e-5)


def test_vq_quantizer_vs_torch(rng):
    """VectorQuantizer nearest-codebook selection + losses vs torch oracle."""
    from multilevel_gnn_tpu.models.vq_vae import VectorQuantizer

    K, D, B, S = 11, 6, 3, 4
    latents = rng.randn(B, S, D).astype(np.float32)
    vq = VectorQuantizer(K, D, beta=0.25)
    params = vq.init(jax.random.PRNGKey(0), jnp.asarray(latents))
    quant, loss = vq.apply(params, jnp.asarray(latents))
    emb = torch.tensor(np.asarray(params["params"]["embedding"]))
    flat = torch.tensor(latents.reshape(-1, D))
    dist = (flat**2).sum(1, keepdim=True) + (emb**2).sum(1) - 2 * flat @ emb.T
    idx = dist.argmin(1)
    tq = emb[idx].reshape(B, S, D)
    tl = torch.tensor(latents)
    commitment = torch.nn.functional.mse_loss(tq.detach(), tl)
    embedding = torch.nn.functional.mse_loss(tq, tl.detach())
    want_loss = commitment * 0.25 + embedding
    # straight-through forward value equals the quantized latents
    np.testing.assert_allclose(np.asarray(quant), tq.numpy(), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(float(loss), float(want_loss), rtol=1e-5)
