"""On-device PCA (reference models/utils.py PCA_svd + torch.pca_lowrank).

Used by the flagship's runtime reduction methods 'pca_svd' and
'pca_lowrank' (reference multilevel_gnn.py:243-256) — the alternative to
the learnable linear projection.  jnp.linalg.svd runs on device; the
randomized variant mirrors torch.pca_lowrank (QR power iterations).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def pca_svd(x: jax.Array, k: int, center: bool = True) -> jax.Array:
    """Project (.., n, d) onto its top-k right singular vectors.

    Mirrors reference models/utils.py:3-16 (centering matrix H, torch.svd,
    x @ V[:, :k]) without the hardcoded .cuda()."""
    if center:
        x = x - x.mean(axis=-2, keepdims=True)
    _, _, vt = jnp.linalg.svd(x, full_matrices=False)
    v = jnp.swapaxes(vt, -1, -2)[..., :k]
    return jnp.matmul(x, v, precision=jax.lax.Precision.HIGHEST)


def pca_lowrank(
    x: jax.Array, k: int, niter: int = 2, center: bool = False,
    rng: jax.Array | None = None,
) -> jax.Array:
    """Randomized PCA projection (torch.pca_lowrank semantics): subspace
    iteration with QR re-orthogonalization, returns x @ V_k."""
    if center:
        x = x - x.mean(axis=-2, keepdims=True)
    d = x.shape[-1]
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    q = jax.random.normal(rng, x.shape[:-2] + (d, k), x.dtype)
    xtx = jnp.matmul(
        jnp.swapaxes(x, -1, -2), x, precision=jax.lax.Precision.HIGHEST
    )
    for _ in range(max(niter, 1)):
        q = jnp.matmul(xtx, q, precision=jax.lax.Precision.HIGHEST)
        q, _ = jnp.linalg.qr(q)
    return jnp.matmul(x, q, precision=jax.lax.Precision.HIGHEST)
