"""KNN graph construction (reference models/gcn_lib/sparse/torch_edge.py).

The reference uses torch_cluster's CUDA knn_graph with a matrix fallback
(torch_edge.py:53-91: pairwise distances + topk, optional dilation with
stochastic sampling).  On TPU the matrix form IS the fast path: one MXU
matmul for pairwise distances + jax.lax.top_k.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def pairwise_sq_dists(x: jax.Array) -> jax.Array:
    """(.., N, D) -> (.., N, N) squared euclidean distances (matmul form)."""
    x2 = jnp.sum(x**2, axis=-1)
    inner = jnp.einsum(
        "...nd,...md->...nm", x, x, preferred_element_type=jnp.float32
    )
    return x2[..., :, None] - 2.0 * inner + x2[..., None, :]


def knn_graph(
    x: jax.Array,
    k: int,
    dilation: int = 1,
    stochastic: bool = False,
    epsilon: float = 0.0,
    rng: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Dilated KNN edges (reference torch_edge.py:66-91 knn_matrix).

    x: (N, D) or (B, N, D).  Returns (senders, receivers) each (.., N*k):
    for node i, its k nearest (after dilation) as senders, i as receiver.
    stochastic+rng: sample k of k*dilation neighbors w.p. epsilon (training
    trick from the reference DilatedKnnGraph, torch_edge.py:14-40).
    """
    d = pairwise_sq_dists(x)
    big = jnp.asarray(jnp.finfo(d.dtype).max, d.dtype)
    n = x.shape[-2]
    eye = jnp.eye(n, dtype=bool)
    d = jnp.where(eye, big, d)  # exclude self
    kk = k * dilation
    _, idx = jax.lax.top_k(-d, kk)  # (.., N, k*dilation) nearest first
    if dilation > 1:
        if stochastic and rng is not None:
            r1, r2 = jax.random.split(rng)
            choice = jax.random.permutation(r1, kk)[:k]
            rand_idx = jnp.take(idx, choice, axis=-1)
            det_idx = idx[..., ::dilation]
            use_rand = jax.random.uniform(r2, ()) < epsilon
            idx = jnp.where(use_rand, rand_idx, det_idx)
        else:
            idx = idx[..., ::dilation]
    else:
        idx = idx[..., :k]
    recv = jnp.broadcast_to(
        jnp.arange(n)[..., :, None], idx.shape
    )
    return idx.reshape(*idx.shape[:-2], -1), recv.reshape(*recv.shape[:-2], -1)
