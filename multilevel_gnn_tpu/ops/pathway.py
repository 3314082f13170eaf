"""Learnable-PCA pathway contraction.

The hot op of the flagship model (reference multilevel_gnn.py:221-240):

    out[b, c, s, k] = sum_{g : seg[g]=s}  xg[b, g, c] * P[g, k]

i.e. a segment-wise rank-K contraction of gene embeddings into pathway-omics
slots.  The reference implements it as a materialized (B, C, G, K) elementwise
product + ``scatter_reduce``; on TPU we instead run K MXU matmuls against a
slot-assignment one-hot matrix M (S, G) weighted by the learnable column
P[:, k] — no (B,G,C,K) intermediate in HBM, and the contraction rides the
systolic array.  A segment-sum variant is kept as the correctness oracle.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from multilevel_gnn_tpu.ops import segment as seg_ops


def slot_onehot(seg_ids: jax.Array, num_slots: int) -> jax.Array:
    """(S, G) one-hot assignment matrix; rows = slots, cols = PCA rows."""
    return (
        jax.nn.one_hot(seg_ids, num_slots, dtype=jnp.float32).T
    )  # (S, G)


def pathway_contract(
    xg: jax.Array,
    pca_params: jax.Array,
    seg_ids: jax.Array,
    num_slots: int,
    method: str = "matmul",
    onehot: jax.Array | None = None,
) -> jax.Array:
    """xg: (B, G, C); pca_params: (G, K) (already masked); returns (B, C, S, K)."""
    B, G, C = xg.shape
    K = pca_params.shape[-1]
    if method == "segment":
        prod = xg[..., None] * pca_params[:, None, :]  # (B, G, C, K)
        out = seg_ops.segment_sum(prod, seg_ids, num_slots, axis=1)  # (B,S,C,K)
        return jnp.transpose(out, (0, 2, 1, 3))
    if method == "matmul":
        M = onehot if onehot is not None else slot_onehot(seg_ids, num_slots)
        outs = []
        for k in range(K):
            # static slice, NOT int-index take: take's transpose is an XLA
            # scatter (the banned op class); a slice transposes to pad
            Pk = jax.lax.slice_in_dim(pca_params, k, k + 1, axis=1)  # (G, 1)
            Wk = M * Pk.T  # (S, G)
            outs.append(
                jnp.einsum(
                    "sg,bgc->bcs", Wk, xg, preferred_element_type=jnp.float32
                )
            )
        return jnp.stack(outs, axis=-1)  # (B, C, S, K)
    raise ValueError(method)


def slots_to_image(out: jax.Array, n_pathways: int) -> jax.Array:
    """(B, C, 3*P, K) -> (B, C, P, 3K): pathway-major slot layout folded into
    the PathCNN image (reference multilevel_gnn.py:239 reshape)."""
    B, C, S, K = out.shape
    assert S == 3 * n_pathways, (S, n_pathways)
    return out.reshape(B, C, n_pathways, 3 * K)
