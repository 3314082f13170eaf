"""DiffPool — dense soft-assignment hierarchical coarsening.

Re-implements reference models/diff_pooling.py:11-133 as batched dense XLA
matmuls (MXU-native): DenseSAGEConv stacks with BatchNorm+residual,
assignment S via softmax, pooled X' = S^T X and A' = S^T A S contractions,
link-prediction ||A - S S^T||_F and assignment-entropy losses, multi-level
0.25 coarse factor (0.1 for a single level).

Used standalone and as the pooling head inside VAE/VQ-VAE fine-tuning
(reference vae.py:238-254); levels are tiny (146 -> 37 -> 10), so everything
stays dense and replicated on-mesh.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from multilevel_gnn_tpu.core.config import Config
from multilevel_gnn_tpu.nn.basic import BatchNorm1d, torch_linear_init


class DenseSAGEConv(nn.Module):
    """PyG DenseSAGEConv: lin_rel(mean_adj(x)) + lin_root(x), L2 normalize."""

    features: int
    normalize: bool = True

    @nn.compact
    def __call__(self, x, adj):
        # x: (B, N, C); adj: (N, N) or (B, N, N)
        agg = jnp.matmul(adj, x, precision=jax.lax.Precision.HIGHEST)
        deg = jnp.clip(adj.sum(-1, keepdims=True), 1.0, None)
        agg = agg / deg
        out = nn.Dense(
            self.features, kernel_init=torch_linear_init, name="lin_rel"
        )(agg) + nn.Dense(
            self.features, kernel_init=torch_linear_init, name="lin_root"
        )(x)
        if self.normalize:
            out = out / jnp.clip(
                jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12, None
            )
        return out


class SAGEConvolutions(nn.Module):
    """reference diff_pooling.py:11-46: (num_layers-1) x [conv+BN+residual]
    + final conv without BN/act."""

    num_layers: int
    out_channels: int
    residual: bool = True

    @nn.compact
    def __call__(self, x, adj, training: bool = False):
        for i in range(self.num_layers - 1):
            x_new = jax.nn.relu(
                DenseSAGEConv(self.out_channels, name=f"conv_{i}")(x, adj)
            )
            x_new = BatchNorm1d(self.out_channels, name=f"bn_{i}")(
                x_new, training
            )
            if self.residual and x.shape == x_new.shape:
                x = x + x_new
            else:
                x = x_new
        return DenseSAGEConv(
            self.out_channels, name=f"conv_{self.num_layers - 1}"
        )(x, adj)


def dense_diff_pool(x, adj, s, eps: float = 1e-15):
    """PyG dense_diff_pool: softmax assignment, pooled feats/adj + losses."""
    s = jax.nn.softmax(s, axis=-1)  # (B, N, K)
    st = jnp.swapaxes(s, -1, -2)
    out = jnp.matmul(st, x, precision=jax.lax.Precision.HIGHEST)
    if adj.ndim == 2:
        adj_b = jnp.broadcast_to(adj, (s.shape[0],) + adj.shape)
    else:
        adj_b = adj
    out_adj = jnp.matmul(
        jnp.matmul(st, adj_b, precision=jax.lax.Precision.HIGHEST),
        s,
        precision=jax.lax.Precision.HIGHEST,
    )
    link = adj_b - jnp.matmul(s, st, precision=jax.lax.Precision.HIGHEST)
    link_loss = jnp.sqrt(jnp.sum(link**2)) / adj_b.size
    ent_loss = jnp.mean(jnp.sum(-s * jnp.log(s + eps), axis=-1))
    return out, out_adj, link_loss, ent_loss


class DiffPoolLayer(nn.Module):
    dim_embedding: int
    no_new_clusters: int

    @nn.compact
    def __call__(self, x, adj, training: bool = False):
        s = SAGEConvolutions(1, self.no_new_clusters, name="gnn_pool")(
            x, adj, training
        )
        x = SAGEConvolutions(1, self.dim_embedding, name="gnn_embed")(
            x, adj, training
        )
        return dense_diff_pool(x, adj, s)


class DiffPool(nn.Module):
    """reference diff_pooling.py:68-133 multi-level stack.

    __call__(x (B, N, C), adj (N, N)) -> (x_coarse, link_loss, ent_loss)."""

    cfg: Config
    num_features: int
    max_num_nodes: int
    num_layers: int
    gnn_hidden_dim: int
    gnn_output_dim: int

    @nn.compact
    def __call__(self, x, adj, training: bool = False):
        coarse = 0.1 if self.num_layers == 1 else 0.25
        no_new = math.ceil(coarse * self.max_num_nodes)
        l_total = e_total = 0.0
        for i in range(self.num_layers):
            out_dim = (
                self.gnn_output_dim
                if i == self.num_layers - 1
                else self.gnn_hidden_dim
            )
            x, adj, l, e = DiffPoolLayer(
                out_dim, no_new, name=f"diffpool_{i}"
            )(x, adj, training)
            x = SAGEConvolutions(
                self.cfg.after_pooling_layer, out_dim, name=f"after_pool_{i}"
            )(x, adj, training)
            l_total += l
            e_total += e
            no_new = math.ceil(no_new * coarse)
        return x, l_total, e_total
