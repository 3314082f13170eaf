"""PathCNN — the no-GNN baseline (reference models/pathcnn.py:13-263).

Learnable-PCA applied directly to the raw mean-centered omics values
(batch.raw_data, (B, G)), contracted into the (B, 1, P, 3K) pathway image,
then Conv2d(1->32->64, k=pathcnn_kernel_size) + MaxPool + dropout + age
concat + softmax head.  Without learnable_pca, consumes precomputed pathway
PCA attrs (batch.raw_data reshaped image, reference :105).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from multilevel_gnn_tpu.core.batch import Batch, FoldContext
from multilevel_gnn_tpu.core.config import Config
from multilevel_gnn_tpu.models.multilevel_gnn import _pca_param_init
from multilevel_gnn_tpu.nn.basic import Linear, xavier_uniform
from multilevel_gnn_tpu.ops.pathway import pathway_contract, slots_to_image


class PathCNN(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(self, batch: Batch, ctx: FoldContext, training: bool = False):
        cfg = self.cfg
        K = cfg.pca_dim
        P = cfg.pathway_num
        if cfg.learnable_pca:
            raw = batch.raw_data  # (B, G)
            pca_params = self.param(
                "learnable_pca_params",
                _pca_param_init(cfg),
                (ctx.num_pca_rows, K),
            )
            p = pca_params * ctx.info_mask if cfg.mutual_info_mask else pca_params
            out = pathway_contract(raw[..., None], p, ctx.raw_indice, 3 * P)
            x = slots_to_image(out, P)  # (B, 1, P, 3K)
        else:
            # non-learnable path: batch.raw_data must carry the precomputed
            # per-pathway PCA attrs (B, P, 3K) (reference pathcnn.py:105
            # input_batch.pathway_node_attr -> FoldData.pathway_node_attr)
            x = batch.raw_data.reshape(-1, 1, P, K * 3)
        pca_feature = x

        h = jnp.transpose(x, (0, 2, 3, 1))  # NHWC
        k = cfg.pathcnn_kernel_size
        pad = [(k // 2, k // 2), (k // 2, k // 2)]
        h = nn.Conv(32, (k, k), padding=pad, kernel_init=xavier_uniform,
                    name="conv1")(h)
        h = jax.nn.relu(h)
        if cfg.more_conv:
            for i, ch in enumerate([64, 64, 64]):
                h = nn.Conv(ch, (k, k), padding=pad, kernel_init=xavier_uniform,
                            name=f"conv2_{i}")(h)
                if i < 2:
                    h = jax.nn.relu(h)
        else:
            h = nn.Conv(64, (k, k), padding=pad, kernel_init=xavier_uniform,
                        name="conv2")(h)
        h = jax.nn.relu(h)
        h = nn.max_pool(
            h,
            window_shape=(cfg.pathway_pool_dim, cfg.pca_pool_dim),
            strides=(cfg.pathway_pool_dim, cfg.pca_pool_dim),
        )
        h = nn.Dropout(0.25, deterministic=not training)(h)
        h = jnp.transpose(h, (0, 3, 1, 2)).reshape(h.shape[0], -1)
        h = jnp.concatenate([h, batch.age[:, None]], axis=-1)
        h = Linear(cfg.head_dim, kernel_init=xavier_uniform, name="head_0")(h)
        h = jax.nn.relu(h)
        h = nn.Dropout(0.5, deterministic=not training)(h)
        h = Linear(2, kernel_init=xavier_uniform, name="head_1")(h)
        return jax.nn.softmax(h, axis=-1), pca_feature
