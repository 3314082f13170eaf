"""MultilevelGNN — the flagship model (all three shipped cohort configs).

Re-implements reference models/multilevel_gnn.py:14-394 TPU-first:

  * input outer-product node embedding        (ref :150-151)
  * GNN stack (sage by default) w/ res/dense/repeat-mask modes (:184-204)
  * value-attention merge x * mask            (:205-211)
  * gene -> PCA-row gather w/ -1 handling     (:212-217)
  * learnable-PCA pathway contraction         (:221-240) as MXU matmuls
    (ops/pathway.py) instead of scatter_reduce
  * pathway reorder, 1x1-conv stack, MaxPool, age concat, softmax head
    (:241-291)
  * feature losses: batch-std log loss + per-pathway PCA column
    cosine-independence loss (:329-348) — including the reference's
    detached-params and inner-loop-indentation quirks, preserved for parity.

Everything is batched over patients with a single shared fold topology
(FoldContext); shapes are fully static per fold.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from multilevel_gnn_tpu.core.batch import Batch, FoldContext
from multilevel_gnn_tpu.core.config import Config
from multilevel_gnn_tpu.nn.basic import Linear, act, xavier_uniform
from multilevel_gnn_tpu.nn.conv import GraphConvLayer
from multilevel_gnn_tpu.ops import segment as seg_ops
from multilevel_gnn_tpu.ops.pathway import pathway_contract, slots_to_image


def _node_embedding_init(cfg: Config):
    t = cfg.embedding_init_type

    def init(key, shape, dtype=jnp.float32):
        if t == "xavier":
            return xavier_uniform(key, shape, dtype)
        if t == "ones":
            return jnp.ones(shape, dtype)
        if t == "constant":
            return jnp.full(shape, cfg.emb_val, dtype)
        # "uniform" and the torch.rand fallback are both U[0,1)
        return jax.random.uniform(key, shape, dtype)

    return init


def _pca_param_init(cfg: Config):
    def init(key, shape, dtype=jnp.float32):
        if cfg.pca_init_type is None:
            return xavier_uniform(key, shape, dtype)
        if cfg.pca_init_type == "orthogonal":
            return jax.nn.initializers.orthogonal()(key, shape, dtype)
        # "normal" keeps the torch.rand U[0,1) data (reference :80-81)
        return jax.random.uniform(key, shape, dtype)

    return init


class ConvHead(nn.Module):
    """PathCNN-style head: 1x1/kxk conv stack + MaxPool + dropout + flatten
    + age concat + MLP softmax (reference multilevel_gnn.py:98-128,262-291).

    Input image is (B, C, P, W) [NCHW as in torch]; convs run NHWC
    internally (TPU-native layout) and the flatten is NCHW row-major so the
    head weights line up with the reference."""

    cfg: Config
    in_channels: int

    @nn.compact
    def __call__(self, x, age, training: bool = False):
        cfg = self.cfg
        if cfg.pca_prelinear:
            # small MLP on the 3K feature dim before the conv stack
            # (reference :85-92, :259-260)
            d = x.shape[-1]
            z = Linear(32, kernel_init=xavier_uniform, name="pre_0")(x)
            z = jax.nn.relu(z)
            z = Linear(32, kernel_init=xavier_uniform, name="pre_1")(z)
            z = jax.nn.relu(z)
            x = Linear(d, kernel_init=xavier_uniform, name="pre_2")(z)
        h = jnp.transpose(x, (0, 2, 3, 1))  # NCHW -> NHWC
        for out_ch, k in zip(cfg.conv_channel_list, cfg.conv_kernel_list):
            h = nn.Conv(
                out_ch,
                kernel_size=(k, k),
                padding=[(k // 2, k // 2), (k // 2, k // 2)],
                kernel_init=xavier_uniform,
            )(h)
            h = jax.nn.relu(h)
        if cfg.only_mrna_pred:
            # MultilevelGNNSeq head (reference multilevel_gnn_seq.py:61-64):
            # keep only the first two PCA columns (the hardcoded `:2` slice
            # assumes pca_dim==2, preserved), pool, flatten — NO feature
            # dropout and NO pre_linear on this branch.  The reference head
            # width formula (:36-38) is only self-consistent at pca_dim==2;
            # our shape-lazy Linear derives it from the actual flatten.
            h = h[:, :, :2, :]
            h = nn.max_pool(
                h,
                window_shape=(cfg.pathway_pool_dim, cfg.pca_pool_dim),
                strides=(cfg.pathway_pool_dim, cfg.pca_pool_dim),
            )
            h = jnp.transpose(h, (0, 3, 1, 2))  # NCHW flatten parity
            h = h.reshape(h.shape[0], -1)
        else:
            if len(cfg.used_omics) != 3:
                cols = []
                for i in cfg.used_omics:
                    ii = int(i)
                    cols.extend(range(ii * cfg.pca_dim, (ii + 1) * cfg.pca_dim))
                h = h[:, :, jnp.asarray(cols), :]
            h = nn.max_pool(
                h,
                window_shape=(cfg.pathway_pool_dim, cfg.pca_pool_dim),
                strides=(cfg.pathway_pool_dim, cfg.pca_pool_dim),
            )
            drop_rate = 0.25 if cfg.feature_drop else 0.0
            if drop_rate > 0:
                h = nn.Dropout(drop_rate, deterministic=not training)(h)
            h = jnp.transpose(h, (0, 3, 1, 2))  # back to NCHW for flatten parity
            h = h.reshape(h.shape[0], -1)
        if cfg.use_age:
            h = jnp.concatenate([h, age[:, None]], axis=-1)
        h = Linear(cfg.head_dim, kernel_init=xavier_uniform, name="head_0")(h)
        h = jax.nn.relu(h)
        h = nn.Dropout(cfg.head_drop_rate, deterministic=not training)(h)
        h = Linear(2, kernel_init=xavier_uniform, name="head_1")(h)
        return jax.nn.softmax(h, axis=-1)


class MultilevelGNN(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(
        self,
        batch: Batch,
        ctx: FoldContext,
        training: bool = False,
    ) -> Tuple[jax.Array, jax.Array]:
        image, pca_feature = self.encode(batch, ctx, training)
        pred = ConvHead(self.cfg, self.cfg.final_channels, name="conv_head")(
            image, batch.age, training
        )
        return pred, pca_feature

    def gnn_stack(
        self, x, mask_x, ctx: FoldContext, training: bool,
        apply_value_mask: bool = True, suffix: str = "",
    ):
        """Shared GNN trunk (reference :184-211). x: (B, NODES, D).
        apply_value_mask=False for the AE/VAE encoders, which skip the
        value-attention merge (reference autoencoder.py:97-103)."""
        cfg = self.cfg
        edge_attr = ctx.graph.edge_attr if cfg.weighted_edge else None
        # mixed precision (cfg.compute_dtype='bfloat16'): trunk activations
        # and conv compute in bf16, params/aggregation accumulators f32
        cdt = (
            jnp.bfloat16
            if cfg.compute_dtype in ("bfloat16", "bf16")
            else None
        )
        if cdt is not None:
            x = x.astype(cdt)
            mask_x = mask_x.astype(cdt)
        emb_dim = x.shape[-1]
        # reference :66-71 builds first + (num_layers-2) middles + last, so
        # num_layers<=2 still yields two blocks
        dims = (
            [(emb_dim, cfg.hidden_channels)]
            + [(cfg.hidden_channels, cfg.hidden_channels)]
            * max(cfg.num_layers - 2, 0)
            + [(cfg.hidden_channels, cfg.final_channels)]
        )
        n_layers = len(dims)
        layers = [
            GraphConvLayer(
                in_ch,
                out_ch,
                conv=cfg.gnn_name,
                act_type=cfg.gnn_act,
                norm=cfg.gnn_last_norm if i == n_layers - 1 else None,
                heads=cfg.final_head if i == n_layers - 1 else 8,
                mlp_norm=cfg.gnn_mlp_norm,
                drop=cfg.gnn_dropout,
                dtype=cdt,
                name=f"gnn_{i}{suffix}",
            )
            for i, (in_ch, out_ch) in enumerate(dims)
        ]
        if cfg.edge_type == "merge" and ctx.graph2 is not None:
            # edge-list merge mode (reference :170-182): the SAME stack
            # (shared weights) runs once per graph, UNWEIGHTED (the
            # reference's list branch calls layer(x, edge_index) without
            # edge_attr) and WITHOUT the per-layer residual/repeat-mask
            # logic; per-graph features are concatenated (head width
            # doubles downstream — the reference mutates
            # args.final_channels *= 2 only for the conv-head dims, which
            # our shape-lazy head derives automatically)
            feats = []
            for g in (ctx.graph, ctx.graph2):
                h = x
                for layer in layers:
                    h = layer(h, g, None, training)
                feats.append(h)
            x = jnp.concatenate(feats, axis=-1)
            if cfg.value_att_mask and apply_value_mask:
                if cfg.merge_mode == "mult":
                    x = x * mask_x[..., None]
                else:
                    x = cfg.add_coef1 * x + cfg.add_coef2 * mask_x[..., None]
            return x
        feature_list = []
        for i, layer in enumerate(layers):
            if cfg.dense_gnn:
                x = layer(x, ctx.graph, edge_attr, training)
                feature_list.append(x)
            elif cfg.resgnn:
                x = layer(x, ctx.graph, edge_attr, training) + x
            else:
                x = layer(x, ctx.graph, edge_attr, training)
            if (
                i + 1 != n_layers
                and cfg.repeat_mask
                and (i + 1) % cfg.repeat_cyclic == 0
            ):
                if cfg.repeat_norm:
                    # norm stats in f32 under a reduced compute dtype
                    n2 = jnp.sqrt(
                        (x.astype(jnp.float32) ** 2).sum(-1)
                    )[..., None]
                    x = (x / n2.astype(x.dtype)).astype(x.dtype)
                x = x * mask_x[..., None]
        if cfg.dense_gnn:
            x = jnp.concatenate(feature_list, axis=-1)
        if cfg.value_att_mask and apply_value_mask:
            if cfg.merge_mode == "mult":
                x = x * mask_x[..., None]
            else:  # 'add' and 'cat' are the same op in the reference (:208-211)
                x = cfg.add_coef1 * x + cfg.add_coef2 * mask_x[..., None]
        return x

    def gather_pca_rows(self, x, ctx: FoldContext):
        """Gene -> PCA-row gather with torch negative-index semantics for
        missing (-1) entries (reference :212-217).  On the pallas backend
        the gather's backward is a Pallas segment-sum (scatter-free)."""
        from multilevel_gnn_tpu.ops import spmm

        cfg = self.cfg
        nodes = x.shape[-2]
        match = ctx.gene_pca_match
        idx = jnp.where(match >= 0, match, nodes + match)
        if spmm.get_backend() == "pallas" and ctx.pca_gather_seg is not None:
            xg = spmm.gather_rows(x, idx, ctx.pca_gather_seg)
        else:
            xg = jnp.take(x, idx, axis=-2)
        if cfg.pca_match_mask:
            xg = xg * (match >= 0).astype(x.dtype)[:, None]
        return xg

    def learnable_pca_image(self, xg, ctx: FoldContext):
        """Learnable-PCA contraction into the (B, C, P, 3K) pathway image
        (reference :221-240)."""
        cfg = self.cfg
        pca_params = self.param(
            "learnable_pca_params",
            _pca_param_init(cfg),
            (ctx.num_pca_rows, cfg.pca_dim),
        )
        if cfg.freeze_pca_weight:
            pca_params = jax.lax.stop_gradient(pca_params)
        p = pca_params * ctx.info_mask if cfg.mutual_info_mask else pca_params
        if not cfg.mutual_info_mask:
            # reference :231-236: without the MI mask the masked product is
            # still used unless final_channels == 1
            if cfg.final_channels != 1:
                p = pca_params * ctx.info_mask
        n_slots = 3 * cfg.pathway_num
        method = "segment" if cfg.kernel_backend == "xla_segment" else "matmul"
        out = pathway_contract(xg, p, ctx.raw_indice, n_slots, method=method)
        image = slots_to_image(out, cfg.pathway_num)
        if cfg.reorder_pathway:
            from multilevel_gnn_tpu.ops.spmm import permute_take

            image = permute_take(image, ctx.reorder_idxs, 2)
        return image, pca_params

    def encode(self, batch: Batch, ctx: FoldContext, training: bool = False):
        cfg = self.cfg
        mask_x = batch.x  # (B, NODES)
        x = batch.x
        if cfg.input_drop is not None:
            x = nn.Dropout(cfg.input_drop, deterministic=not training)(x)
        if cfg.node_embedding:
            emb = self.param(
                "node_embedding",
                _node_embedding_init(cfg),
                (ctx.graph.n_nodes, cfg.node_embedding_dim),
            )
            if cfg.freeze_node_embedding:
                emb = jax.lax.stop_gradient(emb)
            h = x[..., None] * emb  # (B, NODES, D)
        else:
            h = x[..., None]
        if cfg.input_emb_drop is not None:
            h = nn.Dropout(cfg.input_emb_drop, deterministic=not training)(h)
        h = self.gnn_stack(h, mask_x, ctx, training)
        xg = self.gather_pca_rows(h, ctx)
        if cfg.reduction_method == "linear_projection":
            image, _ = self.learnable_pca_image(xg, ctx)
        else:
            image = self.runtime_pca_image(xg, ctx)
        # head + losses stay f32 regardless of the trunk compute dtype
        image = image.astype(jnp.float32)
        return image, image

    def runtime_pca_image(self, xg, ctx: FoldContext):
        """On-device per-slot PCA reduction (reference :243-256,
        reduction_method 'pca_svd' / 'pca_lowrank').  Slot extents come from
        the static cfg.slot_sizes."""
        from multilevel_gnn_tpu.ops.pca import pca_lowrank, pca_svd

        cfg = self.cfg
        assert cfg.slot_sizes is not None, (
            "runtime PCA reduction needs cfg.slot_sizes "
            "(set from Cohort.slot_sizes())"
        )
        x = jnp.transpose(xg, (2, 0, 1))  # (C, B, G) — reference permute
        outs = []
        start = 0
        for ns in cfg.slot_sizes:
            sl = x[:, :, start : start + ns]
            start += ns
            if ns == 0:
                outs.append(jnp.zeros(x.shape[:2] + (cfg.pca_dim,), x.dtype))
                continue
            if cfg.reduction_method == "pca_lowrank":
                k = min(cfg.pca_dim, ns)
                red = pca_lowrank(sl, k, niter=cfg.pca_lowrank_niter)
            else:
                k = min(cfg.pca_dim, ns)
                red = pca_svd(sl, k, center=False)
            if k < cfg.pca_dim:
                red = jnp.pad(red, ((0, 0), (0, 0), (0, cfg.pca_dim - k)))
            outs.append(red)
        stacked = jnp.stack(outs)  # (S, C, B, K)
        out = jnp.transpose(stacked, (2, 1, 0, 3))  # (B, C, S, K)
        return out.reshape(
            out.shape[0], out.shape[1], cfg.pathway_num, 3 * cfg.pca_dim
        )


def get_feature_loss(
    pca_params: jax.Array,
    ctx: FoldContext,
    pca_feature: jax.Array,
    cfg: Config,
    sample_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Auxiliary losses (reference multilevel_gnn.py:329-348).

    pca_loss: -coef * log(mean(std_batch(features)))  [std over batch, ddof=1]
    pca_indep_loss: mean |cos| between learnable-PCA columns per pathway
    slot.  Reference quirks preserved: params are *detached* (``.data``), so
    this term carries no gradient, and the inner accumulation only adds the
    last-j term of each i (indentation bug at :345).
    """
    loss = jnp.asarray(0.0, jnp.float32)
    if cfg.pca_loss:
        b = pca_feature.shape[0]
        flat = pca_feature.reshape(b, -1)
        if sample_mask is not None:
            nb = jnp.maximum(sample_mask.sum(), 2.0)
            mean = (flat * sample_mask[:, None]).sum(0) / nb
            var = ((flat - mean) ** 2 * sample_mask[:, None]).sum(0) / (nb - 1.0)
            std = jnp.sqrt(var)
        else:
            std = jnp.std(flat, axis=0, ddof=1)
        loss = loss - cfg.pca_loss_coef * jnp.log(jnp.mean(std))
    if cfg.pca_indep_loss:
        from multilevel_gnn_tpu.ops.pathway import slot_onehot

        p = jax.lax.stop_gradient(pca_params * ctx.info_mask)
        n_slots = 3 * cfg.pathway_num
        # segment-sums over pathway slots as one-hot matmuls (S is small;
        # avoids XLA scatter, whose TPU compile is pathological)
        M = slot_onehot(ctx.raw_indice, n_slots)  # (S, G)
        indep = jnp.asarray(0.0, jnp.float32)
        count = 0
        for i in range(cfg.pca_dim - 1):
            mul_res = len_res = None
            for j in range(i + 1, cfg.pca_dim):
                count += 1
                mul_res = M @ (p[:, i] * p[:, j])
                len_res = jnp.sqrt((M @ (p[:, i] ** 2)) * (M @ (p[:, j] ** 2)))
            indep = indep + jnp.mean(jnp.abs(mul_res / (len_res + 1e-7)))
        loss = loss + indep / count
    return loss


def init_precise_orthogonal(
    pca_params: "np.ndarray",
    pathway_indexs: "np.ndarray",
    info_mask: "np.ndarray",
    rng: Optional["np.random.RandomState"] = None,
):
    """Per-pathway-slot orthogonal init of the learnable PCA rows
    (reference multilevel_gnn.py:313-327): within each slot, orthogonalize
    the MI-selected rows and rescale them to the global orthogonal-init
    mean magnitude.  Host-side numpy; returns the new (G, K) array."""
    import numpy as np

    rng = rng or np.random.RandomState(0)
    p = np.asarray(pca_params).copy()
    G, K = p.shape

    def orth(shape):
        a = rng.randn(*shape)
        if shape[0] < shape[1]:
            q, _ = np.linalg.qr(a.T)
            return q.T[: shape[0], : shape[1]]
        q, _ = np.linalg.qr(a)
        return q[: shape[0], : shape[1]]

    t_mean = np.abs(orth((G, K))).mean()
    seg = np.asarray(pathway_indexs)
    mask = np.asarray(info_mask).reshape(-1)
    for s in np.unique(seg):
        idx = np.where((seg == s) & (mask > 0))[0]
        if len(idx) == 0:
            continue
        block = orth((len(idx), K))
        scale = t_mean / max(np.abs(block).mean(), 1e-12)
        p[idx] = block * scale
    return p


def collect_scalar_params(params) -> dict:
    """Learnable aggregation scalars for logging (reference
    deepergcn.py:325-349 print_params): {path: value} for t / p / y /
    msg_scale leaves."""
    import flax

    out = {}
    for path, leaf in flax.traverse_util.flatten_dict(params).items():
        if path[-1] in ("t", "p", "y", "msg_scale"):
            out["/".join(path)] = float(jnp.asarray(leaf).reshape(-1)[0])
    return out


def seed_pca_params(params, pca_seed: jax.Array):
    """Replace the learnable PCA leaf with the sklearn-seeded value
    (reference set_pca_params, multilevel_gnn.py:301-308)."""
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    for path in list(flat):
        if path[-1] == "learnable_pca_params":
            assert flat[path].shape == pca_seed.shape, (
                flat[path].shape,
                pca_seed.shape,
            )
            flat[path] = jnp.asarray(pca_seed)
    return flax.traverse_util.unflatten_dict(flat)
