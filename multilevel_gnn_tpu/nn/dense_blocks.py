"""Dense gcn_lib — batched point-cloud graph blocks (DeepGCN legacy).

Re-implements reference models/gcn_lib/dense/ (torch_vertex.py:8-119,
torch_edge.py:6-101, torch_nn.py:10-96) TPU-first.  These are the dense
(B, C, N, 1)-layout DeepGCN point-cloud blocks the multi-omics models never
call — SURVEY §7.4 lists them as legacy — but they are part of the reference
API surface, so they ship as a working module family.

TPU notes: everything here is dense and static-shaped.  The kNN graph is a
pairwise-distance matmul + ``lax.top_k`` (MXU + vector unit); neighbor
gathers are `take_along_axis` on a dense (B, N, k) index — XLA lowers this
to a gather whose VJP is a scatter-add, which is fine OFF the flagship hot
path (these blocks are not reachable from any shipped config; the
scatter-free rule covers the cohort-model compile paths).

Layout: the public surface keeps the reference's channel-first (B, C, N, 1)
tensors for drop-in parity; internally compute is channel-last.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from multilevel_gnn_tpu.nn.basic import xavier_uniform


# ------------------------------------------------------------------ graphs --
def pairwise_distance(x: jnp.ndarray) -> jnp.ndarray:
    """Squared pairwise distances of a point cloud (torch_edge.py:33-43).

    x: (B, N, D) -> (B, N, N).
    """
    inner = -2.0 * jnp.einsum("bnd,bmd->bnm", x, x)
    sq = jnp.sum(x * x, axis=-1, keepdims=True)
    return sq + inner + jnp.swapaxes(sq, 1, 2)


def dense_knn_matrix(x: jnp.ndarray, k: int = 16) -> jnp.ndarray:
    """kNN indices from pairwise distance (torch_edge.py:46-59).

    x: (B, C, N, 1) reference layout -> (2, B, N, k) stacked
    (nn_idx, center_idx); gradients do not flow (lax.stop_gradient, matching
    the reference's torch.no_grad)."""
    pts = jax.lax.stop_gradient(jnp.squeeze(x, -1).transpose(0, 2, 1))  # (B,N,C)
    n = pts.shape[1]
    _, nn_idx = jax.lax.top_k(-pairwise_distance(pts), k)  # (B, N, k)
    center = jnp.broadcast_to(jnp.arange(n)[None, :, None], nn_idx.shape)
    return jnp.stack([nn_idx, center.astype(nn_idx.dtype)], axis=0)


def dense_dilated(edge_index: jnp.ndarray, k: int, dilation: int = 1,
                  stochastic: bool = False, epsilon: float = 0.0,
                  training: bool = False,
                  rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """Dilated neighbor selection (torch_edge.py:6-30): keep every
    ``dilation``-th of the k*dilation neighbors, or a random k-subset with
    probability epsilon in (stochastic, training) mode."""
    if stochastic and training and rng is not None:
        gate_rng, perm_rng = jax.random.split(rng)
        use_random = jax.random.uniform(gate_rng) < epsilon
        randnum = jax.random.permutation(perm_rng, k * dilation)[:k]
        return jnp.where(use_random,
                         edge_index[..., randnum],
                         edge_index[..., ::dilation])
    return edge_index[..., ::dilation]


class DenseDilatedKnnGraph(nn.Module):
    """torch_edge.py:62-76 — kNN over k*dilation then dilated selection."""

    k: int = 9
    dilation: int = 1
    stochastic: bool = False
    epsilon: float = 0.0

    @nn.compact
    def __call__(self, x, training: bool = False):
        edge_index = dense_knn_matrix(x, self.k * self.dilation)
        rng = (self.make_rng("dropout")
               if (self.stochastic and training) else None)
        return dense_dilated(edge_index, self.k, self.dilation,
                             self.stochastic, self.epsilon, training, rng)


def batched_index_select(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Neighbor-feature fetch (torch_nn.py:75-96).

    x: (B, C, N, 1), idx: (B, N, k) -> (B, C, N, k)."""
    pts = jnp.squeeze(x, -1).transpose(0, 2, 1)  # (B, N, C)
    feat = jax.vmap(lambda xb, ib: xb[ib])(pts, idx)  # (B, N, k, C)
    return feat.transpose(0, 3, 1, 2)


# ------------------------------------------------------------------ layers --
def _act(name: str, neg_slope: float = 0.2):
    name = name.lower()
    if name == "relu":
        return jax.nn.relu
    if name == "leakyrelu":
        return lambda h: jax.nn.leaky_relu(h, neg_slope)
    raise NotImplementedError(f"activation [{name}] is not found")


class BasicConv(nn.Module):
    """1x1-conv MLP over (B, C, N, k) with act/norm/drop per layer
    (torch_nn.py:48-72; kaiming-normal conv init, BN gamma 1 / beta 0)."""

    channels: Sequence[int]
    act: Optional[str] = "relu"
    norm: Optional[str] = None
    bias: bool = True
    drop: float = 0.0

    @nn.compact
    def __call__(self, x, training: bool = False):
        h = x.transpose(0, 2, 3, 1)  # NHWC: (B, N, k, C)
        for i, ch in enumerate(self.channels[1:]):
            h = nn.Conv(ch, (1, 1), use_bias=self.bias,
                        kernel_init=nn.initializers.kaiming_normal(),
                        name=f"conv{i}")(h)
            if self.act is not None and self.act.lower() != "none":
                h = _act(self.act)(h)
            if self.norm is not None and self.norm.lower() != "none":
                if self.norm.lower() == "batch":
                    h = nn.BatchNorm(use_running_average=not training,
                                     momentum=0.9, epsilon=1e-5,
                                     name=f"norm{i}")(h)
                elif self.norm.lower() == "instance":
                    # InstanceNorm2d(affine=False): per-sample, per-channel
                    # normalization over the spatial dims
                    mu = h.mean(axis=(1, 2), keepdims=True)
                    var = h.var(axis=(1, 2), keepdims=True)
                    h = (h - mu) * jax.lax.rsqrt(var + 1e-5)
                else:
                    raise NotImplementedError(self.norm)
            if self.drop > 0 and training:
                # torch nn.Dropout2d semantics: drop whole channels per
                # sample — broadcast the mask over the (N, k) spatial dims
                h = nn.Dropout(
                    self.drop, broadcast_dims=(1, 2),
                    deterministic=not training,
                )(h)
        return h.transpose(0, 3, 1, 2)


class MRConv2d(nn.Module):
    """Max-Relative conv, dense layout (torch_vertex.py:8-20)."""

    in_channels: int
    out_channels: int
    act: str = "relu"
    norm: Optional[str] = None
    bias: bool = True

    @nn.compact
    def __call__(self, x, edge_index, training: bool = False):
        x_i = batched_index_select(x, edge_index[1])
        x_j = batched_index_select(x, edge_index[0])
        rel = jnp.max(x_j - x_i, axis=-1, keepdims=True)
        h = jnp.concatenate([x, rel], axis=1)
        return BasicConv([self.in_channels * 2, self.out_channels],
                         self.act, self.norm, self.bias, name="nn")(h, training)


class EdgeConv2d(nn.Module):
    """Edge conv, dense layout (torch_vertex.py:23-35)."""

    in_channels: int
    out_channels: int
    act: str = "relu"
    norm: Optional[str] = None
    bias: bool = True

    @nn.compact
    def __call__(self, x, edge_index, training: bool = False):
        x_i = batched_index_select(x, edge_index[1])
        x_j = batched_index_select(x, edge_index[0])
        h = jnp.concatenate([x_i, x_j - x_i], axis=1)
        h = BasicConv([self.in_channels * 2, self.out_channels],
                      self.act, self.norm, self.bias, name="nn")(h, training)
        return jnp.max(h, axis=-1, keepdims=True)


class GraphConv2d(nn.Module):
    """Static dense graph conv dispatcher (torch_vertex.py:38-53)."""

    in_channels: int
    out_channels: int
    conv: str = "edge"
    act: str = "relu"
    norm: Optional[str] = None
    bias: bool = True

    @nn.compact
    def __call__(self, x, edge_index, training: bool = False):
        kw = dict(act=self.act, norm=self.norm, bias=self.bias, name="gconv")
        if self.conv == "edge":
            return EdgeConv2d(self.in_channels, self.out_channels, **kw)(
                x, edge_index, training)
        if self.conv == "mr":
            return MRConv2d(self.in_channels, self.out_channels, **kw)(
                x, edge_index, training)
        raise NotImplementedError(f"conv:{self.conv} is not supported")


class DynConv2d(nn.Module):
    """Dynamic dense graph conv (torch_vertex.py:56-74): recompute the kNN
    graph from features when no edge_index is given."""

    in_channels: int
    out_channels: int
    kernel_size: int = 9
    dilation: int = 1
    conv: str = "edge"
    act: str = "relu"
    norm: Optional[str] = None
    bias: bool = True
    stochastic: bool = False
    epsilon: float = 0.0

    @nn.compact
    def __call__(self, x, edge_index=None, training: bool = False):
        if edge_index is None:
            edge_index = DenseDilatedKnnGraph(
                self.kernel_size, self.dilation, self.stochastic,
                self.epsilon, name="dilated_knn_graph")(x, training)
        return GraphConv2d(self.in_channels, self.out_channels, self.conv,
                           self.act, self.norm, self.bias, name="body")(
            x, edge_index, training)


class PlainDynBlock2d(nn.Module):
    """torch_vertex.py:77-87."""

    in_channels: int
    kernel_size: int = 9
    dilation: int = 1
    conv: str = "edge"
    act: str = "relu"
    norm: Optional[str] = None
    bias: bool = True
    stochastic: bool = False
    epsilon: float = 0.0

    @nn.compact
    def __call__(self, x, edge_index=None, training: bool = False):
        return DynConv2d(self.in_channels, self.in_channels, self.kernel_size,
                         self.dilation, self.conv, self.act, self.norm,
                         self.bias, self.stochastic, self.epsilon,
                         name="body")(x, edge_index, training)


class ResDynBlock2d(nn.Module):
    """torch_vertex.py:90-103 — residual with res_scale."""

    in_channels: int
    kernel_size: int = 9
    dilation: int = 1
    conv: str = "edge"
    act: str = "relu"
    norm: Optional[str] = None
    bias: bool = True
    stochastic: bool = False
    epsilon: float = 0.0
    res_scale: float = 1.0

    @nn.compact
    def __call__(self, x, edge_index=None, training: bool = False):
        out = DynConv2d(self.in_channels, self.in_channels, self.kernel_size,
                        self.dilation, self.conv, self.act, self.norm,
                        self.bias, self.stochastic, self.epsilon,
                        name="body")(x, edge_index, training)
        return out + x * self.res_scale


class DenseDynBlock2d(nn.Module):
    """torch_vertex.py:106-119 — densely-connected (concat) block."""

    in_channels: int
    out_channels: int = 64
    kernel_size: int = 9
    dilation: int = 1
    conv: str = "edge"
    act: str = "relu"
    norm: Optional[str] = None
    bias: bool = True
    stochastic: bool = False
    epsilon: float = 0.0

    @nn.compact
    def __call__(self, x, edge_index=None, training: bool = False):
        dense = DynConv2d(self.in_channels, self.out_channels,
                          self.kernel_size, self.dilation, self.conv,
                          self.act, self.norm, self.bias, self.stochastic,
                          self.epsilon, name="body")(x, edge_index, training)
        return jnp.concatenate([x, dense], axis=1)
