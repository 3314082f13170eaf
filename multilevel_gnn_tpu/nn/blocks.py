"""Dynamic-graph conv + residual/dense blocks
(reference torch_vertex.py:366-451: DynConv, Plain/Res/DenseDynBlock,
Res/DenseGraphBlock).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from multilevel_gnn_tpu.core.graph import Graph
from multilevel_gnn_tpu.nn.conv import GraphConvLayer, dynamic_graph
from multilevel_gnn_tpu.ops.knn import knn_graph


class DynConv(nn.Module):
    """Dynamic graph conv: rebuild a dilated KNN graph from the current
    features each call (reference torch_vertex.py:366-380)."""

    in_channels: int
    out_channels: int
    kernel_size: int = 9
    dilation: int = 1
    conv: str = "edge"
    act_type: str = "relu"
    norm: Optional[str] = None
    heads: int = 8

    @nn.compact
    def __call__(self, x, graph: Optional[Graph] = None, training=False):
        if graph is None:
            assert x.ndim == 2, "dynamic knn expects unbatched (N, C)"
            send, recv = knn_graph(x, self.kernel_size, self.dilation)
            graph = dynamic_graph(send, recv, x.shape[0])
        return GraphConvLayer(
            self.in_channels, self.out_channels, self.conv, self.act_type,
            self.norm, heads=self.heads, name="body",
        )(x, graph, None, training)


class ResDynBlock(nn.Module):
    channels: int
    kernel_size: int = 9
    dilation: int = 1
    conv: str = "edge"
    act_type: str = "relu"
    res_scale: float = 1.0

    @nn.compact
    def __call__(self, x, graph=None, training=False):
        return (
            DynConv(self.channels, self.channels, self.kernel_size,
                    self.dilation, self.conv, self.act_type, name="body")(
                x, graph, training
            )
            + x * self.res_scale
        )


class DenseDynBlock(nn.Module):
    in_channels: int
    out_channels: int = 64
    kernel_size: int = 9
    dilation: int = 1
    conv: str = "edge"
    act_type: str = "relu"

    @nn.compact
    def __call__(self, x, graph=None, training=False):
        dense = DynConv(self.in_channels, self.out_channels, self.kernel_size,
                        self.dilation, self.conv, self.act_type, name="body")(
            x, graph, training
        )
        return jnp.concatenate([x, dense], axis=-1)


class ResGraphBlock(nn.Module):
    channels: int
    conv: str = "edge"
    act_type: str = "relu"
    heads: int = 8
    res_scale: float = 1.0

    @nn.compact
    def __call__(self, x, graph: Graph, edge_attr=None, training=False):
        return (
            GraphConvLayer(self.channels, self.channels, self.conv,
                           self.act_type, heads=self.heads, name="body")(
                x, graph, edge_attr, training
            )
            + x * self.res_scale
        )


class DenseGraphBlock(nn.Module):
    in_channels: int
    out_channels: int
    conv: str = "edge"
    act_type: str = "relu"
    heads: int = 8

    @nn.compact
    def __call__(self, x, graph: Graph, edge_attr=None, training=False):
        dense = GraphConvLayer(self.in_channels, self.out_channels, self.conv,
                               self.act_type, heads=self.heads, name="body")(
            x, graph, edge_attr, training
        )
        return jnp.concatenate([x, dense], axis=-1)
