"""Static-topology graph container (pytree).

The reference materializes one PyG ``Data`` object per patient and batches
them block-diagonally (reference: dataloader/multiloader.py:935-1053,
train.py:316-327).  But per fold the topology is *identical across patients*
(multiloader.py:687-698 assigns the same ``edge_index`` to every patient) —
so on TPU we store the topology once with static shapes and batch only the
per-patient features.  Every conv then runs as batched gather + segment
reduce over one shared, destination-sorted edge list: static shapes, no
recompilation, MXU-shaped tensors.
"""
from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _sort_by_dst(edge_index: np.ndarray, edge_attr: Optional[np.ndarray]):
    order = np.argsort(edge_index[1], kind="stable")
    edge_index = edge_index[:, order]
    edge_attr = edge_attr[order] if edge_attr is not None else None
    return edge_index, edge_attr


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Graph:
    """A single static graph topology, destination-sorted, padded.

    Fields
    ------
    senders:   (E,) int32 — source node of each edge (gather index).
    receivers: (E,) int32 — destination node of each edge; sorted ascending.
    edge_attr: (E, A) float32 or None — per-edge attributes.
    edge_mask: (E,) bool — False on padding edges (they point at node n_nodes
               slot which is dropped, and their attr is zeroed).
    n_nodes:   static int — number of real nodes.
    n_edges:   static int — number of real edges (<= E).
    csr/csc:   optional SortedSegments metadata (receiver- / sender-sorted)
               for the Pallas segment-sum backend; built host-side via
               with_sorted_meta().
    in_deg:    optional (n_nodes,) float32 host-precomputed in-degree.
    """

    senders: jax.Array
    receivers: jax.Array
    edge_attr: Optional[jax.Array]
    edge_mask: jax.Array
    n_nodes: int = dataclasses.field(metadata=dict(static=True))
    n_edges: int = dataclasses.field(metadata=dict(static=True))
    csr: Optional[object] = None
    csc: Optional[object] = None
    in_deg: Optional[jax.Array] = None
    winplan: Optional[object] = None
    halo: Optional[object] = None

    @staticmethod
    def from_edges(
        edge_index: np.ndarray,
        edge_attr: Optional[np.ndarray],
        n_nodes: int,
        pad_to: Optional[int] = None,
    ) -> "Graph":
        """Build a destination-sorted, optionally padded Graph.

        Padding edges get senders/receivers = n_nodes - 1 with edge_mask=False
        and zero edge_attr, so a masked segment-sum ignores them.
        """
        edge_index = np.asarray(edge_index, dtype=np.int32)
        if edge_index.size == 0:
            edge_index = edge_index.reshape(2, 0)
        n_edges = edge_index.shape[1]
        if edge_attr is not None:
            edge_attr = np.asarray(edge_attr, dtype=np.float32)
            if edge_attr.ndim == 1:
                edge_attr = edge_attr[:, None]
        edge_index, edge_attr = _sort_by_dst(edge_index, edge_attr)
        pad_to = pad_to if pad_to is not None else n_edges
        assert pad_to >= n_edges
        pad = pad_to - n_edges
        mask = np.concatenate([np.ones(n_edges, bool), np.zeros(pad, bool)])
        if pad:
            pad_idx = np.full((2, pad), max(n_nodes - 1, 0), dtype=np.int32)
            edge_index = np.concatenate([edge_index, pad_idx], axis=1)
            if edge_attr is not None:
                edge_attr = np.concatenate(
                    [edge_attr, np.zeros((pad, edge_attr.shape[1]), np.float32)]
                )
        # fields stay HOST numpy through the build pipeline: the
        # with_self_loops/pad_edges_to/with_sorted_meta chain reads them
        # back with np.asarray, and on the remote-tunnel TPU backend the
        # first device->host readback costs ~55 s of one-time setup
        # (measured, /tmp probe 2026-08-17).  with_sorted_meta() — the
        # terminal step of every training pipeline — moves the final
        # arrays to device in one device_put; graphs used without it are
        # converted lazily at first jit call.
        return Graph(
            senders=edge_index[0],
            receivers=edge_index[1],
            edge_attr=edge_attr,
            edge_mask=mask,
            n_nodes=int(n_nodes),
            n_edges=int(n_edges),
        )

    def with_self_loops(self, fill_value: float = 1.0) -> "Graph":
        """Remove existing self loops then append one per node.

        Mirrors PyG ``remove_self_loops`` + ``add_self_loops`` used by the
        reference SAGEConv (models/gcn_lib/sparse/torch_vertex.py:272-273);
        self-loop edge_attr is ``fill_value`` (PyG default 1.0).  Host-side
        (numpy) — topology is fixed per fold so this runs once.
        """
        send = np.asarray(self.senders)[np.asarray(self.edge_mask)]
        recv = np.asarray(self.receivers)[np.asarray(self.edge_mask)]
        attr = (
            np.asarray(self.edge_attr)[np.asarray(self.edge_mask)]
            if self.edge_attr is not None
            else None
        )
        keep = send != recv
        send, recv = send[keep], recv[keep]
        if attr is not None:
            attr = attr[keep]
        loop = np.arange(self.n_nodes, dtype=np.int32)
        send = np.concatenate([send, loop])
        recv = np.concatenate([recv, loop])
        if attr is not None:
            attr = np.concatenate(
                [attr, np.full((self.n_nodes, attr.shape[1]), fill_value, np.float32)]
            )
        return Graph.from_edges(np.stack([send, recv]), attr, self.n_nodes)

    def without_self_loops(self) -> "Graph":
        """Drop self-loop edges (host-side). GCNConv expects this form —
        it adds the +I term internally with unit weight."""
        send = np.asarray(self.senders)[np.asarray(self.edge_mask)]
        recv = np.asarray(self.receivers)[np.asarray(self.edge_mask)]
        attr = (
            np.asarray(self.edge_attr)[np.asarray(self.edge_mask)]
            if self.edge_attr is not None
            else None
        )
        keep = send != recv
        send, recv = send[keep], recv[keep]
        if attr is not None:
            attr = attr[keep]
        return Graph.from_edges(np.stack([send, recv]), attr, self.n_nodes)

    def pad_edges_to(self, pad_to: int) -> "Graph":
        send = np.asarray(self.senders)[: self.n_edges]
        recv = np.asarray(self.receivers)[: self.n_edges]
        attr = (
            np.asarray(self.edge_attr)[: self.n_edges]
            if self.edge_attr is not None
            else None
        )
        return Graph.from_edges(
            np.stack([send, recv]), attr, self.n_nodes, pad_to=pad_to
        )

    @property
    def num_padded_edges(self) -> int:
        return int(self.senders.shape[0])

    def with_sorted_meta(self) -> "Graph":
        """Attach host-precomputed SortedSegments (receiver- and
        sender-sorted) + in-degree for the Pallas segment-sum backend.
        Must be called host-side (outside jit) on concrete arrays."""
        from multilevel_gnn_tpu.ops.pallas.segment_sum import SortedSegments

        recv = np.asarray(self.receivers)
        send = np.asarray(self.senders)
        mask = np.asarray(self.edge_mask)
        # te (edge-chunk tile) trades grid steps against VMEM per block:
        # smaller chunks let the 2D kernel take full-width (contiguous-DMA)
        # feature blocks at wide B*C.  Picked per backend BUILD from the
        # measured tuning table (ops/pallas/tuning.py — e.g. te=128
        # recovers the f32 kernel +14% on cl/831091709); MGTPU_TE env
        # override wins, unknown backends/CPU get the default 256.
        from multilevel_gnn_tpu.ops.pallas.tuning import tuned_te

        te = tuned_te()
        csr = SortedSegments.build(recv, self.n_nodes, te=te, mask=mask)
        csc = SortedSegments.build(send, self.n_nodes, te=te, mask=mask)
        deg = np.bincount(recv[mask], minlength=self.n_nodes).astype(np.float32)
        dev = jax.device_put(
            (send, recv, self.edge_attr, mask, deg)
        )
        return dataclasses.replace(
            self, senders=dev[0], receivers=dev[1], edge_attr=dev[2],
            edge_mask=dev[3], csr=csr, csc=csc, in_deg=dev[4],
        )

    def with_window_meta(
        self,
        perm_group: int = 1,
        Wb: int = 512,
        nwin: int = 2,
        min_frac: float = 0.5,
    ) -> "Graph":
        """Attach a windowed-SpMM plan (ops/pallas/windowed.py) when the
        topology is local enough: contiguous window DMA + MXU adjacency
        blocks replace the per-row gather for in-window edges.  Call
        BEFORE with_sorted_meta (host arrays, avoids device readback).
        perm_group=3 for the 3*gene+omics interleave (permutes genes,
        keeping cross-omics edges adjacent).  No-op (returns self) when
        fewer than min_frac of edges fit windows even after RCM."""
        from multilevel_gnn_tpu.ops.pallas import windowed as _W

        send = np.asarray(self.senders)
        recv = np.asarray(self.receivers)
        mask = np.asarray(self.edge_mask)
        perm, f_id, f_best = _W.choose_node_perm(
            send[mask], recv[mask], self.n_nodes, Wb=Wb, nwin=nwin,
            group=perm_group,
        )
        if f_best < min_frac:
            return self
        plan = _W.build_plan(
            send, recv, self.n_nodes, mask=mask, perm=perm, Wb=Wb,
            nwin=nwin,
        )
        return dataclasses.replace(self, winplan=plan)

    def in_degree(self) -> jax.Array:
        """In-degree per node counting only real edges."""
        if self.in_deg is not None:
            return self.in_deg
        seg = jnp.where(self.edge_mask, self.receivers, self.n_nodes)
        return jax.ops.segment_sum(
            jnp.ones_like(self.receivers, jnp.float32), seg, self.n_nodes + 1
        )[: self.n_nodes]
