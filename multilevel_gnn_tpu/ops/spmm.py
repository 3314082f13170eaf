"""Batched sparse aggregation (SpMM) over a static, dst-sorted edge list.

This is the op family that replaces the PyG ``propagate`` gather/scatter
machinery (reference: models/gcn_lib/sparse/torch_vertex.py:277-294 and the
torch_scatter CUDA kernels).  The graph topology is static per fold, so the
aggregation is: gather src rows of a batched feature tensor (B, N, C),
optionally scale by per-edge weights, and segment-reduce into destinations.

Backends:
  * 'xla'    — gather + jax.ops.segment_* (always available, oracle).
  * 'pallas' — XLA gather + Pallas MXU one-hot segment-sum, with a custom
    VJP whose backward is ALSO gather + Pallas segment-sum over the
    sender-sorted permutation.  No XLA scatter anywhere (avoids the ~166 s
    per-shape scatter compile measured on the target TPU).  Requires
    Graph.with_sorted_meta().  Edge weights are treated as data (zero
    cotangent) — true of every reference model: multiplicative edge_attr is
    loaded data, learned edge embeddings enter additively via GENConv.
Selected globally via set_backend() or per-call with backend=...
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from multilevel_gnn_tpu.core.graph import Graph
from multilevel_gnn_tpu.ops import segment as seg_ops
from multilevel_gnn_tpu.ops.pallas.segment_sum import (
    SortedSegments,
    flat_segment_sum,
    segment_sum_by,
    sorted_segment_sum,
    take_ib,
)
from multilevel_gnn_tpu.ops.pallas import segment_max as pmax


def _flat_index(idx: jax.Array, seg: SortedSegments) -> jax.Array:
    """Compose an (E,) row-index array with seg's flat tile-aligned layout:
    returns (E_flat,) indices (padding slots -> row 0; pair with _flat_w
    whose padding weight is 0)."""
    ext = jnp.concatenate([idx, jnp.zeros((1,), idx.dtype)])
    return take_ib(ext, seg.perm_pad)


def _flat_w(w: jax.Array, seg: SortedSegments) -> jax.Array:
    """(E, 1) edge weights -> (E_flat, 1) in flat order, 0 on padding."""
    ext = jnp.concatenate([w, jnp.zeros((1,) + w.shape[1:], w.dtype)])
    return take_ib(ext, seg.perm_pad)

_BACKEND = "xla"
_DTYPE = None  # None = keep f32; jnp.bfloat16 = cast SpMM data (2x traffic cut)

# NOTE on gather-in-kernel fusion (investigated + rejected, round 2): a
# per-row-DMA fused gather→segment-sum kernel cannot beat this composed
# path on v5e.  Measured (tools/bench_dma_gather.py): 165,888 single-row
# (16,128) DMAs cost 5.90 ms f32 / 5.44 ms bf16 — identical despite 2x the
# bytes, i.e. the gather is ISSUE-RATE bound at ~33 ns/row on the scalar
# core, and XLA's gather (~6 ms) already achieves that bound.  Fusion's
# only upside is skipping the message HBM round trip (~2.5 ms f32 /
# ~1.2 ms bf16) against the risk of serializing the same DMA stream with
# the MXU accumulate; on the shipped bf16 path (6.68 ms total) the best
# case is <=10%.  Mosaic also rejects single-row slices of (8,128)-tiled
# 2D HBM memrefs outright ("Slice shape along dimension 0 must be aligned
# to tiling (8)"); the only legal layout is a 3D (N,16,128) repack whose
# compute side needs unsupported (te,16,128) relayouts.  See STATUS.md.


def set_backend(name: str) -> None:
    global _BACKEND
    assert name in ("xla", "pallas"), name
    _BACKEND = name


_PARALLEL_MESH = None


def set_parallel_mesh(mesh) -> None:
    """Mesh used by the boundary-only halo aggregation (SURVEY §5.7).

    Set by the driver's mesh path when cfg.halo_exchange is on (None
    disables).  When a Graph carries a HaloPartition (graph.halo) and a
    mesh is set, gather_scatter routes sum/mean aggregations through
    parallel/halo.py's shard_map all_to_all exchange instead of leaving
    GSPMD to all-reduce full (N, C) node partials."""
    global _PARALLEL_MESH
    _PARALLEL_MESH = mesh


def get_backend() -> str:
    return _BACKEND


def set_spmm_dtype(dtype) -> None:
    """None (f32-exact) or jnp.bfloat16 — casts the gathered messages in the
    fused pallas path (halves gather traffic, single-pass MXU; ~1e-3
    relative rounding on activations/gradients)."""
    global _DTYPE
    _DTYPE = dtype


def gather(x: jax.Array, index: jax.Array, axis: int = -2) -> jax.Array:
    """x[..., index, :] — edge gather of node features."""
    return jnp.take(x, index, axis=axis)


def _float0_zeros(tree):
    def z(a):
        if a is None:
            return None
        if jnp.issubdtype(a.dtype, jnp.floating):
            return jnp.zeros(a.shape, a.dtype)
        return np.zeros(a.shape, jax.dtypes.float0)

    return jax.tree.map(z, tree)


def _to_2d(x):
    """(B, N, C) -> (N, B*C) so edge gathers read contiguous wide rows
    (measured ~4x faster than gathering on the middle axis of (B, N, C));
    (N, C) passes through."""
    if x.ndim == 2:
        return x, None
    B, N, C = x.shape
    return jnp.transpose(x, (1, 0, 2)).reshape(N, B * C), (B, C)

def _from_2d(y, bc):
    if bc is None:
        return y
    B, C = bc
    return jnp.transpose(y.reshape(y.shape[0], B, C), (1, 0, 2))


@jax.custom_vjp
def _fused_spmm_sum(x, w, senders, receivers, csr, csc):
    """out[.., n, c] = sum_{e: recv[e]=n} x[.., send[e], c] * w[e, 0].

    Forward: 2D-layout XLA gather + Pallas sorted-segment-sum (receivers
    pre-sorted).  Backward: d_x via gather of d_out at receivers + Pallas
    segment-sum over the sender-sorted permutation.  No XLA scatter in
    either direction.  w is non-differentiable (zero cotangent) — edge
    weights are data in every reference model.
    """
    x2, bc = _to_2d(x)
    if _DTYPE is not None:
        x2 = x2.astype(_DTYPE)
        w = w.astype(_DTYPE)
    # compose the flat tile-aligned layout into the gather: padding slots
    # read row 0 with weight 0, so the flat kernel streams one contiguous
    # chunk per grid step with zero re-reads.  The weight multiply rides
    # the kernel (bf16: folded into the one-hot; f32: exact pre-multiply
    # inside flat_segment_sum) — no separate E-row HBM pass.
    msg = take_ib(x2, _flat_index(senders, csr))
    out2 = flat_segment_sum(msg, csr, w=_flat_w(w, csr))
    return _from_2d(out2, bc)


def _fused_fwd(x, w, senders, receivers, csr, csc):
    out = _fused_spmm_sum(x, w, senders, receivers, csr, csc)
    # dtype witness: the bwd must return d_x in the PRIMAL x dtype (JAX
    # transpose rules use lax.mul with no promotion — an f32 cotangent
    # against a bf16 operand downstream is a hard error)
    proto = jnp.zeros((0,), x.dtype)
    return out, (w, receivers, csr, csc, proto)


def _fused_bwd(res, d_out):
    w0, receivers, csr, csc, proto = res
    g2, bc = _to_2d(d_out)
    w = w0
    if _DTYPE is not None:
        g2 = g2.astype(_DTYPE)
        w = w.astype(_DTYPE)
    g = take_ib(g2, _flat_index(receivers, csc))
    d_x2 = flat_segment_sum(g, csc, w=_flat_w(w, csc))
    d_x = _from_2d(d_x2, bc)
    if d_x.dtype != proto.dtype:
        d_x = d_x.astype(proto.dtype)
    return (
        d_x,
        jnp.zeros_like(w0),
        np.zeros(receivers.shape, jax.dtypes.float0),
        np.zeros(receivers.shape, jax.dtypes.float0),
        _float0_zeros(csr),
        _float0_zeros(csc),
    )


_fused_spmm_sum.defvjp(_fused_fwd, _fused_bwd)


@jax.custom_vjp
def edge_segment_sum(msg, receivers, mask, csr):
    """Segment-sum of edge values (already receiver-ordered) with a
    scatter-free backward: d_msg = mask * d_out[receivers].

    msg: (.., E, C); returns (.., N, C).  The building block for composed
    segment ops (softmax aggregation) on the pallas backend.  The forward
    drops padding edges via csr's id masking; the backward must re-apply
    the edge mask so padding rows get zero cotangents.
    """
    m2, bc = _to_2d(msg)
    out2 = segment_sum_by(m2, csr, tc=512)
    return _from_2d(out2, bc)


def _ess_fwd(msg, receivers, mask, csr):
    proto = jnp.zeros((0,), msg.dtype)
    return edge_segment_sum(msg, receivers, mask, csr), (
        receivers, mask, csr, proto,
    )


def _ess_bwd(res, d_out):
    receivers, mask, csr, proto = res
    g2, bc = _to_2d(d_out)
    d2 = take_ib(g2, receivers) * mask[:, None].astype(g2.dtype)
    d_msg = _from_2d(d2, bc)
    if d_msg.dtype != proto.dtype:
        d_msg = d_msg.astype(proto.dtype)
    return (
        d_msg,
        np.zeros(receivers.shape, jax.dtypes.float0),
        np.zeros(mask.shape, jax.dtypes.float0),
        _float0_zeros(csr),
    )


edge_segment_sum.defvjp(_ess_fwd, _ess_bwd)


@jax.custom_vjp
def edge_segment_max(msg, receivers, mask, csr):
    """Segment-max of edge values into receivers with a scatter-free Pallas
    forward (ops/pallas/segment_max.py) and a gather-only backward.

    msg: (.., E, C); returns (.., N, C); empty segments -> 0 (torch_scatter
    zero-fill, reference utils/pyg_util.py:30-31).  Backward routes the
    cotangent to every edge equal to its segment's max (ties each receive
    the full cotangent — torch_scatter routes to a single argmax; equal-tie
    graphs are measure-zero for float features, divergence documented in
    docs/PARITY.md).
    """
    m2, bc = _to_2d(msg)
    out2 = pmax.segment_max_by(m2, csr)
    return _from_2d(out2, bc)


def _esm_fwd(msg, receivers, mask, csr):
    out = edge_segment_max(msg, receivers, mask, csr)
    return out, (msg, out, receivers, mask, csr)


def _esm_bwd(res, d_out):
    msg, out, receivers, mask, csr = res
    m2, bc = _to_2d(msg)
    o2, _ = _to_2d(out)
    g2, _ = _to_2d(d_out)
    sel = (m2 == take_ib(o2, receivers)) & mask[:, None]
    d2 = jnp.where(sel, take_ib(g2, receivers), 0.0)
    if d2.dtype != m2.dtype:
        d2 = d2.astype(m2.dtype)  # cotangent in the primal msg dtype
    return (
        _from_2d(d2, bc),
        np.zeros(receivers.shape, jax.dtypes.float0),
        np.zeros(mask.shape, jax.dtypes.float0),
        _float0_zeros(csr),
    )


edge_segment_max.defvjp(_esm_fwd, _esm_bwd)


def edge_segment_min(msg, receivers, mask, csr):
    """min(x) = -max(-x) with the same empty->0 fill (0 == -0)."""
    return -edge_segment_max(-msg, receivers, mask, csr)


def segment_softmax_weights(z, graph: Graph):
    """softmax over each destination's in-edges, per feature column —
    scatter-free: shift by the global max (softmax is shift-invariant per
    segment, so any constant shift is exact) then normalize by the
    Pallas segment-summed denominators."""
    neg_inf_mask = ~graph.edge_mask
    shape = (-1, 1) if z.ndim == 2 else (1, -1, 1)
    zm = jnp.where(neg_inf_mask.reshape(shape), -jnp.inf, z)
    gmax = jax.lax.stop_gradient(
        jnp.max(jnp.where(jnp.isfinite(zm), zm, -1e30), axis=-2, keepdims=True)
    )
    e = jnp.exp(zm - gmax)
    e = jnp.where(neg_inf_mask.reshape(shape), 0.0, e)
    denom = edge_segment_sum(e, graph.receivers, graph.edge_mask, graph.csr)
    denom = jnp.where(denom == 0.0, 1.0, denom)
    # gather_rows keeps the backward scatter-free when t is learnable
    # (d_denom = Pallas segment-sum instead of XLA scatter-add)
    return e / gather_rows(denom, graph.receivers, graph.csr)


@jax.custom_vjp
def gather_rows(x, idx, seg):
    """Row gather x[..., idx, :] with a scatter-free backward.

    idx must be pre-resolved (non-negative) indices; seg is the
    SortedSegments built from idx over x's row count.  Backward:
    d_x = Pallas segment-sum of d_out over idx — replaces XLA's scatter-add
    transpose of gather (the 166 s compile).  Batched inputs route through
    the 2D (N, B*C) layout for contiguous wide-row gathers.
    """
    x2, bc = _to_2d(x)
    return _from_2d(take_ib(x2, idx), bc)


def _gather_rows_fwd(x, idx, seg):
    proto = jnp.zeros((0,), x.dtype)
    return gather_rows(x, idx, seg), (idx, seg, proto)


def _gather_rows_bwd(res, d_out):
    idx, seg, proto = res
    g2, bc = _to_2d(d_out)
    d_x = _from_2d(segment_sum_by(g2, seg, tc=512), bc)
    if d_x.dtype != proto.dtype:
        d_x = d_x.astype(proto.dtype)  # cotangent in the primal x dtype
    return (
        d_x,
        np.zeros(idx.shape, jax.dtypes.float0),
        _float0_zeros(seg),
    )


gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def permute_take(x, perm, axis: int):
    """``jnp.take(x, perm, axis)`` for a PERMUTATION index, with the
    transpose expressed as the inverse-permutation take instead of XLA's
    generic scatter-add (the banned slow-compile op class).  Used by the
    pathway reorder (reference multilevel_gnn.py:241-242 / vae.py:308-332
    embedding-similarity reorder, shipped on in kirc/lgg yamls).  perm must
    be a true permutation of range(len) — duplicates would silently drop
    cotangent mass."""
    return jnp.take(x, perm, axis=axis)


def _permute_take_fwd(x, perm, axis):
    return jnp.take(x, perm, axis=axis), perm


def _permute_take_bwd(axis, perm, g):
    # argsort(perm) = inverse permutation; one small device sort per
    # backward (P <= 146 rows) instead of a scatter
    return jnp.take(g, jnp.argsort(perm), axis=axis), np.zeros(
        perm.shape, jax.dtypes.float0
    )


permute_take.defvjp(_permute_take_fwd, _permute_take_bwd)


def gather_src(x, graph):
    """x[..., senders, :] — scatter-free backward on the pallas backend
    (gather_rows over the sender-sorted segments); plain XLA gather (whose
    VJP is a scatter-add) otherwise."""
    if _BACKEND == "pallas" and getattr(graph, "csc", None) is not None:
        return gather_rows(x, graph.senders, graph.csc)
    return gather(x, graph.senders)


def gather_dst(x, graph):
    """x[..., receivers, :] — scatter-free-backward counterpart of
    gather_src over the receiver-sorted segments."""
    if _BACKEND == "pallas" and getattr(graph, "csr", None) is not None:
        return gather_rows(x, graph.receivers, graph.csr)
    return gather(x, graph.receivers)


def gather_scatter(
    x: jax.Array,
    graph: Graph,
    reduce: str = "sum",
    edge_weight: Optional[jax.Array] = None,
    backend: Optional[str] = None,
) -> jax.Array:
    """out[dst] = reduce_{e: recv[e]=dst} x[src[e]] * w[e].

    x: (..., N, C); edge_weight: (E,) or (E, 1) or None; returns (..., N, C).
    """
    backend = backend or _BACKEND
    if (
        getattr(graph, "halo", None) is not None
        and _PARALLEL_MESH is not None
        and reduce in ("sum", "add", "mean")
    ):
        # mesh path with halo_exchange on: boundary-only all_to_all of halo
        # rows + per-shard local segment reduction (parallel/halo.py);
        # output stays node-sharded on 'model' — GSPMD re-gathers lazily
        # only where a consumer needs remote rows
        from multilevel_gnn_tpu.parallel.halo import (
            halo_gather_scatter,
            pad_nodes_for,
        )

        w = edge_weight
        if w is not None and w.ndim == 1:
            w = w[:, None]
        out = halo_gather_scatter(
            pad_nodes_for(x, graph.halo), graph.halo, _PARALLEL_MESH,
            reduce, w,
        )
        return out[..., : graph.n_nodes, :]
    if (
        backend == "pallas"
        and graph.csr is not None
        and reduce in ("sum", "add", "mean")
        and (edge_weight is None or edge_weight.ndim == 1
             or edge_weight.shape[-1] == 1)
    ):
        w = edge_weight
        if w is None:
            w = jnp.ones((graph.num_padded_edges, 1), x.dtype)
        elif w.ndim == 1:
            w = w[:, None]
        if reduce == "mean":
            inv = 1.0 / jnp.clip(graph.in_degree(), 1.0, None)
            w = w * inv[graph.receivers][:, None]
        if getattr(graph, "winplan", None) is not None:
            # locality-blocked path: contiguous window DMA + MXU adjacency
            # blocks instead of the per-row gather (ops/pallas/windowed.py)
            from multilevel_gnn_tpu.ops.pallas.windowed import (
                windowed_spmm_2d,
            )

            x2, bc = _to_2d(x)
            if _DTYPE is not None:
                x2 = x2.astype(_DTYPE)
            out2 = windowed_spmm_2d(
                x2, w.astype(jnp.float32), graph.senders, graph.receivers,
                graph.winplan,
            )
            return _from_2d(out2, bc)
        return _fused_spmm_sum(
            x, w, graph.senders, graph.receivers, graph.csr, graph.csc
        )
    if (
        backend == "pallas"
        and graph.csr is not None
        and reduce in ("max", "min")
    ):
        msg = gather_rows(x, graph.senders, graph.csc)
        if edge_weight is not None:
            w = edge_weight if edge_weight.ndim > 1 else edge_weight[:, None]
            msg = msg * w
        fn = edge_segment_max if reduce == "max" else edge_segment_min
        return fn(msg, graph.receivers, graph.edge_mask, graph.csr)
    msg = gather(x, graph.senders)
    if edge_weight is not None:
        w = edge_weight
        if w.ndim == 1:
            w = w[:, None]
        msg = msg * w
    fn = {
        "sum": seg_ops.segment_sum,
        "add": seg_ops.segment_sum,
        "mean": seg_ops.segment_mean,
        "max": seg_ops.segment_max,
        "min": seg_ops.segment_min,
    }[reduce]
    return fn(msg, graph.receivers, graph.n_nodes, axis=-2, mask=graph.edge_mask)


def spmm_sum(x, graph, edge_weight=None, backend=None):
    return gather_scatter(x, graph, "sum", edge_weight, backend)


def spmm_mean(x, graph, edge_weight=None, backend=None):
    return gather_scatter(x, graph, "mean", edge_weight, backend)
