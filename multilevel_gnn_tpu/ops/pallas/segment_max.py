"""Pallas sorted-segment-max on the flat tile-aligned layout: scatter-free
replacement for jax.ops.segment_max (which lowers to the pathologically
slow-compiling XLA scatter on the target TPU — see segment_sum.py header).

Replaces the reference's torch_scatter max path (reference
models/gcn_lib/sparse/torch_message.py:46-47 base 'max' aggregate;
utils/pyg_util.py:26-33 sentinel wrapper): GENConv aggr='max', GATConv's
attention sum, MRConv and EdgConv maxima all ride segment maxima.

Algorithm (per flat chunk of te sorted ids, same layout as
flat_segment_sum):

  1. segmented prefix-max inside the chunk: log2(te) shift+select steps —
     acc[e] = max(acc[e], acc[e - d]) where ids[e] == ids[e - d].  After
     the sweep, the LAST slot of each id-run holds that run's max.
  2. select the run-ends into the owner tile with a one-hot MXU matmul
     (exactly one selected slot per (tile-row, chunk), so the selection
     sum is exact via the bf16 3-limb split), plus a presence row-sum so
     absent rows contribute -BIG instead of 0.
  3. accumulate across a tile's chunks with jnp.maximum; empty segments
     are fixed up to 0 after the kernel (torch_scatter zero-fill).

Cost: same streaming DMA as flat_segment_sum + te*tc*log2(te) cheap VPU
ops + the same selection matmul — segment-max at segment-sum speed.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multilevel_gnn_tpu.ops.pallas.segment_sum import (
    SortedSegments,
    _dot_product,
    _round_up,
    flatten_rows,
)

_NEG = -3.0e38  # below any f32 data; identity for the max accumulation


def _make_flat_max_kernel():
    """ids arrive in TWO layouts: (1, te/128, 128) for the one-hot build and
    (te, 1) column form for the row-aligned shift compares — Mosaic cannot
    relayout (sub, lane) -> (te, 1) in-kernel ('unsupported shape cast',
    measured on the target TPU), so the column copy is a separate input."""

    def kernel(owner_ref, ids_ref, idcol_ref, data_ref, out_ref):
        c = pl.program_id(1)
        tn = out_ref.shape[0]
        sub, lane = ids_ref.shape[1], ids_ref.shape[2]
        te = sub * lane
        own = owner_ref[c]
        prev_own = owner_ref[jnp.maximum(c - 1, 0)]

        @pl.when((c == 0) | (own != prev_own))
        def _():
            out_ref[:] = jnp.full_like(out_ref, _NEG)

        ids2d = ids_ref[0]  # (sub, lane) — one-hot layout
        ids_col = idcol_ref[:]  # (te, 1) — row-aligned with data
        data = data_ref[:]  # (te, tc)

        # 1. segmented prefix-max (ids sorted => runs are contiguous)
        acc = data
        d = 1
        while d < te:
            sh_ids = jnp.concatenate(
                [jnp.full((d, 1), -1, ids_col.dtype), ids_col[:-d]], axis=0
            )
            sh_acc = jnp.concatenate(
                [jnp.full((d, acc.shape[1]), _NEG, acc.dtype), acc[:-d]],
                axis=0,
            )
            acc = jnp.where(ids_col == sh_ids, jnp.maximum(acc, sh_acc), acc)
            d *= 2

        # 2. run-end selection via VALUE masking (stays in (te, .) layout):
        #    zero all non-run-end rows, then the plain one-hot matmul sums
        #    exactly one non-zero row per (tile-row, chunk) => the run max.
        nxt = jnp.concatenate(
            [ids_col[1:], jnp.full((1, 1), ids_col.dtype.type(-2))], axis=0
        )
        last = ids_col != nxt  # (te, 1) — one True per run
        acc_sel = jnp.where(last, acc, 0.0)
        rows = (
            jax.lax.broadcasted_iota(jnp.int32, (tn, sub, lane), 0) + own * tn
        )
        onehot = (ids2d[None] == rows).astype(jnp.float32).reshape(tn, te)
        contrib = _dot_product(onehot, acc_sel, (((1,), (0,)), ((), ())))
        # present[r] = 1 iff tile-row r has a run-end in this chunk
        present = _dot_product(
            onehot, last.astype(jnp.float32), (((1,), (0,)), ((), ()))
        )
        contrib = contrib + (1.0 - present) * _NEG

        # 3. max-accumulate into the owner tile
        out_ref[:] = jnp.maximum(out_ref[:], contrib)

    return kernel


def flat_segment_max(
    data: jax.Array,
    seg: SortedSegments,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Segment-max of (E_flat, C) data already in seg's FLAT tile-aligned
    order.  Empty segments -> 0 (torch_scatter 2.x zero-fill; reference
    utils/pyg_util.py:30-31 sentinel semantics).  Padding slots carry
    id == num_segments and are never selected."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    Ef, C = data.shape
    assert Ef == seg.n_flat_chunks * seg.te, (Ef, seg.n_flat_chunks, seg.te)
    dsize = 2 if data.dtype == jnp.bfloat16 else 4

    def vmem(t):
        limbs = seg.te * t * (4 + 3 * 2) if dsize == 4 else 0
        return 2 * seg.te * t * dsize + seg.tn * t * 4 + 2 * seg.te * t * 4 + limbs

    C_128 = _round_up(C, 128)
    tc = C_128
    while tc > 128 and vmem(tc) > 12 * 1024 * 1024:
        tc //= 2
    C_pad = _round_up(C, tc)
    data = jnp.pad(data, ((0, 0), (0, C_pad - C)))
    N_pad = seg.n_tiles * seg.tn
    grid = (C_pad // tc, seg.n_flat_chunks)
    idcol = seg.flat_ids3d.reshape(seg.n_flat_chunks * seg.te, 1)
    out = pl.pallas_call(
        _make_flat_max_kernel(),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, seg.te // 128, 128), lambda f, c, ow: (c, 0, 0)),
                pl.BlockSpec((seg.te, 1), lambda f, c, ow: (c, 0)),
                pl.BlockSpec((seg.te, tc), lambda f, c, ow: (c, f)),
            ],
            out_specs=pl.BlockSpec(
                (seg.tn, tc), lambda f, c, ow: (ow[c], f)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((N_pad, C_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * seg.n_flat_chunks * seg.te * seg.tn * C_pad * 3,
            bytes_accessed=Ef * C_pad * dsize + N_pad * C_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(seg.owner, seg.flat_ids3d, idcol, data)
    out = out[: seg.num_segments, :C]
    return jnp.where(out < _NEG / 2, 0.0, out)


def segment_max_by(
    data: jax.Array,
    seg: SortedSegments,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Segment-max of (E, C) rows in ORIGINAL index order (the reorder
    gather doubles as the perm+padding step; padded zero rows carry the
    num_segments sentinel id and are never selected)."""
    assert data.ndim == 2, data.shape
    return flat_segment_max(flatten_rows(data, seg), seg, interpret)
