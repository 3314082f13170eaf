"""Fused gather→scale→segment-sum SpMM kernel (VERDICT r1 item #1).

Replaces the composed path's HBM message round-trip (XLA gather writes
(E_flat, B*C) to HBM, flat_segment_sum re-reads it — ~2.7 GB at GBM scale)
with in-kernel row gathers: the node-feature table stays in HBM
(memory_space=ANY); each grid step issues te single-row async DMAs for the
NEXT chunk (indices streamed into SMEM, double-buffered VMEM message
scratch) while the MXU accumulates the CURRENT chunk's one-hot
segment-sum.  Messages never exist in HBM.

This is the single-pass CUDA gather+scatter the reference gets from
torch_scatter (reference models/gcn_lib/sparse/torch_vertex.py:277-294)
rebuilt TPU-style.  The known risk (STATUS.md): per-row DMA is issue-rate
bound on the scalar core (~te issues + te waits per grid step); whether
that beats the composed path's extra HBM round trip is an empirical
question answered by bench.py on hardware — see STATUS.md for the
measured verdict.

Layout contract: identical to flat_segment_sum (SortedSegments flat
tile-aligned chunks; padding slots read row 0 with weight 0).
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
)


def _make_gather_kernel(te: int):
    def kernel(
        owner_ref,      # scalar prefetch: (Cf,) int32
        ids_ref,        # (1, te/128, 128) int32 VMEM — receiver ids, chunk c
        src_cur_ref,    # (te,) int32 SMEM — row indices, chunk c (warmup)
        src_nxt_ref,    # (te,) int32 SMEM — row indices, chunk c+1
        w_ref,          # (te, 1) VMEM — edge weights, chunk c
        x_hbm,          # (N+1, C) ANY — node features, row 0 doubles as pad
        out_ref,        # (tn, C) VMEM block, owner-indexed
        msg_buf,        # (2, te, C) VMEM scratch
        copy_sem,       # DMA semaphore array (2,)
    ):
        c = pl.program_id(0)
        n_chunks = pl.num_programs(0)
        tn = out_ref.shape[0]
        own = owner_ref[c]
        prev_own = owner_ref[jnp.maximum(c - 1, 0)]
        slot = jax.lax.rem(c, 2)
        nxt_slot = jax.lax.rem(c + 1, 2)

        # Mosaic's fori_loop lowering supports only unroll=1 or a full
        # unroll (unroll == num_steps) — unroll=8 raised NotImplementedError
        # on hardware.  The issue loop is scalar-core bound, so full unroll
        # (te straight-line DMA starts) is what we want anyway.
        def issue(src_ref, s):
            def body(e, _):
                idx = src_ref[e]
                pltpu.make_async_copy(
                    x_hbm.at[idx], msg_buf.at[s, e], copy_sem.at[s]
                ).start()
                return 0

            jax.lax.fori_loop(0, te, body, 0, unroll=te)

        def drain(s):
            def body(e, _):
                pltpu.make_async_copy(
                    x_hbm.at[0], msg_buf.at[s, e], copy_sem.at[s]
                ).wait()
                return 0

            jax.lax.fori_loop(0, te, body, 0, unroll=te)

        # warm-up: synchronously fetch chunk 0 into slot 0
        @pl.when(c == 0)
        def _():
            issue(src_cur_ref, 0)
            drain(0)

        # prefetch chunk c+1 into the other slot (skip past the last chunk)
        @pl.when(c + 1 < n_chunks)
        def _():
            issue(src_nxt_ref, nxt_slot)

        @pl.when((c == 0) | (own != prev_own))
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        sub, lane = ids_ref.shape[1], ids_ref.shape[2]
        ids = ids_ref[0]
        rows = (
            jax.lax.broadcasted_iota(jnp.int32, (tn, sub, lane), 0) + own * tn
        )
        onehot = (ids[None] == rows).astype(jnp.float32).reshape(tn, te)
        msg = msg_buf[slot] * w_ref[:]
        out_ref[:] += _dot_product(onehot, msg, (((1,), (0,)), ((), ())))

        # chunk c+1 must have landed before the next step computes from it
        @pl.when(c + 1 < n_chunks)
        def _():
            drain(nxt_slot)

    return kernel


def gather_segment_sum(
    x: jax.Array,
    flat_src: jax.Array,
    flat_w: jax.Array,
    seg: SortedSegments,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """out[n] = sum_{flat slot e: ids[e]==n} x[flat_src[e]] * flat_w[e].

    x: (N_rows, C) f32 or bf16 — gathered row table (2D wide-row layout).
    flat_src: (Cf*te,) int32 — row index per flat slot (padding -> 0).
    flat_w:   (Cf*te, 1) — weight per flat slot (padding -> 0), same dtype
              as x.
    Returns (num_segments, C) f32.

    VMEM: 2*te*C (msg) + tn*C (out) + split3 limbs; C is NOT tiled — the
    whole point is one DMA per gathered row — so wide C with large te can
    exceed VMEM; callers fall back to the composed path when vmem_need()
    says so (ops/spmm.py).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    Ef = flat_src.shape[0]
    assert Ef == seg.n_flat_chunks * seg.te, (Ef, seg.n_flat_chunks, seg.te)
    N_rows, C = x.shape
    C_pad = _round_up(C, 128)
    if C_pad != C:
        x = jnp.pad(x, ((0, 0), (0, C_pad - C)))
    te = seg.te
    N_out = seg.n_tiles * seg.tn
    grid = (seg.n_flat_chunks,)
    w2 = flat_w.reshape(Ef, 1).astype(x.dtype)

    out = pl.pallas_call(
        _make_gather_kernel(te),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, te // 128, 128), lambda c, ow: (c, 0, 0)),
                pl.BlockSpec(
                    (te,), lambda c, ow: (c,),
                    memory_space=pltpu.MemorySpace.SMEM,
                ),
                pl.BlockSpec(
                    (te,),
                    lambda c, ow, _n=seg.n_flat_chunks: (
                        jnp.minimum(c + 1, _n - 1),
                    ),
                    memory_space=pltpu.MemorySpace.SMEM,
                ),
                pl.BlockSpec((te, 1), lambda c, ow: (c, 0)),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            ],
            out_specs=pl.BlockSpec((seg.tn, C_pad), lambda c, ow: (ow[c], 0)),
            scratch_shapes=[
                pltpu.VMEM((2, te, C_pad), x.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((N_out, C_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * seg.n_flat_chunks * te * seg.tn * C_pad
            * (3 if x.dtype != jnp.bfloat16 else 1),
            bytes_accessed=Ef * C_pad * x.dtype.itemsize
            + N_out * C_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(seg.owner, seg.flat_ids3d, flat_src, flat_src, w2, x)
    return out[: seg.num_segments, :C]


def vmem_need(te: int, c_pad: int, dtype) -> int:
    """Approximate VMEM bytes for gather_segment_sum at (te, C_pad)."""
    dsize = 2 if dtype == jnp.bfloat16 else 4
    limbs = te * c_pad * (4 + 3 * 2) if dsize == 4 else 0
    return 2 * te * c_pad * dsize + 128 * c_pad * 4 + limbs
