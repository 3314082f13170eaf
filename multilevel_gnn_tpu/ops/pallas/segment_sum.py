"""Pallas sorted-segment-sum: MXU one-hot contraction over static topology.

Motivation (measured on the target TPU): XLA scatter-add compiles
pathologically slowly (~166 s per distinct shape through the remote-compile
path) while running fast; gather compiles instantly.  Every neighborhood
aggregation and every gather-backward in this framework is a segment-sum
over a *statically known, destination-sorted* index array — so we replace
all XLA scatters with this kernel:

  for each (seg-tile n, feature-tile f, batch-tile b, chunk c of tile n):
      onehot[r, e] = (ids[e] == n*TN + r)            # iota compare, VPU
      out[n-tile, b, f] += onehot @ data[c, b, f]    # MXU matmul

Sortedness gives each segment tile a contiguous chunk range; per-tile chunk
offsets ride scalar prefetch (PrefetchScalarGridSpec) so the grid's chunk
axis is sized by the *max* chunks per tile, not the total.  Out-of-range /
padding ids produce all-zero one-hot rows; grid steps past a tile's chunk
count map to a sentinel all-padding chunk and are skipped.

ids are stored as (chunk, TE/128, 128) int32 tiles to satisfy the TPU
(8, 128) block divisibility rule; the one-hot is built 3D and minor-collapsed
to (TN, TE) for the matmul.

This kernel is also the backward of gather: d_x = segment_sum(d_msg sorted
by sender).  SortedSegments precomputes (host-side) the permutation + chunk
metadata for any static index array (receivers, senders, PCA-row matches).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def take_ib(a: jax.Array, idx: jax.Array) -> jax.Array:
    """Row gather a[idx] with mode='promise_in_bounds', for indices that
    are in-bounds BY CONSTRUCTION (flat layouts append a zero row / use
    row-0 or n-1 sentinels; permutations; pre-resolved gather_rows
    indices).  jnp.take's default 'fill' mode emits a broadcast_select
    pass over the FULL gathered output to mask out-of-bounds rows —
    profiled at ~3 ms/step of pure HBM traffic across the shipped step's
    gathers (PROFILE_r05.json select_n fusions)."""
    return a.at[idx].get(mode="promise_in_bounds")


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SortedSegments:
    """Host-precomputed sorted-segment metadata for a static index array.

    ids3d:       (C+1, TE/128, 128) int32 — sorted segment ids in chunk
                 tiles, padded with num_segments; row C is the sentinel
                 all-padding chunk.
    chunk_first: (T,) int32 — first chunk index overlapping each out tile.
    n_chunks:    (T,) int32 — chunks overlapping each out tile.
    perm:        (E,) int32 or None — permutation sorting the original index
                 array (None = already sorted).

    Flat tile-aligned layout (the fast path): each out tile's edge range is
    padded up to a whole number of TE-chunks, so every chunk belongs to
    exactly ONE tile, the kernel grid is a single pass over chunks (no
    skipped steps, no boundary chunk re-reads — streaming sequential DMA),
    and per-tile accumulation rides contiguous out-block revisits.
    flat_ids3d:  (Cf, TE/128, 128) int32 — segment ids per flat chunk,
                 num_segments on padding slots.
    owner:       (Cf,) int32 — owning out tile per chunk, nondecreasing;
                 every tile owns >= 1 chunk.
    perm_pad:    (Cf*TE,) int32 — original-order edge id per flat slot,
                 n_ids (one-past-end sentinel) on padding slots.  Compose
                 into upstream gathers: take(concat(rows, zero_row),
                 perm_pad) puts data in flat order for free.
    """

    ids3d: jax.Array
    chunk_first: jax.Array
    n_chunks: jax.Array
    perm: Optional[jax.Array]
    flat_ids3d: jax.Array
    owner: jax.Array
    perm_pad: jax.Array
    num_segments: int = dataclasses.field(metadata=dict(static=True))
    n_ids: int = dataclasses.field(metadata=dict(static=True))
    tn: int = dataclasses.field(metadata=dict(static=True))
    te: int = dataclasses.field(metadata=dict(static=True))
    max_chunks: int = dataclasses.field(metadata=dict(static=True))
    n_tiles: int = dataclasses.field(metadata=dict(static=True))
    n_flat_chunks: int = dataclasses.field(metadata=dict(static=True))

    @staticmethod
    def build(
        ids: np.ndarray,
        num_segments: int,
        tn: int = 128,
        te: int = 1024,
        mask: Optional[np.ndarray] = None,
        flat_bucket: int = 32,
    ) -> "SortedSegments":
        """ids: (E,) host array (any order); mask False => dropped; negative
        or out-of-range ids dropped.

        flat_bucket: the flat chunk count Cf depends on the per-tile id
        DISTRIBUTION, not just len(ids) — without bucketing, every CV fold
        gets a different static shape and recompiles every jitted program
        (measured: ~30-60 s of per-fold compile gaps in the synthetic CV).
        Cf is rounded up to a multiple of flat_bucket with all-padding
        chunks appended to the last tile (zero contribution: ids sentinel
        + perm_pad one-past-end slots)."""
        assert te % 128 == 0
        ids = np.asarray(ids, np.int64).copy()
        if mask is not None:
            ids = np.where(np.asarray(mask), ids, num_segments)
        ids = np.where((ids < 0) | (ids >= num_segments), num_segments, ids)
        order = np.argsort(ids, kind="stable")
        sorted_ids = ids[order]
        identity = bool(np.all(order == np.arange(len(order))))
        E = len(ids)
        E_pad = max(_round_up(E, te), te)
        sorted_ids = np.concatenate(
            [sorted_ids, np.full(E_pad - E, num_segments, np.int64)]
        )
        n_chunks_total = E_pad // te
        n_tiles = max(_round_up(num_segments, tn) // tn, 1)
        first = np.searchsorted(sorted_ids, np.arange(n_tiles) * tn, "left")
        last = np.searchsorted(
            sorted_ids,
            np.minimum((np.arange(n_tiles) + 1) * tn, num_segments),
            "left",
        )
        cf = np.minimum(first // te, n_chunks_total - 1)
        cl = np.maximum((np.maximum(last, 1) - 1) // te, cf)
        n_chunks = np.where(last > first, cl - cf + 1, 0)
        # rounded up for cross-fold executable-shape stability (grid dim
        # of the non-flat kernel path)
        max_chunks = int(_round_up(max(n_chunks.max(), 1), 8))
        # sentinel all-padding chunk at index n_chunks_total
        ids3d = np.concatenate(
            [sorted_ids, np.full(te, num_segments, np.int64)]
        ).reshape(n_chunks_total + 1, te // 128, 128)

        # ---- flat tile-aligned layout ----
        # per-tile edge ranges in the sorted id array (dropped/padding ids
        # sort past num_segments and are excluded by `last`)
        per_tile = np.maximum(last - first, 0)
        tile_chunks = np.maximum((per_tile + te - 1) // te, 1)
        Cf = int(tile_chunks.sum())
        if flat_bucket > 1:
            # GEOMETRIC buckets (base flat_bucket, then +25% steps): linear
            # multiples still let production-scale folds (Cf ~600 at GBM
            # scale) hop buckets and recompile every jitted step; 25%
            # granularity absorbs fold-to-fold distribution variation at
            # <=25% padding (r3; same fix as windowed._geom_bucket)
            Cf_b = flat_bucket
            while Cf_b < Cf:
                Cf_b += max(flat_bucket, Cf_b // 4)
            tile_chunks[-1] += Cf_b - Cf  # all-padding chunks, last tile
            Cf = Cf_b
        owner = np.repeat(np.arange(n_tiles), tile_chunks).astype(np.int32)
        flat_ids = np.full(Cf * te, num_segments, np.int64)
        perm_pad = np.full(Cf * te, E, np.int64)
        starts = np.concatenate([[0], np.cumsum(tile_chunks)]) * te
        for t in range(n_tiles):
            cnt = int(per_tile[t])
            if cnt:
                s = int(starts[t])
                flat_ids[s : s + cnt] = sorted_ids[first[t] : last[t]]
                perm_pad[s : s + cnt] = order[first[t] : last[t]]
        flat_ids3d = flat_ids.reshape(Cf, te // 128, 128)
        return SortedSegments(
            ids3d=jnp.asarray(ids3d, jnp.int32),
            chunk_first=jnp.asarray(cf, jnp.int32),
            n_chunks=jnp.asarray(n_chunks, jnp.int32),
            perm=None if identity else jnp.asarray(order, jnp.int32),
            flat_ids3d=jnp.asarray(flat_ids3d, jnp.int32),
            owner=jnp.asarray(owner, jnp.int32),
            perm_pad=jnp.asarray(perm_pad, jnp.int32),
            num_segments=num_segments,
            n_ids=E,
            tn=tn,
            te=te,
            max_chunks=max_chunks,
            n_tiles=n_tiles,
            n_flat_chunks=Cf,
        )


def _make_kernel(cache_onehot: bool, two_d: bool = False):
    def kernel(chunk_first_ref, n_chunks_ref, ids_ref, data_ref, out_ref,
               *scratch):
        c = pl.program_id(3)
        n = pl.program_id(0)
        f = pl.program_id(1)
        b = pl.program_id(2)

        @pl.when(c == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        @pl.when(c < n_chunks_ref[n])
        def _():
            tn = out_ref.shape[0]
            sub, lane = ids_ref.shape[1], ids_ref.shape[2]
            te = sub * lane
            base = n * tn

            def build():
                ids = ids_ref[0]  # (te/128, 128)
                rows = (
                    jax.lax.broadcasted_iota(jnp.int32, (tn, sub, lane), 0)
                    + base
                )
                return (ids[None] == rows).astype(jnp.float32).reshape(tn, te)

            if cache_onehot:
                # the one-hot depends only on (n, c); build it on the first
                # (f, b) pass of each tile and reuse from VMEM scratch —
                # the build otherwise dominates kernel time
                oh_ref = scratch[0]

                @pl.when((f == 0) & (b == 0))
                def _():
                    oh_ref[c] = build()

                onehot = oh_ref[c]
            else:
                onehot = build()
            # 'ne,bec->nbc' on the MXU.  Measured: matmul passes are NOT the
            # bottleneck (bf16 single-pass == f32 HIGHEST end to end); the
            # kernel is grid-step-overhead bound, so keep the simple exact
            # form and minimize steps via larger tc (see the VMEM clamp).
            data = data_ref[:]
            dn = (((1,), (0,)), ((), ())) if two_d else (((1,), (1,)), ((), ()))
            _dot_accum(out_ref, onehot, data, dn)

    return kernel


def _dot_product(onehot, data, dn):
    """onehot @ data with the selected MXU precision mode (exact for f32)."""
    import os

    mode = os.environ.get("MGTPU_MXU_PREC", "split3")

    def dot(oh, d, prec):
        return jax.lax.dot_general(
            oh, d, dn, preferred_element_type=jnp.float32, precision=prec
        )

    if data.dtype == jnp.bfloat16:
        return dot(
            onehot.astype(jnp.bfloat16), data, jax.lax.Precision.DEFAULT
        )
    if mode == "split3":
        # Exact f32 one-hot matmul in 3 MXU passes instead of HIGHEST's 6:
        # the one-hot lhs is exactly representable in bf16, and f32 data
        # splits exactly into three bf16 limbs (8+8+8 of the 24 mantissa
        # bits), so onehot@(hi+mid+lo) with f32 accumulation is bit-exact.
        oh = onehot.astype(jnp.bfloat16)
        hi = data.astype(jnp.bfloat16)
        r1 = data - hi.astype(jnp.float32)
        mid = r1.astype(jnp.bfloat16)
        lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        p = jax.lax.Precision.DEFAULT
        return dot(oh, hi, p) + dot(oh, mid, p) + dot(oh, lo, p)
    prec = (
        jax.lax.Precision.DEFAULT
        if mode == "default"
        else jax.lax.Precision.HIGHEST
    )
    return dot(onehot, data, prec)


def _dot_accum(out_ref, onehot, data, dn):
    """out_ref += onehot @ data with the selected MXU precision mode."""
    out_ref[:] += _dot_product(onehot, data, dn)


def sorted_segment_sum(
    data: jax.Array,
    seg: SortedSegments,
    tc: int = 128,
    tb: int = 8,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """data: (B, E, C) or (E, C) float32, rows already in seg's sorted order
    (use segment_sum_by to apply seg.perm).  Returns (B, num_segments, C) /
    (num_segments, C)."""
    if interpret is None:
        # Mosaic kernels only compile on TPU; interpret elsewhere (tests/CPU)
        interpret = jax.default_backend() != "tpu"
    if data.ndim == 2:
        return _sorted_segment_sum_2d(data, seg, tc, interpret)
    B, E, C = data.shape
    assert E == seg.n_ids, (E, seg.n_ids)
    n_chunks_total = seg.ids3d.shape[0] - 1  # last row is the sentinel
    E_pad = n_chunks_total * seg.te
    tc = min(tc, _round_up(C, 128))
    tb_eff = min(tb, B if data.ndim == 3 else 1)
    # clamp tc so double-buffered data + out blocks fit in ~12MB VMEM;
    # full-width tc (== padded C) makes every chunk read contiguous, which
    # is the kernel's actual bottleneck (measured DMA-bound at ~90 GB/s
    # when tc < C forces strided 2KB row reads)
    dsize = 2 if data.dtype == jnp.bfloat16 else 4
    while tc > 128 and (
        2 * tb_eff * seg.te * tc * dsize + seg.tn * tb_eff * tc * 4
    ) > 12 * 1024 * 1024:
        tc //= 2
    C_pad = _round_up(C, tc)
    tb = min(tb, B)
    B_pad = _round_up(B, tb)
    # +seg.te: a zero chunk aligned with the sentinel ids row
    data = jnp.pad(
        data, ((0, B_pad - B), (0, E_pad + seg.te - E), (0, C_pad - C))
    )
    N_pad = seg.n_tiles * seg.tn
    grid = (seg.n_tiles, C_pad // tc, B_pad // tb, seg.max_chunks)

    # Overflow steps (c >= n_chunks[n]) are skipped by the kernel gate; the
    # index map clamps them onto the sentinel chunk at n_chunks_total.
    def ids_map(n, f, b, c, chunk_first, n_chunks):
        return (jnp.minimum(chunk_first[n] + c, n_chunks_total), 0, 0)

    def data_map(n, f, b, c, chunk_first, n_chunks):
        return (b, jnp.minimum(chunk_first[n] + c, n_chunks_total), f)

    # cache the per-(tile, chunk) one-hot in VMEM when it fits and there is
    # reuse across feature/batch tiles.  Opt-in (MGTPU_ONEHOT_CACHE=1): its
    # Mosaic compile has not been validated on the target TPU yet and a
    # hanging compile would sink the whole bench.
    import os

    n_fb = (C_pad // tc) * (B_pad // tb)
    cache_bytes = seg.max_chunks * seg.tn * seg.te * 4
    cache_onehot = (
        os.environ.get("MGTPU_ONEHOT_CACHE") == "1"
        and n_fb > 1
        and cache_bytes <= 6 * 1024 * 1024
    )
    scratch_shapes = (
        [pltpu.VMEM((seg.max_chunks, seg.tn, seg.te), jnp.float32)]
        if cache_onehot
        else []
    )
    out = pl.pallas_call(
        _make_kernel(cache_onehot),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, seg.te // 128, 128), ids_map),
                pl.BlockSpec((tb, seg.te, tc), data_map),
            ],
            out_specs=pl.BlockSpec(
                (seg.tn, tb, tc), lambda n, f, b, c, cf, nc: (n, b, f)
            ),
            scratch_shapes=scratch_shapes,
        ),
        out_shape=jax.ShapeDtypeStruct((N_pad, B_pad, C_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2
            * seg.n_tiles
            * seg.max_chunks
            * seg.te
            * seg.tn
            * B_pad
            * C_pad,
            bytes_accessed=E_pad * B_pad * C_pad * 4 + N_pad * B_pad * C_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(seg.chunk_first, seg.n_chunks, seg.ids3d, data)
    out = out[: seg.num_segments, :B, :C]
    return jnp.transpose(out, (1, 0, 2))  # (B, N, C)


def _sorted_segment_sum_2d(
    data: jax.Array,
    seg: SortedSegments,
    tc: int,
    interpret: bool,
) -> jax.Array:
    """(E, C) specialization: no batch axis, no output transpose, and data
    blocks are plain (te, tc) tiles of a 2D array — when tc == padded C the
    chunk read is one contiguous te*C burst, which is the DMA-granularity
    fix for the measured ~90 GB/s strided-read bottleneck (STATUS.md)."""
    E, C = data.shape
    assert E == seg.n_ids, (E, seg.n_ids)
    n_chunks_total = seg.ids3d.shape[0] - 1
    E_pad = n_chunks_total * seg.te
    dsize = 2 if data.dtype == jnp.bfloat16 else 4

    def vmem(t):
        # double-buffered data block + out block + onehot build temporaries
        return 2 * seg.te * t * dsize + seg.tn * t * 4

    C_128 = _round_up(C, 128)
    # prefer full-width blocks (contiguous chunk DMA) when they fit in VMEM
    tc = C_128 if vmem(C_128) <= 12 * 1024 * 1024 else min(tc, C_128)
    while tc > 128 and vmem(tc) > 12 * 1024 * 1024:
        tc //= 2
    C_pad = _round_up(C, tc)
    data = jnp.pad(data, ((0, E_pad + seg.te - E), (0, C_pad - C)))
    N_pad = seg.n_tiles * seg.tn
    grid = (seg.n_tiles, C_pad // tc, 1, seg.max_chunks)

    def ids_map(n, f, b, c, chunk_first, n_chunks):
        return (jnp.minimum(chunk_first[n] + c, n_chunks_total), 0, 0)

    def data_map(n, f, b, c, chunk_first, n_chunks):
        return (jnp.minimum(chunk_first[n] + c, n_chunks_total), f)

    import os

    cache_bytes = seg.max_chunks * seg.tn * seg.te * 4
    cache_onehot = (
        os.environ.get("MGTPU_ONEHOT_CACHE") == "1"
        and C_pad // tc > 1
        and cache_bytes <= 6 * 1024 * 1024
    )
    scratch_shapes = (
        [pltpu.VMEM((seg.max_chunks, seg.tn, seg.te), jnp.float32)]
        if cache_onehot
        else []
    )
    out = pl.pallas_call(
        _make_kernel(cache_onehot, two_d=True),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, seg.te // 128, 128), ids_map),
                pl.BlockSpec((seg.te, tc), data_map),
            ],
            out_specs=pl.BlockSpec(
                (seg.tn, tc), lambda n, f, b, c, cf, nc: (n, f)
            ),
            scratch_shapes=scratch_shapes,
        ),
        out_shape=jax.ShapeDtypeStruct((N_pad, C_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * seg.n_tiles * seg.max_chunks * seg.te * seg.tn * C_pad,
            bytes_accessed=E_pad * C_pad * dsize + N_pad * C_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(seg.chunk_first, seg.n_chunks, seg.ids3d, data)
    return out[: seg.num_segments, :C]


def _make_flat_kernel(weighted: bool = False):
    def kernel(owner_ref, ids_ref, *rest):
        if weighted:
            w_ref, data_ref, out_ref = rest
        else:
            data_ref, out_ref = rest
            w_ref = None
        c = pl.program_id(1)
        tn = out_ref.shape[0]
        sub, lane = ids_ref.shape[1], ids_ref.shape[2]
        te = sub * lane
        own = owner_ref[c]
        prev_own = owner_ref[jnp.maximum(c - 1, 0)]

        @pl.when((c == 0) | (own != prev_own))
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        ids = ids_ref[0]  # (te/128, 128)
        rows = (
            jax.lax.broadcasted_iota(jnp.int32, (tn, sub, lane), 0) + own * tn
        )
        oh3 = (ids[None] == rows).astype(jnp.float32)
        if weighted:
            # fold the per-edge weight into the one-hot: the weighted sum
            # rides the SAME matmul, deleting the separate E-row multiply
            # pass over the message matrix in HBM (profiled at ~0.5-1 ms
            # per direction at GBM scale).  bf16-message mode only: the
            # weighted one-hot is bf16-cast by _dot_product, rounding w to
            # bf16 exactly like the external multiply did — while the
            # bf16 x bf16 MXU product accumulates in f32 (no worse, one
            # fewer rounding than the old rounded-product path).
            oh3 = oh3 * w_ref[0][None]
        onehot = oh3.reshape(tn, te)
        _dot_accum(out_ref, onehot, data_ref[:], (((1,), (0,)), ((), ())))

    return kernel


def flat_segment_sum(
    data: jax.Array,
    seg: SortedSegments,
    interpret: Optional[bool] = None,
    w: Optional[jax.Array] = None,
) -> jax.Array:
    """Segment-sum of (E_flat, C) data already in seg's FLAT tile-aligned
    order (compose seg.perm_pad into the producing gather, or use
    flatten_rows).  One streaming pass over the flat chunks: every grid
    step DMAs a fresh contiguous (te, tc) block and accumulates into its
    owner tile — no skipped steps, no boundary re-reads.

    w: optional (E_flat,) / (E_flat, 1) per-edge weights in flat order
    (0 on padding slots).  bf16 data folds them into the kernel's one-hot
    (no separate multiply pass over the message matrix); f32 data applies
    them outside so the 3-limb exact path keeps splitting the true f32
    product (a weighted one-hot is not exactly bf16-representable)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    Ef, C = data.shape
    assert Ef == seg.n_flat_chunks * seg.te, (Ef, seg.n_flat_chunks, seg.te)
    weighted = False
    if w is not None:
        w = w.reshape(-1)
        assert w.shape[0] == Ef, (w.shape, Ef)
        if data.dtype == jnp.bfloat16:
            weighted = True
            w3d = w.astype(jnp.float32).reshape(
                seg.n_flat_chunks, seg.te // 128, 128
            )
        else:
            data = data * w[:, None].astype(data.dtype)
    dsize = 2 if data.dtype == jnp.bfloat16 else 4

    def vmem(t):
        # double-buffered data + out block + split3 limb temporaries
        limbs = seg.te * t * (4 + 3 * 2) if dsize == 4 else 0
        return 2 * seg.te * t * dsize + seg.tn * t * 4 + limbs

    C_128 = _round_up(C, 128)
    tc = C_128
    while tc > 128 and vmem(tc) > 12 * 1024 * 1024:
        tc //= 2
    C_pad = _round_up(C, tc)
    data = jnp.pad(data, ((0, 0), (0, C_pad - C)))
    N_pad = seg.n_tiles * seg.tn
    grid = (C_pad // tc, seg.n_flat_chunks)
    ids_spec = pl.BlockSpec((1, seg.te // 128, 128), lambda f, c, ow: (c, 0, 0))
    in_specs = [ids_spec]
    operands = [seg.flat_ids3d]
    if weighted:
        in_specs.append(
            pl.BlockSpec((1, seg.te // 128, 128), lambda f, c, ow: (c, 0, 0))
        )
        operands.append(w3d)
    in_specs.append(pl.BlockSpec((seg.te, tc), lambda f, c, ow: (c, f)))
    operands.append(data)
    out = pl.pallas_call(
        _make_flat_kernel(weighted),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (seg.tn, tc), lambda f, c, ow: (ow[c], f)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((N_pad, C_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * seg.n_flat_chunks * seg.te * seg.tn * C_pad
            * (3 if dsize == 4 else 1),
            bytes_accessed=Ef * C_pad * dsize + N_pad * C_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(seg.owner, *operands)
    return out[: seg.num_segments, :C]


def flatten_rows(data: jax.Array, seg: SortedSegments) -> jax.Array:
    """(E, C) rows in ORIGINAL index order -> (E_flat, C) flat tile-aligned
    order (padding slots -> zero rows) via one XLA gather."""
    zero = jnp.zeros((1,) + data.shape[1:], data.dtype)
    # promise_in_bounds: perm_pad is in [0, E] over the E+1-row extended
    # array by construction (see take_ib)
    return take_ib(jnp.concatenate([data, zero], axis=0), seg.perm_pad)


def segment_sum_by(
    data: jax.Array,
    seg: SortedSegments,
    tc: int = 128,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Like sorted_segment_sum but data rows are in the ORIGINAL index
    order.  2D data rides the flat tile-aligned kernel (the reorder gather
    doubles as the perm+padding step); 3D falls back to perm + tile-major
    kernel."""
    if data.ndim == 2:
        return flat_segment_sum(flatten_rows(data, seg), seg, interpret)
    if seg.perm is not None:
        data = jnp.take(data, seg.perm, axis=-2)
    return sorted_segment_sum(data, seg, tc, interpret=interpret)
