"""Windowed (locality-blocked) SpMM: contiguous window DMA + MXU blocks.

The composed SpMM (ops/spmm.py: XLA row gather -> Pallas flat segment-sum)
is bound by the per-row gather: 165k single-row DMAs at the measured
~33 ns/row issue rate (tools/bench_dma_gather.py; STATUS.md decision
record).  Real cohort graphs are NOT random, though: cross-omics edges
connect adjacent node slots (cohort.build_edges interleaves 3*gene+omics),
and PPI/GRN gene graphs have community structure.  This module exploits
that: if (almost) all sources of a destination tile fall inside one
aligned window of NW = nwin*Wb consecutive rows, the kernel can

  1. stream the window X[w0 : w0+NW, f-tile] with ONE contiguous DMA
     (full HBM rate instead of the per-row issue bound),
  2. accumulate the tile's weighted adjacency block
     A[tn, NW] += onehot_dst(tn, te) @ (onehot_src(NW, te) * w).T
     on the MXU from the ids alone (per edge chunk, VMEM scratch), and
  3. emit out[tile, f] = A @ window[f] as one dense MXU matmul per
     feature tile.

No per-edge message tensor is materialized and no per-row DMA is issued.
Out-of-window edges (hubs, long-range) spill to a residual edge set that
rides the existing composed path; the plan builder reports the split.

Reference parity: this implements the same gather-transform-reduce
contraction as torch_scatter's fused CUDA kernels behind PyG aggregation
(reference models/gcn_lib/sparse/torch_vertex.py:277-294) — redesigned
for the MXU + DMA model instead of CUDA's per-thread random access.

Precision: bf16 data -> single-pass MXU (matches the composed bf16 mode).
f32 data -> A is accumulated bit-exactly (0/1 one-hots x split3 weight
limbs), and the final A @ window runs at HIGHEST Mosaic precision
(~f32 accuracy; validated by allclose tests, not bit-equality).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multilevel_gnn_tpu.ops.pallas.segment_sum import (
    SortedSegments,
    flat_segment_sum,
    take_ib,
)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _geom_bucket(n: int, base: int, frac: int = 4) -> int:
    """Geometric size bucket: base, then +25% steps.  Linear buckets made
    every CV fold's chunk/residual count a fresh STATIC at production
    scale (E~60-160k: counts differ by hundreds across folds), recompiling
    the windowed kernels per fold — measured ~70-130 s/fold of remote
    compiles on the v5e tunnel.  25% granularity absorbs fold-to-fold
    variation while wasting <=25% padding."""
    b = base
    while b < n:
        b += max(base, b // frac)
    return b


NF_VARIANTS = (1, 2, 4, 8, 16)
# sub-window width: each src-sorted edge chunk addresses < SUBWIN rows of
# the tile window, so the per-chunk one-hot is (SUBWIN, te) not (NW, te)
SUBWIN = 512
# feature-tile width override for windowed_exec (tools/sweep_windowed.py);
# None = dtype heuristic (tuned on v5e at GBM scale)
TC_PREF_OVERRIDE = None


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class _WinSide:
    """Plan arrays for one direction (forward or transpose)."""

    ids3d: jax.Array      # (Cw+1, te/128, 128) int32 global dst ids
    srcoff3d: jax.Array   # (Cw+1, te/128, 128) int32 src offset within the
    #                       chunk's SUB-window (src - win_lo*Wb - base), SW pad
    chunk_base: jax.Array  # (Cw+1,) int32 sub-window base row within the
    #                        tile window (multiple of 128, <= NW - SW);
    #                        edges are src-sorted per tile so each te-chunk
    #                        spans < SW rows — the one-hot is (SW, te)
    #                        instead of (NW, te), 4x less VPU build work
    perm_pad: jax.Array   # (Cw*te,) int32 original edge id, E on padding
    win_lo: jax.Array     # (n_tiles,) int32 window start in Wb blocks
    # per nf variant: (S,) int32 step_tile / step_mm / step_chunk / step_f
    # / step_win (= win_lo[step_tile], pre-resolved: block-index maps only
    # support single-level scalar-prefetch indexing)
    steps: Tuple[
        Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array], ...
    ]
    n_tiles: int = dataclasses.field(metadata=dict(static=True))
    n_chunks: int = dataclasses.field(metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class WindowedPlan:
    """Host-precomputed windowed-SpMM plan for a static edge list.

    fwd aggregates src->dst; bwd is the transpose (dst->src) over exactly
    fwd's in-window edges, used by the custom VJP.  res_* carry the
    out-of-window residual (composed-path fallback); tres_* the transpose
    residual of the in-window set (edges whose TRANSPOSE is out-of-window).
    perm/inv_perm: optional node relabeling (applied to x rows at runtime).
    """

    fwd: _WinSide
    bwd: _WinSide
    # residual (composed path): original edge ids + segment meta
    res_idx: Optional[jax.Array]
    res_csr: Optional[SortedSegments]
    res_csc: Optional[SortedSegments]
    # transpose-residual of the in-window set (backward only)
    tres_idx: Optional[jax.Array]
    tres_csc: Optional[SortedSegments]
    perm: Optional[jax.Array]
    inv_perm: Optional[jax.Array]
    num_nodes: int = dataclasses.field(metadata=dict(static=True))
    n_edges: int = dataclasses.field(metadata=dict(static=True))
    # informational stats as 0-d ARRAYS (data fields): they vary per CV
    # fold, and a varying static would key a fresh jit compilation even
    # though every array shape is bucket-stable (tests/test_shape_stability)
    n_res: jax.Array = None
    n_tres: jax.Array = None
    in_window_frac: jax.Array = None
    tn: int = dataclasses.field(metadata=dict(static=True), default=128)
    te: int = dataclasses.field(metadata=dict(static=True), default=256)
    Wb: int = dataclasses.field(metadata=dict(static=True), default=512)
    nwin: int = dataclasses.field(metadata=dict(static=True), default=2)
    n_win_rows: int = dataclasses.field(metadata=dict(static=True), default=0)


def _best_window(srcs: np.ndarray, Wb: int, nwin: int, n_row_blocks: int):
    """Aligned window (start block k) maximizing in-window edge count."""
    NW = Wb * nwin
    if len(srcs) == 0:
        return 0, np.zeros(0, bool)
    cand = np.unique(srcs // Wb)
    cand = np.unique(np.concatenate([cand, np.maximum(cand - (nwin - 1), 0)]))
    cand = cand[cand <= max(n_row_blocks - nwin, 0)]
    if len(cand) == 0:
        cand = np.array([0])
    best_k, best_cnt, best_mask = 0, -1, None
    for k in cand:
        m = (srcs >= k * Wb) & (srcs < k * Wb + NW)
        c = int(m.sum())
        if c > best_cnt:
            best_k, best_cnt, best_mask = int(k), c, m
    return best_k, best_mask


def _build_side(
    src: np.ndarray,
    dst: np.ndarray,
    edge_id: np.ndarray,
    num_nodes: int,
    tn: int,
    te: int,
    Wb: int,
    nwin: int,
    n_row_blocks: int,
    n_edges_total: int,
) -> Tuple[_WinSide, np.ndarray]:
    """Window plan for one direction.  Returns (side, residual edge ids)."""
    NW = Wb * nwin
    SW = min(SUBWIN, NW)
    n_tiles = max(_round_up(num_nodes, tn) // tn, 1)
    tiles = dst // tn
    order = np.argsort(tiles, kind="stable")
    src, dst, edge_id, tiles = (
        src[order], dst[order], edge_id[order], tiles[order]
    )
    bounds = np.searchsorted(tiles, np.arange(n_tiles + 1))

    win_lo = np.zeros(n_tiles, np.int32)
    chunk_ids, chunk_off, chunk_perm = [], [], []
    chunk_bases, tile_chunks = [], []
    residual = []
    for t in range(n_tiles):
        lo, hi = bounds[t], bounds[t + 1]
        s, d, eid = src[lo:hi], dst[lo:hi], edge_id[lo:hi]
        k, m = _best_window(s, Wb, nwin, n_row_blocks)
        win_lo[t] = k
        if len(s):
            residual.append(eid[~m])
            s, d, eid = s[m], d[m], eid[m]
        # src-sort within the tile, then greedily pack chunks of <= te
        # edges each spanning < SW rows from a 128-aligned base
        so = np.argsort(s, kind="stable")
        s, d, eid = s[so], d[so], eid[so]
        rel = s - k * Wb
        nch = 0
        i = 0
        while i < len(s):
            base = min((int(rel[i]) // 128) * 128, NW - SW)
            j = min(i + te, len(s))
            # shrink to the span limit (rel sorted ascending)
            j = i + int(np.searchsorted(rel[i:j], base + SW, "left"))
            cnt = j - i
            pad = te - cnt
            chunk_ids.append(
                np.concatenate([d[i:j], np.full(pad, num_nodes, np.int64)])
            )
            chunk_off.append(
                np.concatenate(
                    [rel[i:j] - base, np.full(pad, SW, np.int64)]
                )
            )
            chunk_perm.append(
                np.concatenate([eid[i:j], np.full(pad, -1, np.int64)])
            )
            chunk_bases.append(base)
            nch += 1
            i = j
        tile_chunks.append(nch)

    tile_chunks = np.asarray(tile_chunks, np.int64)
    Cw = int(tile_chunks.sum())
    ids = (
        np.concatenate(chunk_ids) if Cw else np.zeros(0, np.int64)
    )
    offs = np.concatenate(chunk_off) if Cw else np.zeros(0, np.int64)
    perm = np.concatenate(chunk_perm) if Cw else np.zeros(0, np.int64)
    bases = (
        np.asarray(chunk_bases, np.int64) if Cw else np.zeros(0, np.int64)
    )
    # bucket the chunk count: Cw depends on the edge DISTRIBUTION, so
    # without padding every CV fold is a new static shape and recompiles
    # the step (same rationale as SortedSegments flat_bucket).  Padding
    # chunks are all-sentinel (weight 0 via perm -1 -> E) on the last tile.
    # GEOMETRIC buckets: the step-schedule length is Cw + n_tiles*nf, so a
    # stable Cw bucket makes every plan array fold-stable.
    Cw_b = _geom_bucket(max(Cw, 1), 32)
    if Cw_b != Cw:
        padn = Cw_b - Cw
        ids = np.concatenate([ids, np.full(padn * te, num_nodes, np.int64)])
        offs = np.concatenate([offs, np.full(padn * te, SW, np.int64)])
        perm = np.concatenate([perm, np.full(padn * te, -1, np.int64)])
        bases = np.concatenate([bases, np.zeros(padn, np.int64)])
        tile_chunks[-1] += padn
        Cw = Cw_b
    # sentinel all-padding chunk at index Cw
    ids = np.concatenate([ids, np.full(te, num_nodes, np.int64)])
    offs = np.concatenate([offs, np.full(te, SW, np.int64)])
    bases = np.concatenate([bases, np.zeros(1, np.int64)])

    steps = []
    owner = np.repeat(np.arange(n_tiles), tile_chunks)
    for nf in NF_VARIANTS:
        st, sm, sc, sf, sw = [], [], [], [], []
        base = 0
        for t in range(n_tiles):
            nch = int(tile_chunks[t])
            st += [t] * (nch + nf)
            sm += [0] * nch + [1] * nf
            sc += list(range(base, base + nch)) + [Cw] * nf
            sf += [0] * nch + list(range(nf))
            sw += [int(win_lo[t])] * (nch + nf)
            base += nch
        steps.append(
            tuple(
                jnp.asarray(np.asarray(a, np.int32))
                for a in (st, sm, sc, sf, sw)
            )
        )

    side = _WinSide(
        ids3d=jnp.asarray(
            ids.reshape(Cw + 1, te // 128, 128), jnp.int32
        ),
        srcoff3d=jnp.asarray(
            offs.reshape(Cw + 1, te // 128, 128), jnp.int32
        ),
        chunk_base=jnp.asarray(bases, jnp.int32),
        perm_pad=jnp.asarray(
            np.where(perm < 0, n_edges_total, perm), jnp.int32
        ),
        win_lo=jnp.asarray(win_lo, jnp.int32),
        steps=tuple(steps),
        n_tiles=n_tiles,
        n_chunks=Cw,
    )
    res = (
        np.concatenate(residual) if residual else np.zeros(0, np.int64)
    )
    return side, res


def choose_node_perm(
    src: np.ndarray,
    dst: np.ndarray,
    num_nodes: int,
    Wb: int = 512,
    nwin: int = 2,
    tn: int = 128,
    group: int = 1,
    hub_degree_pct: float = 99.0,
) -> Tuple[Optional[np.ndarray], float, float]:
    """Pick a node relabeling that maximizes the in-window edge fraction.

    Candidates: identity, and reverse-Cuthill-McKee computed on the graph
    with hub nodes (degree above the hub_degree_pct percentile) EXCLUDED
    from the adjacency (hubs defeat RCM's banding; their edges spill to
    the residual path either way).  group > 1 treats node slots in groups
    (the 3*gene+omics interleave: group=3 permutes genes, keeping
    cross-omics edges adjacent).  Returns (perm or None, frac_identity,
    frac_best) where perm maps old id -> new id.
    """
    from scipy.sparse import csr_matrix
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    def frac(s, d):
        total, ok = len(s), 0
        if total == 0:
            return 1.0
        tiles = d // tn
        n_blocks = _round_up(num_nodes, Wb) // Wb + nwin
        order = np.argsort(tiles, kind="stable")
        s = s[order]
        t_sorted = tiles[order]
        bounds = np.searchsorted(
            t_sorted, np.arange(_round_up(num_nodes, tn) // tn + 1)
        )
        for t in range(len(bounds) - 1):
            ss = s[bounds[t] : bounds[t + 1]]
            if len(ss):
                _, m = _best_window(ss, Wb, nwin, n_blocks)
                ok += int(m.sum())
        return ok / total

    f_id = frac(src, dst)
    if f_id > 0.97:
        return None, f_id, f_id

    g_src, g_dst = src // group, dst // group
    n_g = _round_up(num_nodes, group) // group
    deg = np.bincount(
        np.concatenate([g_src, g_dst]), minlength=n_g
    )
    thresh = np.percentile(deg[deg > 0], hub_degree_pct) if (deg > 0).any() else 0
    hub = deg > max(thresh, 1)
    keep = ~(hub[g_src] | hub[g_dst])
    ones = np.ones(int(keep.sum()), np.float32)
    adj = csr_matrix(
        (ones, (g_src[keep], g_dst[keep])), shape=(n_g, n_g)
    )
    gperm = np.asarray(
        reverse_cuthill_mckee(
            (adj + adj.T).tocsr(), symmetric_mode=True
        )
    )
    # gperm is new-order list of old gene ids -> old->new rank
    g_rank = np.empty(n_g, np.int64)
    g_rank[gperm] = np.arange(n_g)
    perm = (g_rank[np.arange(num_nodes) // group] * group
            + np.arange(num_nodes) % group)
    f_rcm = frac(perm[src], perm[dst])
    if f_rcm > f_id + 0.02:
        return perm.astype(np.int32), f_id, f_rcm
    return None, f_id, max(f_id, f_rcm)


def build_plan(
    senders: np.ndarray,
    receivers: np.ndarray,
    num_nodes: int,
    mask: Optional[np.ndarray] = None,
    perm: Optional[np.ndarray] = None,
    tn: int = 128,
    te: int = 256,
    Wb: int = 512,
    nwin: int = 2,
    res_len: Optional[int] = None,
    tres_len: Optional[int] = None,
) -> WindowedPlan:
    """Build the full windowed plan (forward + transpose + residuals).

    senders/receivers: (E,) host arrays in ORIGINAL node ids and original
    edge order (edge weights are later flattened by original edge id).
    perm: optional old->new node relabeling (see choose_node_perm).
    res_len/tres_len: force the (bucketed) residual array lengths — used
    by parallel/halo.py to make per-shard plans stack with uniform
    statics inside one shard_map program.
    """
    senders = np.asarray(senders, np.int64)
    receivers = np.asarray(receivers, np.int64)
    E = len(senders)
    edge_id = np.arange(E, dtype=np.int64)
    if mask is not None:
        m = np.asarray(mask, bool)
        senders, receivers, edge_id = senders[m], receivers[m], edge_id[m]
    valid = (
        (senders >= 0) & (senders < num_nodes)
        & (receivers >= 0) & (receivers < num_nodes)
    )
    senders, receivers, edge_id = (
        senders[valid], receivers[valid], edge_id[valid]
    )
    if perm is not None:
        p = np.asarray(perm, np.int64)
        src, dst = p[senders], p[receivers]
    else:
        src, dst = senders, receivers

    n_row_blocks = _round_up(num_nodes, Wb) // Wb + nwin
    fwd, res = _build_side(
        src, dst, edge_id, num_nodes, tn, te, Wb, nwin, n_row_blocks, E
    )
    res_set = np.zeros(E + 1, bool)
    res_set[res] = True
    in_win = ~res_set[edge_id]
    # transpose side over exactly the in-window edges
    bwd, tres = _build_side(
        dst[in_win], src[in_win], edge_id[in_win], num_nodes, tn, te, Wb,
        nwin, n_row_blocks, E,
    )

    def seg_for(ids_sub, n):
        return SortedSegments.build(ids_sub, num_nodes, te=te, flat_bucket=8)

    # residual counts are distribution-dependent; bucket them so CV folds
    # share executables (sentinel edge id = E reads a zero row / zero
    # weight at the take sites, and its segment id num_nodes is dropped
    # by SortedSegments as padding)
    def pad_idx(idx, forced=None):
        n = _geom_bucket(max(len(idx), 1), 512)
        if forced is not None:
            assert forced >= n, (forced, n)
            n = forced
        return np.concatenate([idx, np.full(n - len(idx), E, np.int64)])

    res_idx = pad_idx(res.astype(np.int64), res_len)
    tres_idx = pad_idx(tres.astype(np.int64), tres_len)

    def ids_for(base, idx):
        out = np.full(len(idx), num_nodes, np.int64)
        real = idx < E
        out[real] = base[np.searchsorted(edge_id, idx[real])]
        return out

    # residual composed-path metadata (original-id space)
    res_csr = seg_for(ids_for(receivers, res_idx), None)
    res_csc = seg_for(ids_for(senders, res_idx), None)
    # transpose residual aggregates d_x[src] += g[dst]*w: segments by
    # SENDER in the (possibly permuted) windowed space
    tres_csc = seg_for(ids_for(src, tres_idx), None)

    inv = None
    if perm is not None:
        inv = np.empty(num_nodes, np.int64)
        inv[perm] = np.arange(num_nodes)

    return WindowedPlan(
        fwd=fwd,
        bwd=bwd,
        res_idx=jnp.asarray(res_idx, jnp.int32) if len(res_idx) else None,
        res_csr=res_csr,
        res_csc=res_csc,
        tres_idx=jnp.asarray(tres_idx, jnp.int32) if len(tres_idx) else None,
        tres_csc=tres_csc,
        perm=jnp.asarray(perm, jnp.int32) if perm is not None else None,
        inv_perm=jnp.asarray(inv, jnp.int32) if inv is not None else None,
        num_nodes=num_nodes,
        n_edges=E,
        # REAL residual counts (res_idx is bucket-padded); data fields so
        # fold-varying values don't key fresh jit compilations
        n_res=np.int32(len(res)),
        n_tres=np.int32(len(tres)),
        in_window_frac=np.float32(in_win.sum() / max(len(edge_id), 1)),
        tn=tn,
        te=te,
        Wb=Wb,
        nwin=nwin,
        n_win_rows=n_row_blocks * Wb,
    )


# --------------------------------------------------------------------------
# kernel


def _win_kernel(nwin: int, f32_exact: bool):
    def kernel(
        step_tile, step_mm, step_chunk, step_f, step_win,  # scalar prefetch
        chunk_base,
        ids_ref, off_ref, w_ref, *win_and_out,
    ):
        wins = win_and_out[:nwin]
        out_ref = win_and_out[nwin]
        A = win_and_out[nwin + 1]
        s = pl.program_id(0)
        t = step_tile[s]
        first = (s == 0) | (t != step_tile[jnp.maximum(s - 1, 0)])
        tn = out_ref.shape[0]
        sub, lane = ids_ref.shape[1], ids_ref.shape[2]
        te = sub * lane
        Wb = wins[0].shape[0]
        SW = min(SUBWIN, A.shape[1])

        @pl.when(first)
        def _():
            A[:] = jnp.zeros_like(A)

        @pl.when(step_mm[s] == 0)
        def _():
            cb = pl.multiple_of(chunk_base[step_chunk[s]], 128)
            ids = ids_ref[0]  # (sub, lane)
            rows = (
                jax.lax.broadcasted_iota(jnp.int32, (tn, sub, lane), 0)
                + t * tn
            )
            w = w_ref[0]  # (sub, lane) f32
            # weight folded into the SMALL (tn, te) dst one-hot — the
            # (SW, te) src one-hot stays 0/1
            ohw = (ids[None] == rows).astype(jnp.float32) * w[None]
            offs = off_ref[0]  # (sub, lane)
            cols = jax.lax.broadcasted_iota(jnp.int32, (SW, sub, lane), 0)
            so = (
                (offs[None] == cols).astype(jnp.float32).reshape(SW, te)
            ).astype(jnp.bfloat16)
            dn = (((1,), (1,)), ((), ()))

            def dot(lhs3):
                return jax.lax.dot_general(
                    lhs3.reshape(tn, te).astype(jnp.bfloat16), so, dn,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT,
                )

            if f32_exact:
                # split3: exact three-limb bf16 decomposition of the
                # weighted one-hot (values w_e) — exact products vs 0/1
                hi = ohw.astype(jnp.bfloat16).astype(jnp.float32)
                r1 = ohw - hi
                mid = r1.astype(jnp.bfloat16).astype(jnp.float32)
                upd = dot(hi) + dot(mid) + dot(r1 - mid)
            else:
                upd = dot(ohw)
            cur = A[:, pl.ds(cb, SW)]
            A[:, pl.ds(cb, SW)] = cur + upd

        @pl.when(step_mm[s] == 1)
        def _():
            prec = (
                jax.lax.Precision.HIGHEST
                if f32_exact
                else jax.lax.Precision.DEFAULT
            )
            acc = None
            for i in range(nwin):
                a_i = A[:, i * Wb : (i + 1) * Wb]
                if not f32_exact:
                    a_i = a_i.astype(jnp.bfloat16)
                p = jax.lax.dot_general(
                    a_i, wins[i][:],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec,
                )
                acc = p if acc is None else acc + p
            out_ref[:] = acc

    return kernel


def windowed_exec(
    x2: jax.Array,
    w: jax.Array,
    side: _WinSide,
    plan: WindowedPlan,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Run one windowed side: x2 (N_rows>=num_nodes, C) in the plan's
    (possibly permuted) row space, w (E, 1) original-edge-order weights.
    Returns (num_nodes, C) f32."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    te, tn, Wb, nwin = plan.te, plan.tn, plan.Wb, plan.nwin
    NW = Wb * nwin
    C = x2.shape[1]
    dsize = 2 if x2.dtype == jnp.bfloat16 else 4
    f32_exact = dsize == 4
    tc_pref = TC_PREF_OVERRIDE or (512 if dsize == 2 else 256)
    tc_pref = min(tc_pref, _round_up(C, 128))
    # nf must be one of the precomputed step-array variants; pick the
    # smallest variant covering C at <= the preferred feature-tile width
    C128 = _round_up(C, 128)
    nf = next(
        v for v in NF_VARIANTS if v * tc_pref >= C128
    )
    tc = _round_up((C128 + nf - 1) // nf, 128)
    C_pad = nf * tc
    variant = NF_VARIANTS.index(nf)
    step_tile, step_mm, step_chunk, step_f, step_win = side.steps[variant]
    S = int(step_tile.shape[0])

    x2 = jnp.pad(
        x2, ((0, plan.n_win_rows - x2.shape[0]), (0, C_pad - C))
    )
    # weights to flat chunk slots (padding -> 0)
    wflat = jnp.take(
        jnp.concatenate([w[:, 0], jnp.zeros((1,), w.dtype)]),
        side.perm_pad, axis=0, mode="clip",
    ).astype(jnp.float32).reshape(side.n_chunks, te // 128, 128)
    # sentinel chunk
    wflat = jnp.concatenate(
        [wflat, jnp.zeros((1, te // 128, 128), jnp.float32)]
    )

    Cw = side.n_chunks
    in_specs = [
        pl.BlockSpec(
            (1, te // 128, 128),
            lambda s, st, sm, sc, sf, sw, cb: (sc[s], 0, 0),
        ),
        pl.BlockSpec(
            (1, te // 128, 128),
            lambda s, st, sm, sc, sf, sw, cb: (sc[s], 0, 0),
        ),
        pl.BlockSpec(
            (1, te // 128, 128),
            lambda s, st, sm, sc, sf, sw, cb: (sc[s], 0, 0),
        ),
    ]
    for i in range(nwin):
        in_specs.append(
            pl.BlockSpec(
                (Wb, tc),
                (lambda i: (
                    lambda s, st, sm, sc, sf, sw, cb: (sw[s] + i, sf[s])
                ))(i),
            )
        )
    N_out = side.n_tiles * tn
    out = pl.pallas_call(
        _win_kernel(nwin, f32_exact),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6,
            grid=(S,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (tn, tc), lambda s, st, sm, sc, sf, sw, cb: (st[s], sf[s])
            ),
            scratch_shapes=[pltpu.VMEM((tn, NW), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((N_out, C_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * S * tn * NW * max(te, tc),
            bytes_accessed=side.n_tiles * nf * NW * tc * dsize
            + N_out * C_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        step_tile, step_mm, step_chunk, step_f, step_win,
        side.chunk_base,
        side.ids3d, side.srcoff3d, wflat,
        *([x2] * nwin),
    )
    return out[: plan.num_nodes, :C]


# --------------------------------------------------------------------------
# permutation helper (exact-gather backward: transpose of a permutation
# gather is the inverse-permutation gather, no scatter needed)


@jax.custom_vjp
def permute_rows(x2, perm, inv):
    # perm is a full permutation: in-bounds by construction
    return take_ib(x2, perm)


def _perm_fwd(x2, perm, inv):
    return permute_rows(x2, perm, inv), (perm, inv)


def _perm_bwd(res, g):
    perm, inv = res
    return (
        take_ib(g, inv),
        np.zeros(perm.shape, jax.dtypes.float0),
        np.zeros(inv.shape, jax.dtypes.float0),
    )


permute_rows.defvjp(_perm_fwd, _perm_bwd)


# --------------------------------------------------------------------------
# top-level custom-VJP op (2D rows; ops/spmm.py handles batching/layout)


def _res_take(arr, idx):
    """Gather residual edges by ORIGINAL edge id; the bucket-padding
    sentinel id == len(arr) reads an appended zero row (zero weight /
    node 0), so padded entries contribute nothing."""
    ext = jnp.concatenate([arr, jnp.zeros((1,) + arr.shape[1:], arr.dtype)])
    return take_ib(ext, idx)


@jax.custom_vjp
def windowed_spmm_2d(x2, w, senders, receivers, plan):
    """out[n] = sum_{e: recv[e]=n} x2[send[e]] * w[e, 0], windowed.

    x2: (N, C) in ORIGINAL row order; w: (E, 1); senders/receivers: (E,)
    original edge arrays (used only for the residual edges).  Returns
    (N, C) f32.  w and the index arrays are non-differentiable.
    """
    # to-permuted-space: xp[new] = x2[inv_perm[new]]; back: out[old] =
    # out_p[perm[old]]
    xp = (
        permute_rows(x2, plan.inv_perm, plan.perm)
        if plan.perm is not None
        else x2
    )
    out_p = windowed_exec(xp, w, plan.fwd, plan)
    out = (
        permute_rows(out_p, plan.perm, plan.inv_perm)
        if plan.perm is not None
        else out_p
    )
    if plan.res_idx is not None:
        # composed fallback on the residual edges (original row space);
        # weights follow x2's dtype so bf16 message mode stays single-pass
        # in the flat kernel (f32 promotion would force the 3-limb path)
        r_send = _res_take(senders, plan.res_idx)
        r_w = _res_take(w, plan.res_idx).astype(x2.dtype)
        ext = jnp.concatenate([r_send, jnp.zeros((1,), r_send.dtype)])
        flat_idx = jnp.take(ext, plan.res_csr.perm_pad, axis=0)
        wext = jnp.concatenate([r_w, jnp.zeros((1, 1), r_w.dtype)])
        flat_w = jnp.take(wext, plan.res_csr.perm_pad, axis=0)
        msg = take_ib(x2, flat_idx)
        out = out + flat_segment_sum(msg, plan.res_csr, w=flat_w)
    return out


def _wspmm_fwd(x2, w, senders, receivers, plan):
    out = windowed_spmm_2d(x2, w, senders, receivers, plan)
    # zero-size dtype witness: the backward runs at the FORWARD's message
    # precision (bf16 mode would otherwise silently fall back to the ~1.5x
    # slower f32-exact kernel variant on the cotangent side)
    proto = jnp.zeros((0,), x2.dtype)
    return out, (w, senders, receivers, plan, proto)


def _wspmm_bwd(res, g):
    w, senders, receivers, plan, proto = res
    gd = g.astype(proto.dtype)
    gp = (
        permute_rows(gd, plan.inv_perm, plan.perm)
        if plan.perm is not None
        else gd
    )
    dxp = windowed_exec(gp, w, plan.bwd, plan)
    if plan.tres_idx is not None:
        # in-window edges whose transpose fell out of window: composed
        # d_x[src] += g[dst] * w in the PERMUTED space
        t_recv = _res_take(receivers, plan.tres_idx)
        if plan.perm is not None:
            t_recv = jnp.take(plan.perm, t_recv, axis=0)
        t_w = _res_take(w, plan.tres_idx).astype(gd.dtype)
        ext = jnp.concatenate([t_recv, jnp.zeros((1,), t_recv.dtype)])
        flat_idx = jnp.take(ext, plan.tres_csc.perm_pad, axis=0)
        wext = jnp.concatenate([t_w, jnp.zeros((1, 1), t_w.dtype)])
        flat_w = jnp.take(wext, plan.tres_csc.perm_pad, axis=0)
        msg = take_ib(gp, flat_idx)
        dxp = dxp + flat_segment_sum(msg, plan.tres_csc, w=flat_w)
    dx = (
        permute_rows(dxp, plan.perm, plan.inv_perm)
        if plan.perm is not None
        else dxp
    )
    if plan.res_idx is not None:
        r_recv = _res_take(receivers, plan.res_idx)
        r_w = _res_take(w, plan.res_idx).astype(gd.dtype)
        ext = jnp.concatenate([r_recv, jnp.zeros((1,), r_recv.dtype)])
        flat_idx = jnp.take(ext, plan.res_csc.perm_pad, axis=0)
        wext = jnp.concatenate([r_w, jnp.zeros((1, 1), r_w.dtype)])
        flat_w = jnp.take(wext, plan.res_csc.perm_pad, axis=0)
        msg = take_ib(gd, flat_idx)
        dx = dx + flat_segment_sum(msg, plan.res_csc, w=flat_w)
    if dx.dtype != proto.dtype:
        dx = dx.astype(proto.dtype)  # cotangent in the primal x2 dtype

    def z(a):
        if a is None:
            return None
        if jnp.issubdtype(a.dtype, jnp.floating):
            return jnp.zeros(a.shape, a.dtype)
        return np.zeros(a.shape, jax.dtypes.float0)

    return (
        dx,
        jnp.zeros_like(w),
        np.zeros(senders.shape, jax.dtypes.float0),
        np.zeros(receivers.shape, jax.dtypes.float0),
        jax.tree.map(z, plan),
    )


windowed_spmm_2d.defvjp(_wspmm_fwd, _wspmm_bwd)
