"""Boundary-only halo exchange for edge-partitioned GNN aggregation
(SURVEY.md §5.7 design; VERDICT r1 item #10).

The full-psum path (edge_partition.py) all-reduces (N, C) node partials per
conv — replicated traffic that caps multi-host scaling.  This module keeps
node features SHARDED on the mesh 'model' axis and exchanges only the
boundary rows each shard actually reads:

  * nodes are block-partitioned: shard p owns rows [p*Nl, (p+1)*Nl).
  * each edge lives on the shard owning its RECEIVER, so every segment
    reduction is local — no output collective at all.
  * edges split into INTERIOR (sender owned locally) and BOUNDARY (sender
    remote).  The interior aggregation consumes only local rows; the
    boundary aggregation reads halo rows delivered by a single
    all_to_all of (k, H, C) — H = max rows any shard pair exchanges.
  * the interior matmul/segment-sum is scheduled before the all_to_all's
    consumer, so XLA's latency-hiding scheduler overlaps the exchange
    with interior compute.

Bytes on wire per conv: k*H*C vs the psum's ~2*(k-1)/k * N*C — at GBM
scale with a random 150k-edge graph H ~ Nl (dense cuts), but on
locality-partitioned graphs (the multi-host target) H << Nl;
tests/test_halo.py measures the HLO collective bytes of both paths.

All metadata is host-precomputed per fold (static topology), mirroring
SortedSegments' role for the single-chip kernels.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from multilevel_gnn_tpu.core.graph import Graph
from multilevel_gnn_tpu.ops import segment as seg_ops


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HaloPartition:
    """Host-precomputed halo-exchange metadata for one Graph on k shards.

    Per-shard arrays are stacked on a leading (k,) axis and sharded on the
    mesh 'model' axis inside shard_map (each shard sees its own row).

    senders_ext: (k, E_l) int32 — sender index in the shard's EXTENDED
        local space [0, Nl + k*H): local rows first, then halo slot
        (q*H + j) for the j-th row received from shard q.
    receivers_loc: (k, E_l) int32 — receiver index in [0, Nl).
    edge_sel: (k, E_l) int32 — position of this local edge in the ORIGINAL
        edge array (for gathering per-edge runtime data, e.g. weights);
        padding slots -> E (one-past-end sentinel).
    edge_mask: (k, E_l) bool — False on padding.
    interior: (k, E_l) bool — True where the sender is locally owned;
        interior and boundary edges are contiguous (interior first).
    send_idx: (k, k, H) int32 — rows (LOCAL indices) shard q sends to p:
        send_idx[q, p, :]; padding -> 0 (never referenced by receivers).
    deg: (k, Nl) float32 — global in-degree of owned nodes (for mean).
    """

    senders_ext: jax.Array
    receivers_loc: jax.Array
    edge_sel: jax.Array
    edge_mask: jax.Array
    interior: jax.Array
    send_idx: jax.Array
    deg: jax.Array
    k: int = dataclasses.field(metadata=dict(static=True))
    n_local: int = dataclasses.field(metadata=dict(static=True))
    halo: int = dataclasses.field(metadata=dict(static=True))
    n_edges_local: int = dataclasses.field(metadata=dict(static=True))
    n_nodes: int = dataclasses.field(metadata=dict(static=True))
    n_edges: int = dataclasses.field(metadata=dict(static=True))
    # optional per-shard Pallas flat-segment metadata (leading (k,) on every
    # array leaf; statics uniform across shards — see _stack_segments).
    # When present, the in-shard aggregations ride the same MXU
    # sorted-segment-sum kernel family as the single-chip path (zero XLA
    # scatter in forward or backward on the sharded step).
    seg_int_fwd: Optional[object] = None  # interior edges by receiver
    seg_int_bwd: Optional[object] = None  # interior edges by sender
    seg_bnd_fwd: Optional[object] = None  # boundary edges by receiver
    seg_bnd_bwd: Optional[object] = None  # boundary edges by halo slot
    seg_send: Optional[object] = None  # send-gather transpose (by local row)
    # optional per-shard WindowedPlan (stacked, uniform statics): the
    # INTERIOR aggregation rides the locality-blocked windowed kernel —
    # the single-chip winner (VERDICT r2 #9); window ranges are
    # ownership-local by construction.  Boundary edges stay on the flat
    # kernel (halo slots have no locality).
    win_plan: Optional[object] = None


def _stack_segments(segs):
    """Stack per-shard SortedSegments into one pytree with a leading (k,)
    axis on every array leaf and UNIFORM statics (shard_map runs one SPMD
    program, so flat chunk counts / max_chunks are padded to the max over
    shards with zero-contribution all-padding chunks)."""
    from multilevel_gnn_tpu.ops.pallas.segment_sum import SortedSegments

    te = segs[0].te
    n_tiles = segs[0].n_tiles
    n_ids = segs[0].n_ids
    num_segments = segs[0].num_segments
    assert all(
        s.te == te and s.n_tiles == n_tiles and s.n_ids == n_ids
        and s.num_segments == num_segments
        for s in segs
    )
    Cf = max(s.n_flat_chunks for s in segs)
    mc = max(s.max_chunks for s in segs)
    flat_ids3d, owner, perm_pad, ids3d, perm = [], [], [], [], []
    for s in segs:
        fi = np.asarray(s.flat_ids3d)
        ow = np.asarray(s.owner)
        pp = np.asarray(s.perm_pad)
        pad = Cf - s.n_flat_chunks
        if pad:
            fi = np.concatenate(
                [fi, np.full((pad, te // 128, 128), num_segments, fi.dtype)]
            )
            ow = np.concatenate([ow, np.full(pad, n_tiles - 1, ow.dtype)])
            pp = np.concatenate([pp, np.full(pad * te, n_ids, pp.dtype)])
        flat_ids3d.append(fi)
        owner.append(ow)
        perm_pad.append(pp)
        ids3d.append(np.asarray(s.ids3d))
        perm.append(
            np.arange(n_ids, dtype=np.int32)
            if s.perm is None
            else np.asarray(s.perm)
        )
    return SortedSegments(
        ids3d=jnp.asarray(np.stack(ids3d)),
        chunk_first=jnp.stack([s.chunk_first for s in segs]),
        n_chunks=jnp.stack([s.n_chunks for s in segs]),
        perm=jnp.asarray(np.stack(perm)),
        flat_ids3d=jnp.asarray(np.stack(flat_ids3d)),
        owner=jnp.asarray(np.stack(owner)),
        perm_pad=jnp.asarray(np.stack(perm_pad)),
        num_segments=num_segments,
        n_ids=n_ids,
        tn=segs[0].tn,
        te=te,
        max_chunks=mc,
        n_tiles=n_tiles,
        n_flat_chunks=Cf,
    )


def _local_segments(seg):
    """Slice one shard's SortedSegments out of a stacked pytree (inside
    shard_map, where every array leaf carries a leading (1,) shard slice)."""
    import dataclasses as _dc

    return _dc.replace(
        seg,
        ids3d=seg.ids3d[0],
        chunk_first=seg.chunk_first[0],
        n_chunks=seg.n_chunks[0],
        perm=seg.perm[0],
        flat_ids3d=seg.flat_ids3d[0],
        owner=seg.owner[0],
        perm_pad=seg.perm_pad[0],
    )


def _pad_winside(side, Cm: int, S_max: tuple, num_nodes: int, te: int,
                 n_edges: int):
    """Pad one _WinSide to uniform statics: n_chunks -> Cm (all-sentinel
    padding chunks inserted BEFORE the trailing sentinel chunk, so existing
    step chunk indices stay valid) and each step-variant length to
    S_max[v] (padded with copies of the FINAL mm step — idempotent: it
    re-emits the last tile's last feature block from the unchanged A
    scratch)."""
    import dataclasses as _dc

    Cw = side.n_chunks
    pad = Cm - Cw
    ids3d = np.asarray(side.ids3d)
    off3d = np.asarray(side.srcoff3d)
    bases = np.asarray(side.chunk_base)
    perm_pad = np.asarray(side.perm_pad)
    if pad:
        sent_ids = np.full((pad, te // 128, 128), num_nodes, ids3d.dtype)
        # the existing sentinel chunk (index Cw) carries the correct
        # offset sentinel — replicate it
        sent_off = np.repeat(off3d[Cw:Cw + 1], pad, axis=0)
        ids3d = np.concatenate([ids3d[:Cw], sent_ids, ids3d[Cw:]])
        off3d = np.concatenate([off3d[:Cw], sent_off, off3d[Cw:]])
        bases = np.concatenate(
            [bases[:Cw], np.zeros(pad, bases.dtype), bases[Cw:]]
        )
        perm_pad = np.concatenate(
            [perm_pad, np.full(pad * te, n_edges, perm_pad.dtype)]
        )
    steps = []
    for v, (st, sm, sc, sf, sw) in enumerate(side.steps):
        st, sm, sc, sf, sw = (np.asarray(a) for a in (st, sm, sc, sf, sw))
        if pad:
            sc = np.where(sc == Cw, Cm, sc)  # sentinel chunk moved
        extra = S_max[v] - len(st)
        if extra:
            assert sm[-1] == 1, "final step must be an mm emit"
            st = np.concatenate([st, np.full(extra, st[-1], st.dtype)])
            sm = np.concatenate([sm, np.ones(extra, sm.dtype)])
            sc = np.concatenate([sc, np.full(extra, Cm, sc.dtype)])
            sf = np.concatenate([sf, np.full(extra, sf[-1], sf.dtype)])
            sw = np.concatenate([sw, np.full(extra, sw[-1], sw.dtype)])
        steps.append((st, sm, sc, sf, sw))
    return _dc.replace(
        side,
        ids3d=ids3d, srcoff3d=off3d, chunk_base=bases, perm_pad=perm_pad,
        steps=tuple(tuple(a for a in s) for s in steps),
        n_chunks=Cm,
    ), steps


def _stack_plans(plans):
    """Stack per-shard WindowedPlans (leading (k,) axis, uniform statics):
    pad chunk counts / step lengths / residual arrays to the max over
    shards; SortedSegments ride _stack_segments.  perm must be None (halo
    shards keep the ownership-local row order)."""
    import dataclasses as _dc
    import jax.numpy as _jnp

    from multilevel_gnn_tpu.ops.pallas.windowed import WindowedPlan, _WinSide

    p0 = plans[0]
    assert all(
        p.num_nodes == p0.num_nodes
        and p.n_edges == p0.n_edges
        and p.fwd.n_tiles == p0.fwd.n_tiles
        and p.te == p0.te and p.tn == p0.tn
        and p.Wb == p0.Wb and p.nwin == p0.nwin
        and p.n_win_rows == p0.n_win_rows
        for p in plans
    )
    assert all(p.perm is None for p in plans)

    def stack_side(get):
        sides = [get(p) for p in plans]
        Cm = max(s.n_chunks for s in sides)
        S_max = tuple(
            max(len(np.asarray(s.steps[v][0])) for s in sides)
            for v in range(len(sides[0].steps))
        )
        padded, step_arrays = [], []
        for s in sides:
            ps, steps = _pad_winside(
                s, Cm, S_max, p0.num_nodes, p0.te, p0.n_edges
            )
            padded.append(ps)
            step_arrays.append(steps)
        return _WinSide(
            ids3d=_jnp.asarray(np.stack([np.asarray(s.ids3d) for s in padded])),
            srcoff3d=_jnp.asarray(
                np.stack([np.asarray(s.srcoff3d) for s in padded])
            ),
            chunk_base=_jnp.asarray(
                np.stack([np.asarray(s.chunk_base) for s in padded])
            ),
            perm_pad=_jnp.asarray(
                np.stack([np.asarray(s.perm_pad) for s in padded])
            ),
            win_lo=_jnp.asarray(
                np.stack([np.asarray(s.win_lo) for s in padded])
            ),
            steps=tuple(
                tuple(
                    _jnp.asarray(
                        np.stack([step_arrays[i][v][j] for i in range(len(padded))])
                    )
                    for j in range(5)
                )
                for v in range(len(padded[0].steps))
            ),
            n_tiles=padded[0].n_tiles,
            n_chunks=Cm,
        )

    def stack_idx(get):
        idxs = [np.asarray(get(p)) for p in plans]
        L = max(len(i) for i in idxs)
        return _jnp.asarray(
            np.stack([
                np.concatenate(
                    [i, np.full(L - len(i), p0.n_edges, i.dtype)]
                )
                for i in idxs
            ])
        )

    return WindowedPlan(
        fwd=stack_side(lambda p: p.fwd),
        bwd=stack_side(lambda p: p.bwd),
        res_idx=stack_idx(lambda p: p.res_idx),
        res_csr=_stack_segments([p.res_csr for p in plans]),
        res_csc=_stack_segments([p.res_csc for p in plans]),
        tres_idx=stack_idx(lambda p: p.tres_idx),
        tres_csc=_stack_segments([p.tres_csc for p in plans]),
        perm=None,
        inv_perm=None,
        num_nodes=p0.num_nodes,
        n_edges=p0.n_edges,
        n_res=_jnp.asarray(np.stack([np.asarray(p.n_res) for p in plans])),
        n_tres=_jnp.asarray(np.stack([np.asarray(p.n_tres) for p in plans])),
        in_window_frac=_jnp.asarray(
            np.stack([np.asarray(p.in_window_frac) for p in plans])
        ),
        tn=p0.tn,
        te=p0.te,
        Wb=p0.Wb,
        nwin=p0.nwin,
        n_win_rows=p0.n_win_rows,
    )


def _local_plan(plan):
    """Slice one shard's WindowedPlan out of a stacked pytree (inside
    shard_map: every array leaf has a leading (1,) shard slice)."""
    import jax as _jax

    return _jax.tree_util.tree_map(lambda a: a[0], plan)


def build_halo_partition(
    graph: Graph, k: int, pallas: bool = False, windowed: bool = False
) -> HaloPartition:
    """Partition `graph` for k shards (host-side, numpy).

    windowed (requires pallas): per-shard windowed-SpMM plans for the
    interior aggregations (stacked with uniform statics)."""
    send = np.asarray(graph.senders)
    recv = np.asarray(graph.receivers)
    mask = np.asarray(graph.edge_mask)
    send, recv = send[mask], recv[mask]
    order = np.arange(len(np.asarray(graph.senders)))[mask]
    N, E = graph.n_nodes, len(send)
    Nl = _round_up(N, k) // k
    owner_s, owner_r = send // Nl, recv // Nl

    # halo sets: rows shard q sends to shard p (unique, sorted)
    halo_rows = {}
    H = 1
    for p in range(k):
        for q in range(k):
            if p == q:
                continue
            sel = (owner_r == p) & (owner_s == q)
            rows = np.unique(send[sel])
            halo_rows[(q, p)] = rows
            H = max(H, len(rows))

    send_idx = np.zeros((k, k, H), np.int32)
    for (q, p), rows in halo_rows.items():
        send_idx[q, p, : len(rows)] = rows - q * Nl

    # per-shard edge lists: interior first, then boundary
    per_shard = []
    E_l = 1
    for p in range(k):
        mine = np.where(owner_r == p)[0]
        interior = mine[owner_s[mine] == p]
        boundary = mine[owner_s[mine] != p]
        s_ext = np.empty(len(mine), np.int64)
        s_ext[: len(interior)] = send[interior] - p * Nl
        # boundary senders -> halo slot Nl + q*H + pos-in-halo-list
        bs, bq = send[boundary], owner_s[boundary]
        pos = np.empty(len(boundary), np.int64)
        for q in range(k):
            m = bq == q
            if m.any():
                pos[m] = np.searchsorted(halo_rows[(q, p)], bs[m]) + q * H
        s_ext[len(interior) :] = Nl + pos
        r_loc = np.concatenate([recv[interior], recv[boundary]]) - p * Nl
        esel = np.concatenate([order[interior], order[boundary]])
        per_shard.append((s_ext, r_loc, esel, len(interior)))
        E_l = max(E_l, len(mine))

    senders_ext = np.zeros((k, E_l), np.int32)
    receivers_loc = np.zeros((k, E_l), np.int32)
    edge_sel = np.full((k, E_l), graph.num_padded_edges, np.int32)
    edge_mask = np.zeros((k, E_l), bool)
    interior_m = np.zeros((k, E_l), bool)
    for p, (s_ext, r_loc, esel, n_int) in enumerate(per_shard):
        n = len(s_ext)
        senders_ext[p, :n] = s_ext
        receivers_loc[p, :n] = r_loc
        edge_sel[p, :n] = esel
        edge_mask[p, :n] = True
        interior_m[p, :n_int] = True

    deg = np.zeros((k, Nl), np.float32)
    cnt = np.bincount(recv, minlength=k * Nl).astype(np.float32)
    for p in range(k):
        deg[p] = cnt[p * Nl : (p + 1) * Nl]

    segs = {}
    if pallas:
        from multilevel_gnn_tpu.ops.pallas.segment_sum import SortedSegments
        from multilevel_gnn_tpu.ops.pallas.tuning import tuned_te

        te = tuned_te()

        def per_shard(ids_fn, mask_fn, num_segments):
            return _stack_segments([
                SortedSegments.build(
                    ids_fn(p), num_segments, te=te, mask=mask_fn(p),
                    flat_bucket=1,
                )
                for p in range(k)
            ])

        segs = dict(
            seg_int_fwd=per_shard(
                lambda p: receivers_loc[p],
                lambda p: edge_mask[p] & interior_m[p], Nl,
            ),
            seg_int_bwd=per_shard(
                lambda p: senders_ext[p],
                lambda p: edge_mask[p] & interior_m[p], Nl,
            ),
            seg_bnd_fwd=per_shard(
                lambda p: receivers_loc[p],
                lambda p: edge_mask[p] & ~interior_m[p], Nl,
            ),
            seg_bnd_bwd=per_shard(
                lambda p: np.maximum(senders_ext[p] - Nl, 0),
                lambda p: edge_mask[p] & ~interior_m[p], k * H,
            ),
            # send gather: padding slots of send_idx are row 0 — their
            # halo rows are never referenced by any boundary edge, so the
            # backward segment-sum gets zero cotangents there (harmless)
            seg_send=_stack_segments([
                SortedSegments.build(
                    send_idx[p].reshape(-1), Nl, te=te, flat_bucket=1
                )
                for p in range(k)
            ]),
        )
        if windowed:
            from multilevel_gnn_tpu.ops.pallas.windowed import build_plan

            def shard_plan(p, res_len=None, tres_len=None):
                return build_plan(
                    senders_ext[p], receivers_loc[p], Nl,
                    mask=edge_mask[p] & interior_m[p],
                    res_len=res_len, tres_len=tres_len,
                )

            plans = [shard_plan(p) for p in range(k)]
            # second pass with forced residual lengths so every shard's
            # plan stacks with uniform statics
            lr = max(int(p.res_idx.shape[0]) for p in plans)
            lt = max(int(p.tres_idx.shape[0]) for p in plans)
            if any(
                int(p.res_idx.shape[0]) != lr
                or int(p.tres_idx.shape[0]) != lt
                for p in plans
            ):
                plans = [
                    shard_plan(p, res_len=lr, tres_len=lt) for p in range(k)
                ]
            segs["win_plan"] = _stack_plans(plans)

    return HaloPartition(
        **segs,
        senders_ext=jnp.asarray(senders_ext),
        receivers_loc=jnp.asarray(receivers_loc),
        edge_sel=jnp.asarray(edge_sel),
        edge_mask=jnp.asarray(edge_mask),
        interior=jnp.asarray(interior_m),
        send_idx=jnp.asarray(send_idx),
        deg=jnp.asarray(deg),
        k=k,
        n_local=Nl,
        halo=H,
        n_edges_local=E_l,
        n_nodes=N,
        n_edges=E,
    )


def halo_gather_scatter(
    x: jax.Array,
    hp: HaloPartition,
    mesh: Mesh,
    reduce: str = "sum",
    edge_weight: Optional[jax.Array] = None,
    axis: str = "model",
) -> jax.Array:
    """Edge-partitioned aggregation with boundary-only halo exchange.

    x: (.., N_pad, C) input, N_pad = k * n_local (pad_nodes_for) — consumed
    NODE-SHARDED on `axis` (each shard touches only its own block, so the
    autodiff transpose needs no collective on d_x; GSPMD reshards a
    replicated input with a local slice).  Returns (.., N_pad, C) SHARDED
    on `axis` over the node dim (a global-view array; slice [:n_nodes]
    after materializing).  The interior aggregation is emitted before the
    all_to_all consumer so XLA overlaps exchange with interior compute.

    When hp carries per-shard Pallas metadata (build_halo_partition(...,
    pallas=True)), both in-shard aggregations and the send-gather backward
    ride the MXU sorted-segment-sum kernels — zero XLA scatter in forward
    or backward, same kernel family as the single-chip path.
    """
    k, Nl, H = hp.k, hp.n_local, hp.halo
    if edge_weight is not None:
        w = edge_weight if edge_weight.ndim > 1 else edge_weight[:, None]
        zero = jnp.zeros((1,) + w.shape[1:], w.dtype)
        w_full = jnp.take(
            jnp.concatenate([w, zero], axis=0), hp.edge_sel, axis=0
        )  # (k, E_l, 1)
    else:
        w_full = jnp.ones((k, hp.n_edges_local, 1), x.dtype)
    use_pallas = hp.seg_int_fwd is not None
    use_windowed = use_pallas and hp.win_plan is not None
    seg_args = (
        (hp.seg_int_fwd, hp.seg_int_bwd, hp.seg_bnd_fwd, hp.seg_bnd_bwd,
         hp.seg_send)
        if use_pallas
        else ()
    )
    if use_windowed:
        seg_args = seg_args + (hp.win_plan,)

    def local(x, s_ext, r_loc, emask, interior, send_idx, deg, w, *segs):
        # shard_map drops the leading (1,)-sized shard axis slices
        s_ext, r_loc = s_ext[0], r_loc[0]
        emask, interior = emask[0], interior[0]
        send_idx, deg, w = send_idx[0], deg[0], w[0]
        xl = x  # node-sharded input: this shard's (.., Nl, C) block
        send_flat = send_idx.reshape(-1)

        # the named scopes land in HLO op metadata so the overlap
        # precondition — interior compute independent of the exchange — is
        # machine-checkable in the compiled module (tools/halo_schedule.py,
        # tests/test_halo.py::test_halo_interior_overlap_independence)
        if use_pallas:
            from multilevel_gnn_tpu.ops import spmm as _spmm

            si_f, si_b, sb_f, sb_b, s_send = (
                _local_segments(s) for s in segs[:5]
            )
            # interior partial first (overlaps with the all_to_all below);
            # dropped (non-interior / padding) edges are absent from the
            # seg's flat layout, so no runtime masking is needed
            with jax.named_scope("halo_interior"):
                if use_windowed:
                    # the single-chip winner per shard: window ranges are
                    # ownership-local by construction (VERDICT r2 #9)
                    from multilevel_gnn_tpu.ops.pallas.windowed import (
                        windowed_spmm_2d,
                    )

                    wp = _local_plan(segs[5])
                    x2, bc = _spmm._to_2d(xl)
                    if _spmm._DTYPE is not None:
                        x2 = x2.astype(_spmm._DTYPE)
                    part2 = windowed_spmm_2d(
                        x2, w.astype(jnp.float32), s_ext, r_loc, wp
                    )
                    # windowed output is f32 — matches the flat kernel's
                    # accumulator dtype, so the boundary add just works
                    part = _spmm._from_2d(part2, bc)
                else:
                    part = _spmm._fused_spmm_sum(
                        xl, w, s_ext, r_loc, si_f, si_b
                    )
            with jax.named_scope("halo_exchange"):
                send = _spmm.gather_rows(xl, send_flat, s_send)
        else:
            def agg(sender_table, sel_mask):
                msg = jnp.take(sender_table, s_ext, axis=-2) * w
                return seg_ops.segment_sum(msg, r_loc, Nl, mask=sel_mask)

            with jax.named_scope("halo_interior"):
                part = agg(
                    jnp.concatenate(
                        [xl,
                         jnp.zeros(xl.shape[:-2] + (k * H, xl.shape[-1]),
                                   xl.dtype)],
                        axis=-2,
                    ),
                    emask & interior,
                )
            with jax.named_scope("halo_exchange"):
                send = jnp.take(xl, send_flat, axis=-2)  # (.., k*H, C)

        with jax.named_scope("halo_exchange"):
            # halo exchange: send my rows requested by each peer
            send = jnp.moveaxis(
                send.reshape(send.shape[:-2] + (k, H, send.shape[-1])), -3, 0
            )  # (k, .., H, C)
            recv = jax.lax.all_to_all(send, axis, 0, 0, tiled=False)
            recv = jnp.moveaxis(recv, 0, -3)  # (.., k, H, C)
            halo_rows = recv.reshape(
                recv.shape[:-3] + (k * H, recv.shape[-1])
            )
        with jax.named_scope("halo_boundary"):
            if use_pallas:
                part = part + _spmm._fused_spmm_sum(
                    halo_rows, w, jnp.maximum(s_ext - Nl, 0), r_loc, sb_f, sb_b
                )
            else:
                x_ext = jnp.concatenate([xl, halo_rows], axis=-2)
                part = part + agg(x_ext, emask & ~interior)

        if reduce == "mean":
            part = part / jnp.clip(deg, 1.0, None)[:, None]
        elif reduce not in ("sum", "add"):
            raise NotImplementedError(reduce)
        return part

    node_spec = P(*([None] * (x.ndim - 2)), axis, None)
    in_specs = (
        node_spec, P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
        P(axis),
    ) + tuple(jax.tree.map(lambda _: P(axis), s) for s in seg_args)
    fn = jax.shard_map(
        local, mesh=mesh, in_specs=in_specs, out_specs=node_spec,
        # pallas_call emits ShapeDtypeStructs without vma annotations;
        # the varying-mesh-axes checker rejects them inside shard_map
        check_vma=False,
    )
    return fn(
        x, hp.senders_ext, hp.receivers_loc, hp.edge_mask, hp.interior,
        hp.send_idx, hp.deg, w_full, *seg_args
    )


def pad_nodes_for(x: jax.Array, hp: HaloPartition) -> jax.Array:
    """Zero-pad the node axis of (.., N, C) to k * n_local."""
    pad = hp.k * hp.n_local - x.shape[-2]
    if pad == 0:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[-2] = (0, pad)
    return jnp.pad(x, cfg)
