"""Fold-vectorized CV: every (run, fold) unit advances in lockstep.

The reference protocol is num_run x 5-fold CV run strictly sequentially
(reference train.py:258-280) — 150 independent trainings for a published
30-run experiment.  Those units are embarrassingly parallel, and the
compile-once-CV shape bucketing (STATUS r2s4c: SortedSegments flat_bucket,
windowed-plan chunk buckets, padded Graph.n_edges) makes every fold's
FoldContext/Graph pytree STRUCTURALLY IDENTICAL — so the whole experiment
can be stacked on a new leading 'unit' axis and driven by ONE vmapped train
step:

  * a pod slice: shard the unit axis over the mesh — near-linear scaling
    with ZERO collectives (units never communicate), the ideal TPU regime.
    This is the arm's regime: `devices=N` spreads units across chips, and
    the WHOLE experiment additionally advances as ONE dispatch + ONE host
    fetch (train/step.py:train_fold_raw vmapped over units, shard_mapped
    over the mesh) — no per-step or per-epoch host round trips at all.
  * ONE chip: the one-dispatch loop engages here too (devices=None, plain
    vmap).  tools/bench_fold_decomp.py (v5e, 2026-08-20) measured it at
    ~13 ms per unit-epoch, flat across U=5/10/25 — ~10x faster than the
    per-step lockstep loop (host-bound on batch/eval stacking) and within
    ~1.3x of the sequential driver's per-fold scan (0.010 s/epoch), so
    sequential remains `recommended_arm` on one device mainly for its
    incremental per-fold results and checkpointability.  (The r3 claim
    that the vmapped executable ran 2.4x SLOWER than the lockstep loop
    single-chip did not reproduce under chained-params honest timing;
    the 200-560 s first-call program loads were tunnel weather, not a
    property of the executable.)

Semantics match the sequential driver exactly: per-unit host RNG streams
(np.random.RandomState(seed + 1000*run + fold)), per-unit jax RNG
(PRNGKey(seed*10000 + run*100 + fold) folded per step), per-unit PCA
seeding, per-unit best-by-valid-AUC/loss checkpoint selection, pooled
check-epoch scoring — validated in tests/test_fold_parallel.py against
run_experiment's pooled metrics.

Lockstep requires every unit to take the same number of train steps per
epoch; ragged eval batch counts are padded with all-masked batches (their
predictions are dropped by sample_mask and their losses by a host-side
validity mask).  Units whose train split would yield fewer steps trim to
the minimum (a warning is logged; with the shipped 5-fold protocol the
stratified splits differ by at most one patient).
"""
from __future__ import annotations

import dataclasses
import logging
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from multilevel_gnn_tpu.core.config import Config
from multilevel_gnn_tpu.data.cohort import Cohort
from multilevel_gnn_tpu.train import metrics as M
from multilevel_gnn_tpu.train.driver import (
    _shared_fns,
    epoch_bucket,
    epoch_plan,
    fold_setup,
    iter_batches,
    stratified_kfold,
)

log = logging.getLogger("mgtpu.fold_parallel")


def _stack(trees):
    """Stack a list of structurally-identical pytrees on a new axis 0."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


@dataclasses.dataclass
class _Unit:
    run_i: int
    fold_i: int
    train_idx: np.ndarray
    valid_idx: np.ndarray
    test_idx: np.ndarray


def _pad_batch(like):
    """An all-masked clone of ``like`` (single-unit Batch): contributes no
    predictions (sample_mask False) — used to pad ragged eval batch counts."""
    return dataclasses.replace(
        like, sample_mask=jnp.zeros_like(like.sample_mask)
    )


def recommended_arm(n_devices: int) -> str:
    """'sequential' | 'fold_parallel' by the measured regime (module
    docstring): fold-parallel's regime is unit-sharding over >1 device.
    On a single chip the two are within ~1.3x per unit-epoch (decomp
    2026-08-20); sequential stays the default for incremental per-fold
    results + mid-experiment checkpointability."""
    return "fold_parallel" if n_devices > 1 else "sequential"


def run_experiment_foldparallel(
    cfg: Config,
    cohort: Cohort,
    devices: Optional[int] = None,
    ckpt_dir: Optional[str] = None,
    resume: bool = False,
) -> Dict:
    """Fold-vectorized equivalent of driver.run_experiment.

    devices: shard the unit axis over this many devices (must divide
    num_run*5); None = single-device vmap.

    ckpt_dir + cfg.ckpt_every>0: per-unit checkpoints in the SAME on-disk
    layout as the sequential driver (run{r}_fold{f}/step_E + host state),
    so mgtpu-predict reads them unchanged.  resume=True restarts at the
    latest epoch every unit has a checkpoint for (lockstep: the minimum
    across units) with exact per-unit host RNG state."""
    t0 = time.time()  # same span as run_experiment: includes fold prep/init
    labels = cohort.labels()
    check_epochs = list(range(5, cfg.epochs + 1, 5)) or [cfg.epochs]
    outer = stratified_kfold(labels, 5, cfg.split_shaffle, cfg.split_seed)

    units: List[_Unit] = []
    for run_i in range(cfg.num_run):
        for fold_i, (tune, test_idx) in enumerate(outer):
            inner = stratified_kfold(
                labels[tune], 5, cfg.split_shaffle, cfg.split_seed
            )
            tr, va = inner[0]
            units.append(
                _Unit(run_i, fold_i, tune[tr], tune[va], test_idx)
            )
    F = len(units)

    # ---- per-fold data (runs share splits, so only 5 distinct folds) ----
    fold_cache = {}
    mcfg = None
    for u in units:
        if u.fold_i not in fold_cache:
            c2, fold, X, raw = fold_setup(cfg, cohort, u.train_idx, u.fold_i)
            fold_cache[u.fold_i] = (fold, X, raw)
            mcfg = c2
    cfg = mcfg

    Y, ages = cohort.Y, cohort.ages
    shuffle = not cfg.class_sample
    drop_last = not (
        cfg.class_sample or cfg.weighted_loss or cfg.batch_weighted_loss
    )
    # the LR schedule is keyed on floor(n/bs) like the sequential driver
    # (run_fold:steps_per_epoch); the number of TRAIN batches consumed per
    # epoch follows iter_batches' drop_last semantics (ceil when False)
    steps_per_epoch = max(
        min(len(u.train_idx) // cfg.batch_size for u in units), 1
    )
    n_batches = [
        len(u.train_idx) // cfg.batch_size
        if drop_last
        else -(-len(u.train_idx) // cfg.batch_size)
        for u in units
    ]
    train_batches = min(n_batches)
    if len(set(n_batches)) > 1:
        log.warning(
            "fold-parallel lockstep: ragged train batches/epoch %s -> %d",
            sorted(set(n_batches)), train_batches,
        )
    model, fns = _shared_fns(cfg, cohort, steps_per_epoch)

    # ---- stacked state: params / opt / ctx / class weights / rng ----
    params_l, opt_l, ctx_l, cw_l, rng_l = [], [], [], [], []
    for u in units:
        fold, X, raw = fold_cache[u.fold_i]
        init_batch = next(
            iter_batches(
                X, Y, ages, u.train_idx, cfg.batch_size,
                np.random.RandomState(0), False, False, raw=raw,
            )
        )
        rng_key = jax.random.PRNGKey(
            cfg.seed * 10_000 + u.run_i * 100 + u.fold_i
        )
        p, o = fns.init_state(rng_key, init_batch, fold.ctx, steps_per_epoch)
        if cfg.init_with_pca and fold.pca_seed is not None:
            from multilevel_gnn_tpu.models.multilevel_gnn import seed_pca_params

            p = seed_pca_params(p, jnp.asarray(fold.pca_seed))
        params_l.append(p)
        opt_l.append(o)
        ctx_l.append(fold.ctx)
        cw_l.append(jnp.asarray(fold.class_weight, jnp.float32))
        rng_l.append(rng_key)
    # ---- host-side per-unit loop state (mirrors run_fold's `results`) ----
    results = [
        {
            "highest_valid": -1.0,
            "highest_valid_loss": 100.0,
            "result_y": None,
            "result_y_by_loss": None,
            "epoch": {},
            "epoch_by_loss": {},
            "epoch_by_epoch": {},
        }
        for _ in units
    ]
    y_true_test: List = [None] * F
    np_rngs = [
        np.random.RandomState(cfg.seed + 1000 * u.run_i + u.fold_i)
        for u in units
    ]
    start_epoch = 1
    step_i = 0
    if ckpt_dir is not None and resume:
        import os

        from multilevel_gnn_tpu.train import checkpoint as C

        tags = [
            os.path.join(ckpt_dir, f"run{u.run_i}_fold{u.fold_i}")
            for u in units
        ]
        lasts = [C.latest_resumable_step(t) for t in tags]
        if all(last is not None for last in lasts):
            epoch0 = min(lasts)  # lockstep: min common checkpointed epoch
            for i, tag in enumerate(tags):
                tree, _ = C.load_checkpoint(
                    tag, {"params": params_l[i], "opt_state": opt_l[i]},
                    epoch0,
                )
                params_l[i], opt_l[i] = tree["params"], tree["opt_state"]
                host = C.load_host_state(tag, epoch0)
                results[i] = host["results"]
                y_true_test[i] = host["y_true_test"]
                step_i = host["step_i"]
                np_rngs[i].set_state(host["np_rng_state"])
            start_epoch = epoch0 + 1
            log.info("fold-parallel resumed %d units at epoch %d", F, epoch0)
        else:
            missing = sum(1 for last in lasts if last is None)
            log.warning(
                "--resume requested but %d/%d units have no complete "
                "checkpoint (lockstep resume needs all of them); "
                "restarting the experiment from epoch 1", missing, F,
            )

    params, opt_state = _stack(params_l), _stack(opt_l)
    ctx = _stack(ctx_l)
    class_weight = _stack(cw_l)
    rng_keys = jnp.stack(rng_l)

    _step = jax.vmap(fns.train_step)
    _eval = jax.vmap(fns.eval_step)
    if devices is not None:
        # shard the unit axis over a 1-D mesh with shard_map: each device
        # vmaps its LOCAL units only.  (Plain GSPMD can't split the grouped
        # convolution that vmap makes of the Conv head — the group count
        # equals the global unit count.)  Units never communicate: zero
        # collectives, the embarrassingly-parallel ideal.
        assert F % devices == 0, (F, devices)
        from jax import shard_map
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        mesh = Mesh(np.array(jax.devices()[:devices]), ("unit",))
        sh = NamedSharding(mesh, P("unit"))
        put = lambda t: jax.tree_util.tree_map(  # noqa: E731
            lambda x: jax.device_put(x, sh), t
        )
        params, opt_state = put(params), put(opt_state)
        ctx, class_weight, rng_keys = put(ctx), put(class_weight), put(rng_keys)
        spec = P("unit")
        _step = shard_map(
            _step, mesh=mesh, in_specs=(spec,) * 6, out_specs=spec,
            check_vma=False,
        )
        _eval = shard_map(
            _eval, mesh=mesh, in_specs=(spec,) * 3, out_specs=spec,
            check_vma=False,
        )

    # donate the chained (params, opt_state) like the sequential step
    # (train/step.py) — the loop only reads vstep's OUTPUT tree (checkpoint
    # epochs np.asarray the post-step state), never a donated input
    vstep = jax.jit(_step, donate_argnums=(0, 1))
    veval = jax.jit(_eval)

    sampler_weights = []
    for u in units:
        fold, _, _ = fold_cache[u.fold_i]
        sampler_weights.append(
            fold.class_weight[labels[np.asarray(u.train_idx)]]
            if cfg.class_sample else None
        )
    variation = (
        {"prob": cfg.random_variation_prob, "range": cfg.random_range}
        if cfg.random_variation_aug
        else None
    )
    epoch_times: List[float] = []

    # ---- whole-fold device loop over ALL units (train/step.py:
    # train_fold_raw vmapped over the unit axis, shard_mapped over the
    # mesh): the ENTIRE experiment advances as ONE dispatch + ONE host
    # fetch — each chip fori-loops its local units' folds with no per-step
    # or per-epoch host round trips.  Engaged for BOTH devices=None (plain
    # vmap) and devices=N (unit sharding): the r3 decision to keep the
    # per-step loop single-chip rested on a 1.55 s/epoch measurement that
    # did NOT reproduce — tools/bench_fold_decomp.py (v5e, 2026-08-20,
    # chained-params honest timing) measured the one-dispatch executable
    # at 0.063/0.126/0.328 s per all-units epoch for U=5/10/25 vs
    # 0.60/1.03/2.41 for the per-step lockstep loop (~10x: the per-step
    # loop is host-bound on per-step batch stacking + per-batch eval
    # stacking), with per-unit cost flat (~13 ms/unit-epoch) and the
    # fori_loop's overhead NEGATIVE (-0.05 s/epoch: two host round trips
    # saved vs separate train/eval dispatches).  Requires the sequential
    # fold scan's conditions (fresh run, no checkpointing, no variation
    # aug) plus a shared device-resident data dict (raw is fold-dependent
    # for DeeperGCN/PathCNN-precomputed — those fall back to the per-step
    # loop).
    use_fold_scan = (
        bool(cfg.epoch_scan)
        and bool(cfg.fold_scan)
        and fns.train_fold_raw is not None
        and ckpt_dir is None
        and variation is None
        and start_epoch == 1
        and cfg.epochs >= 1
        and train_batches >= 1
        and all(fold_cache[u.fold_i][2] is None for u in units)
    )
    if use_fold_scan:
        t_scan0 = time.time()
        X0 = fold_cache[units[0].fold_i][1]
        data = {
            "X": jnp.asarray(X0),
            "Y": jnp.asarray(Y),
            "ages": jnp.asarray(ages),
        }
        EPb = epoch_bucket(cfg.epochs)
        S = train_batches
        take_l, mask_l = [], []
        for i, u in enumerate(units):
            _, X_u, _ = fold_cache[u.fold_i]
            tks, mks = [], []
            for _ in range(cfg.epochs):
                # trimming to the lockstep step count consumes the same
                # np RNG as the per-step path (selection draw only;
                # variation is None here)
                plan = list(
                    epoch_plan(
                        X_u, u.train_idx, cfg.batch_size, np_rngs[i],
                        shuffle, drop_last, sampler_weights[i], None,
                    )
                )[:S]
                tks.append(np.stack([p[0] for p in plan]).astype(np.int32))
                mks.append(np.stack([p[1] for p in plan]))
            for _ in range(EPb - cfg.epochs):  # inert epoch-bucket padding
                tks.append(np.zeros_like(tks[0]))
                mks.append(np.zeros_like(mks[0]))
            take_l.append(np.stack(tks))
            mask_l.append(np.stack(mks))
        take = np.stack(take_l)  # (U, EPb, S, B)
        maskp = np.stack(mask_l)
        # global step counter shared by all lockstep units — matches the
        # per-step loop's fold_in(rng_keys, step_i) stream exactly
        sidx = np.arange(EPb * S, dtype=np.int32).reshape(EPb, S)

        def _eval_plan_u(i, u):
            _, X_u, _ = fold_cache[u.fold_i]
            rows = []
            counts = []
            for idx in (u.valid_idx, u.test_idx):
                plan = list(
                    epoch_plan(
                        X_u, idx, cfg.batch_size, np.random.RandomState(0),
                        False, False,
                    )
                )
                rows.extend(plan)
                counts.append(len(plan))
            t = np.stack([p[0] for p in rows]).astype(np.int32)
            m = np.stack([p[1] for p in rows])
            return t, m, counts

        ev = [_eval_plan_u(i, u) for i, u in enumerate(units)]
        Se = max(t.shape[0] for t, _, _ in ev)
        ev_take_l, ev_mask_l, ev_counts = [], [], []
        for t, m, counts in ev:
            pad = Se - t.shape[0]
            if pad:  # repeat a REAL batch row (finite loss); rows beyond
                # the unit's (n_v + n_t) are dropped host-side below
                t = np.concatenate([t, np.repeat(t[:1], pad, axis=0)])
                m = np.concatenate([m, np.repeat(m[:1], pad, axis=0)])
            ev_take_l.append(t)
            ev_mask_l.append(m)
            ev_counts.append(counts)
        ev_take = np.stack(ev_take_l)  # (U, Se, B)
        ev_mask = np.stack(ev_mask_l)
        ev_mask_h = ev_mask.copy()

        vfold = jax.vmap(
            fns.train_fold_raw,
            in_axes=(0, 0, None, 0, 0, None, None, 0, 0, 0, 0, 0),
        )
        take, maskp, sidx = jnp.asarray(take), jnp.asarray(maskp), jnp.asarray(sidx)
        ev_take, ev_mask = jnp.asarray(ev_take), jnp.asarray(ev_mask)
        n_ep = jnp.asarray(cfg.epochs, jnp.int32)
        if devices is not None:
            from jax import shard_map
            from jax.sharding import (
                Mesh, NamedSharding, PartitionSpec as P,
            )

            mesh = Mesh(np.array(jax.devices()[:devices]), ("unit",))
            u_spec, r_spec = P("unit"), P()
            vfold = shard_map(
                vfold, mesh=mesh,
                in_specs=(u_spec, u_spec, r_spec, u_spec, u_spec, r_spec,
                          r_spec, u_spec, u_spec, u_spec, u_spec, u_spec),
                out_specs=u_spec, check_vma=False,
            )
            sh_u = NamedSharding(mesh, u_spec)
            sh_r = NamedSharding(mesh, r_spec)
            put_u = lambda t: jax.tree_util.tree_map(  # noqa: E731
                lambda x: jax.device_put(x, sh_u), t
            )
            params, opt_state, ctx = put_u(params), put_u(opt_state), put_u(ctx)
            class_weight, rng_keys = put_u(class_weight), put_u(rng_keys)
            take, maskp, ev_take, ev_mask = map(
                put_u, (take, maskp, ev_take, ev_mask)
            )
            data = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, sh_r), data
            )
            sidx = jax.device_put(sidx, sh_r)
        jfold = jax.jit(vfold, donate_argnums=(0, 1))
        params, opt_state, preds, losses = jfold(
            params, opt_state, data, take, maskp, sidx, n_ep,
            ev_take, ev_mask, ctx, class_weight, rng_keys,
        )
        preds_h = np.asarray(preds)  # (U, EPb, Se, B, 2)
        losses_h = np.asarray(losses)  # (U, EPb, Se)
        step_i += cfg.epochs * S
        per_epoch = (time.time() - t_scan0) / max(cfg.epochs, 1)
        for epoch in range(1, cfg.epochs + 1):
            ep = epoch - 1
            for i, u in enumerate(units):
                n_v, n_t = ev_counts[i]
                out = []
                for idx, s, e in (
                    (u.valid_idx, 0, n_v), (u.test_idx, n_v, n_v + n_t),
                ):
                    p = preds_h[i, ep, s:e][ev_mask_h[i, s:e]]
                    auc, acc, y_t, score0 = M.eval_scores(Y[idx], p)
                    out.append(
                        (auc, acc, y_t, score0,
                         float(losses_h[i, ep, s:e].mean()))
                    )
                v_auc, v_acc, _, _, v_loss = out[0]
                _, _, y_t, t_score, _ = out[1]
                y_true_test[i] = y_t
                r = results[i]
                v_eval = v_auc if cfg.metrics == "auc" else v_acc
                if v_loss < r["highest_valid_loss"]:
                    r["highest_valid_loss"] = v_loss
                    r["result_y_by_loss"] = t_score
                if v_eval > r["highest_valid"]:
                    r["highest_valid"] = v_eval
                    r["result_y"] = t_score
                if epoch in check_epochs:
                    r["epoch"][epoch] = (
                        r["result_y"] if r["result_y"] is not None
                        else t_score
                    )
                    r["epoch_by_loss"][epoch] = (
                        r["result_y_by_loss"]
                        if r["result_y_by_loss"] is not None
                        else t_score
                    )
                    r["epoch_by_epoch"][epoch] = t_score
            epoch_times.append(per_epoch)
        log.info(
            "fold-parallel fold-scan: %d units x %d epochs in ONE dispatch "
            "(%.2fs, %.3fs/epoch amortized)",
            F, cfg.epochs, time.time() - t_scan0, per_epoch,
        )
        start_epoch = cfg.epochs + 1  # the per-step loop below is skipped

    def eval_split(params, idx_name):
        """Vectorized evaluate() over all units for a given split."""
        per_unit_batches = []
        for i, u in enumerate(units):
            fold, X, raw = fold_cache[u.fold_i]
            idx = getattr(u, idx_name)
            per_unit_batches.append(
                list(
                    iter_batches(
                        X, Y, ages, idx, cfg.batch_size,
                        np.random.RandomState(0), False, False, raw=raw,
                    )
                )
            )
        n_b = max(len(b) for b in per_unit_batches)
        preds = [[] for _ in units]
        losses = [[] for _ in units]
        for bi in range(n_b):
            stackable, valid = [], []
            for i in range(F):
                bs = per_unit_batches[i]
                if bi < len(bs):
                    stackable.append(bs[bi])
                    valid.append(True)
                else:
                    stackable.append(_pad_batch(bs[0]))
                    valid.append(False)
            batch = _stack(stackable)
            pred, loss = veval(params, batch, ctx)
            pred = np.asarray(pred)
            loss = np.asarray(loss)
            for i in range(F):
                if valid[i]:
                    m = np.asarray(stackable[i].sample_mask)
                    preds[i].append(pred[i][m])
                    losses[i].append(float(loss[i]))
        out = []
        for i, u in enumerate(units):
            idx = getattr(u, idx_name)
            p = np.concatenate(preds[i])
            auc, acc, y_true, score0 = M.eval_scores(Y[idx], p)
            out.append((auc, acc, y_true, score0, float(np.mean(losses[i]))))
        return out

    for epoch in range(start_epoch, cfg.epochs + 1):
        epoch_t0 = time.time()
        iters = [
            iter_batches(
                X_u, Y, ages, u.train_idx, cfg.batch_size, np_rngs[i],
                shuffle, drop_last, sampler_weights[i], variation, raw=raw_u,
            )
            for i, u in enumerate(units)
            for (_, X_u, raw_u) in (fold_cache[u.fold_i],)
        ]
        for _ in range(train_batches):
            batch = _stack([next(it) for it in iters])
            rngs = jax.vmap(lambda k: jax.random.fold_in(k, step_i))(rng_keys)
            params, opt_state, _ = vstep(
                params, opt_state, batch, ctx, class_weight, rngs
            )
            step_i += 1

        val = eval_split(params, "valid_idx")
        tst = eval_split(params, "test_idx")
        for i in range(F):
            v_auc, v_acc, _, _, v_loss = val[i]
            t_auc, t_acc, y_t, t_score, _ = tst[i]
            y_true_test[i] = y_t
            r = results[i]
            v_eval = v_auc if cfg.metrics == "auc" else v_acc
            if v_loss < r["highest_valid_loss"]:
                r["highest_valid_loss"] = v_loss
                r["result_y_by_loss"] = t_score
            if v_eval > r["highest_valid"]:
                r["highest_valid"] = v_eval
                r["result_y"] = t_score
            if epoch in check_epochs:
                r["epoch"][epoch] = (
                    r["result_y"] if r["result_y"] is not None else t_score
                )
                r["epoch_by_loss"][epoch] = (
                    r["result_y_by_loss"]
                    if r["result_y_by_loss"] is not None
                    else t_score
                )
                r["epoch_by_epoch"][epoch] = t_score
        epoch_times.append(time.time() - epoch_t0)
        log.info(
            "fold-parallel epoch %d (%d units): %.2fs", epoch, F,
            epoch_times[-1],
        )
        if ckpt_dir is not None and cfg.ckpt_every > 0 and (
            epoch % cfg.ckpt_every == 0
        ):
            import os

            from multilevel_gnn_tpu.train import checkpoint as C

            # unstack to host once, save per unit in the sequential
            # driver's layout (readable by train/predict.py)
            params_h = jax.tree_util.tree_map(np.asarray, params)
            opt_h = jax.tree_util.tree_map(np.asarray, opt_state)
            for i, u in enumerate(units):
                take = lambda t: jax.tree_util.tree_map(  # noqa: E731
                    lambda x: x[i], t
                )
                tag = os.path.join(ckpt_dir, f"run{u.run_i}_fold{u.fold_i}")
                C.save_checkpoint(
                    tag, take(params_h), take(opt_h),
                    loop_state={"run": u.run_i, "fold": u.fold_i,
                                "epoch": epoch},
                    step=epoch,
                )
                C.save_host_state(
                    tag, epoch,
                    {
                        "results": results[i],
                        "y_true_test": y_true_test[i],
                        "step_i": step_i,
                        "np_rng_state": np_rngs[i].get_state(),
                    },
                )
                C.prune_old_steps(tag, cfg.ckpt_keep)

    # ---- pooled check-epoch aggregation (mirrors run_experiment) ----
    agg = {
        k: {e: [] for e in check_epochs}
        for k in ("auc", "auc_by_loss", "auc_by_epoch", "acc", "acc_by_loss",
                  "acc_by_epoch")
    }
    for run_i in range(cfg.num_run):
        sel = [i for i, u in enumerate(units) if u.run_i == run_i]
        y = np.concatenate([y_true_test[i] for i in sel])
        for e in check_epochs:
            for key, attr in (
                ("auc", "epoch"),
                ("auc_by_loss", "epoch_by_loss"),
                ("auc_by_epoch", "epoch_by_epoch"),
            ):
                pred = np.concatenate([results[i][attr][e] for i in sel])
                agg[key][e].append(M.roc_auc(y, pred))
                agg[key.replace("auc", "acc")][e].append(
                    M.accuracy(y, pred > 0.5)
                )

    out = {
        "check_epochs": check_epochs,
        "wall_time_s": time.time() - t0,
        "epoch_s_median": float(np.median(epoch_times)) if epoch_times else None,
        "units": F,
        # which loop actually ran (dryrun/bench provenance, VERDICT r3 #7):
        # 'one-dispatch' = the whole experiment as one vmapped/shard_mapped
        # train_fold_raw dispatch; 'per-step' = the lockstep step loop
        "arm": "one-dispatch" if use_fold_scan else "per-step",
    }
    for k, d in agg.items():
        out[k] = {e: float(np.mean(v)) for e, v in d.items()}
        out[k + "_std"] = {e: float(np.std(v)) for e, v in d.items()}
        out[k + "_all"] = {e: list(map(float, v)) for e, v in d.items()}
    return out
