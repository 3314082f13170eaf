"""Decompose the one-dispatch whole-experiment loop's per-epoch cost
(VERDICT r3 Next #3).

r3 measured the vmapped ``train_fold_raw`` executable at 1.55 s per
all-units epoch vs 0.65 s for the per-step lockstep loop on one chip, and
the pod arithmetic in docs/SCALING.md was computed from the lockstep-era
number.  This tool attributes the gap.  For each unit count U (num_run x 5
folds) it measures, on the real device:

  per_step_epoch_s    epoch time of the per-step lockstep loop, through
                      run_experiment_foldparallel(devices=None)
  one_dispatch_*      the vmapped+jitted train_fold_raw executable:
                      first-call (program load) and steady-state s/epoch
                      (second call, chained params)
  vtrain_epoch_s      vmapped train-scan ONLY (fns.train_epoch_raw): the
                      irreducible train share of one all-units epoch
  veval_epoch_s       vmapped eval-scan ONLY (fns.eval_scan_raw) over the
                      same valid+test plan: the eval share (runs every
                      epoch inside train_fold_raw for best-by-valid
                      tracking — reference train.py evals every epoch)
  overhead_epoch_s    one_dispatch_steady - vtrain - veval: fori_loop +
                      dynamic_index plan slicing + preds-buffer updates

Timing honesty per CLAUDE.md: params chain across calls (x := f(x)), the
eval share is measured interleaved with train epochs so no two calls see
identical values, and every timed window ends in a host value fetch.

Run:  timeout 3600 python tools/bench_fold_decomp.py [--units 5 10 25]
      [--epochs 10] (writes one JSON line per U, then a summary line)
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_stacked(cfg, cohort, seed):
    """Stacked unit state + fold-scan plans, mirroring
    train/fold_parallel.py's one-dispatch setup (same helpers, same RNG
    streams) for num_run x 5 units."""
    import jax
    import jax.numpy as jnp

    from multilevel_gnn_tpu.train.driver import (
        _shared_fns, epoch_bucket, epoch_plan, fold_setup, iter_batches,
        stratified_kfold,
    )

    labels = cohort.labels()
    outer = stratified_kfold(labels, 5, cfg.split_shaffle, cfg.split_seed)
    units = []
    for run_i in range(cfg.num_run):
        for fold_i, (tune, test_idx) in enumerate(outer):
            inner = stratified_kfold(
                labels[tune], 5, cfg.split_shaffle, cfg.split_seed
            )
            tr, va = inner[0]
            units.append((run_i, fold_i, tune[tr], tune[va], test_idx))

    fold_cache = {}
    mcfg = None
    for _, fold_i, tr_idx, _, _ in units:
        if fold_i not in fold_cache:
            c2, fold, X, raw = fold_setup(cfg, cohort, tr_idx, fold_i)
            assert raw is None, "decomp tool covers the fold-scan families"
            fold_cache[fold_i] = (fold, X)
            mcfg = c2
    cfg = mcfg
    Y, ages = cohort.Y, cohort.ages
    steps_per_epoch = max(
        min(len(u[2]) // cfg.batch_size for u in units), 1
    )
    model, fns = _shared_fns(cfg, cohort, steps_per_epoch)

    params_l, opt_l, ctx_l, cw_l, rng_l = [], [], [], [], []
    for run_i, fold_i, tr_idx, _, _ in units:
        fold, X = fold_cache[fold_i]
        init_batch = next(iter_batches(
            X, Y, ages, tr_idx, cfg.batch_size, np.random.RandomState(0),
            False, False,
        ))
        rng_key = jax.random.PRNGKey(cfg.seed * 10_000 + run_i * 100 + fold_i)
        p, o = fns.init_state(rng_key, init_batch, fold.ctx, steps_per_epoch)
        if cfg.init_with_pca and fold.pca_seed is not None:
            from multilevel_gnn_tpu.models.multilevel_gnn import (
                seed_pca_params,
            )

            p = seed_pca_params(p, jnp.asarray(fold.pca_seed))
        params_l.append(p)
        opt_l.append(o)
        ctx_l.append(fold.ctx)
        cw_l.append(jnp.asarray(fold.class_weight, jnp.float32))
        rng_l.append(rng_key)
    stack = lambda ts: jax.tree_util.tree_map(  # noqa: E731
        lambda *xs: jnp.stack(xs), *ts
    )
    state = dict(
        params=stack(params_l), opt=stack(opt_l), ctx=stack(ctx_l),
        cw=stack(cw_l), rng=jnp.stack(rng_l),
    )

    # ---- plans: train (U, EPb, S, B) + eval (U, Se, B), as fold_parallel
    shuffle = not cfg.class_sample
    drop_last = not (
        cfg.class_sample or cfg.weighted_loss or cfg.batch_weighted_loss
    )
    S = min(
        (len(u[2]) // cfg.batch_size) if drop_last
        else -(-len(u[2]) // cfg.batch_size)
        for u in units
    )
    EPb = epoch_bucket(cfg.epochs)
    np_rngs = [
        np.random.RandomState(cfg.seed + 1000 * r + f)
        for r, f, *_ in units
    ]
    take_l, mask_l = [], []
    for i, (_, fold_i, tr_idx, _, _) in enumerate(units):
        _, X_u = fold_cache[fold_i]
        tks, mks = [], []
        for _ in range(cfg.epochs):
            plan = list(epoch_plan(
                X_u, tr_idx, cfg.batch_size, np_rngs[i], shuffle,
                drop_last, None, None,
            ))[:S]
            tks.append(np.stack([p[0] for p in plan]).astype(np.int32))
            mks.append(np.stack([p[1] for p in plan]))
        for _ in range(EPb - cfg.epochs):
            tks.append(np.zeros_like(tks[0]))
            mks.append(np.zeros_like(mks[0]))
        take_l.append(np.stack(tks))
        mask_l.append(np.stack(mks))
    take, maskp = np.stack(take_l), np.stack(mask_l)
    sidx = np.arange(EPb * S, dtype=np.int32).reshape(EPb, S)

    ev_rows = []
    for i, (_, fold_i, _, va_idx, te_idx) in enumerate(units):
        _, X_u = fold_cache[fold_i]
        rows = []
        for idx in (va_idx, te_idx):
            rows.extend(epoch_plan(
                X_u, idx, cfg.batch_size, np.random.RandomState(0),
                False, False,
            ))
        ev_rows.append(rows)
    Se = max(len(r) for r in ev_rows)
    ev_take_l, ev_mask_l = [], []
    for rows in ev_rows:
        t = np.stack([p[0] for p in rows]).astype(np.int32)
        m = np.stack([p[1] for p in rows])
        pad = Se - t.shape[0]
        if pad:
            t = np.concatenate([t, np.repeat(t[:1], pad, axis=0)])
            m = np.concatenate([m, np.repeat(m[:1], pad, axis=0)])
        ev_take_l.append(t)
        ev_mask_l.append(m)
    X0 = fold_cache[units[0][1]][1]
    data = {
        "X": jnp.asarray(X0), "Y": jnp.asarray(Y),
        "ages": jnp.asarray(ages),
    }
    plans = dict(
        take=jnp.asarray(take), mask=jnp.asarray(maskp),
        sidx=jnp.asarray(sidx),
        ev_take=jnp.asarray(np.stack(ev_take_l)),
        ev_mask=jnp.asarray(np.stack(ev_mask_l)),
        S=S, Se=Se, EPb=EPb,
    )
    return cfg, fns, state, plans, data, len(units)


def _fetch(tree):
    """End a timed window with a real host value fetch (tunnel block can
    return early)."""
    import jax

    leaf = jax.tree_util.tree_leaves(tree)[0]
    return float(np.asarray(leaf).ravel()[0])


def measure(cfg, fns, state, plans, data, U, epochs):
    import jax
    import jax.numpy as jnp

    out = {}
    n_ep = jnp.asarray(epochs, jnp.int32)

    # ---- one-dispatch: vmapped train_fold_raw ----
    vfold = jax.jit(
        jax.vmap(
            fns.train_fold_raw,
            in_axes=(0, 0, None, 0, 0, None, None, 0, 0, 0, 0, 0),
        ),
        donate_argnums=(0, 1),
    )
    p, o = state["params"], state["opt"]
    t0 = time.perf_counter()
    p, o, preds, losses = vfold(
        p, o, data, plans["take"], plans["mask"], plans["sidx"], n_ep,
        plans["ev_take"], plans["ev_mask"], state["ctx"], state["cw"],
        state["rng"],
    )
    _fetch(losses)
    out["one_dispatch_first_call_s"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    p, o, preds, losses = vfold(
        p, o, data, plans["take"], plans["mask"], plans["sidx"], n_ep,
        plans["ev_take"], plans["ev_mask"], state["ctx"], state["cw"],
        state["rng"],
    )
    _fetch(losses)
    steady = (time.perf_counter() - t0) / epochs
    out["one_dispatch_epoch_s"] = steady

    # ---- shares: vmapped train scan / eval scan, interleaved (chained
    # params; interleaving keeps every call's inputs distinct) ----
    vtrain = jax.jit(
        jax.vmap(
            fns.train_epoch_raw,
            in_axes=(0, 0, None, 0, 0, None, None, 0, 0, 0),
        ),
        donate_argnums=(0, 1),
    )
    veval = jax.jit(jax.vmap(
        fns.eval_scan_raw, in_axes=(0, None, 0, 0, 0),
    ))
    ep_take = plans["take"][:, 0]  # (U, S, B): epoch-0 plan per unit
    ep_mask = plans["mask"][:, 0]
    ep_sidx = plans["sidx"][0]
    # compile both before the timed interleave
    p, o, losses = vtrain(
        p, o, data, ep_take, ep_mask, None, ep_sidx, state["ctx"],
        state["cw"], state["rng"],
    )
    _fetch(losses)
    pr, ls = veval(p, data, plans["ev_take"], plans["ev_mask"], state["ctx"])
    _fetch(ls)
    t_train = t_eval = 0.0
    for e in range(1, epochs):
        ep_take = plans["take"][:, e % plans["take"].shape[1]]
        ep_mask = plans["mask"][:, e % plans["mask"].shape[1]]
        t0 = time.perf_counter()
        p, o, losses = vtrain(
            p, o, data, ep_take, ep_mask, None, ep_sidx, state["ctx"],
            state["cw"], state["rng"],
        )
        _fetch(losses)
        t_train += time.perf_counter() - t0
        t0 = time.perf_counter()
        pr, ls = veval(
            p, data, plans["ev_take"], plans["ev_mask"], state["ctx"]
        )
        _fetch(ls)
        t_eval += time.perf_counter() - t0
    iters = epochs - 1
    out["vtrain_epoch_s"] = t_train / iters
    out["veval_epoch_s"] = t_eval / iters
    out["overhead_epoch_s"] = (
        steady - out["vtrain_epoch_s"] - out["veval_epoch_s"]
    )
    out["units"] = U
    out["steps_per_epoch"] = plans["S"]
    out["eval_batches"] = plans["Se"]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--units", type=int, nargs="+", default=[5, 10, 25])
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--patients", type=int, default=200)
    ap.add_argument("--pathways", type=int, default=20)
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--skip-per-step", action="store_true")
    args = ap.parse_args()
    seed = args.seed if args.seed is not None else int(time.time()) % 1_000_000

    from multilevel_gnn_tpu.core.config import Config
    from multilevel_gnn_tpu.data.synthetic import make_synthetic_cohort
    from multilevel_gnn_tpu.utils.runtime import (
        configure_backend, enable_compilation_cache,
    )

    enable_compilation_cache()
    rows = []
    for U in args.units:
        assert U % 5 == 0, "units must be a multiple of 5 (num_run x 5)"
        cfg = Config.from_yaml(
            os.path.join(os.path.dirname(__file__), "..", "configs",
                         "gbm.yaml"),
            num_run=U // 5, epochs=args.epochs,
        )
        configure_backend(cfg)
        cohort = make_synthetic_cohort(
            cfg, seed=seed, n_patients=args.patients,
            n_pathways=args.pathways,
        )
        row = {"units": U}
        if not args.skip_per_step:
            from multilevel_gnn_tpu.train.fold_parallel import (
                run_experiment_foldparallel,
            )

            res = run_experiment_foldparallel(
                cfg.replace(fold_scan=False), cohort
            )
            assert res["arm"] == "per-step", res["arm"]
            row["per_step_epoch_s"] = res["epoch_s_median"]
            row["per_step_wall_s"] = res["wall_time_s"]
        mcfg, fns, state, plans, data, U2 = build_stacked(cfg, cohort, seed)
        assert U2 == U
        row.update(measure(mcfg, fns, state, plans, data, U, args.epochs))
        print(json.dumps(row))
        rows.append(row)
    print(json.dumps({"metric": "fold_scan_decomposition", "rows": rows,
                      "epochs": args.epochs, "seed": seed}))


if __name__ == "__main__":
    main()
