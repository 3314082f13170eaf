"""Measure the device-side epoch scan vs the per-step dispatch path on the
real TPU at GBM production scale (VERDICT r2 Next #1 / #8).

The r2 decomposition put ~4-6 ms/step of optimizer+dispatch residue on the
shipped 29.8 ms cohort train step (20%).  train/step.py:train_epoch folds a
whole epoch into one lax.scan (and both eval splits into one eval_scan);
this tool reports, on identical data and the shipped config stack:

  * per-step path: S train_step dispatches per epoch (host batch gather +
    transfer, like driver.iter_batches)
  * scan path: one train_epoch dispatch (device-resident X, on-device row
    gather)
  * eval: 2 splits x per-batch eval_step dispatches vs one eval_scan

Honesty: chained params (each step consumes the previous step's output),
clock-derived data seed per invocation, timed windows end in a scalar
fetch (CLAUDE.md bench-honesty notes).

Run on TPU:  timeout 1800 python tools/bench_epoch_scan.py
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="tiny shapes for a CPU smoke test")
    ap.add_argument("--reps", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from multilevel_gnn_tpu.data.synthetic import make_gbm_scale_setup
    from multilevel_gnn_tpu.models.multilevel_gnn import MultilevelGNN
    from multilevel_gnn_tpu.ops import spmm
    from multilevel_gnn_tpu.train.step import build_train_fns
    from multilevel_gnn_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    print(f"devices: {jax.devices()}", file=sys.stderr)
    seed = int(time.time()) % 1_000_000
    print(f"data seed: {seed}", file=sys.stderr)

    spmm.set_backend("pallas")
    spmm.set_spmm_dtype(jnp.bfloat16)
    try:
        kw = (
            dict(node_num=80, n_pathways=6, n_edges=600, batch=8,
                 gene_rows=300)
            if args.small
            else {}
        )
        cfg, model, graph, ctx, batch = make_gbm_scale_setup(
            topology="cohort" if not args.small else "random",
            windowed=not args.small, seed=seed, topo_seed=0, **kw,
        )
        cfg = cfg.replace(compute_dtype="bfloat16")  # shipped trunk
        model = MultilevelGNN(cfg)
        B = int(batch.x.shape[0])
        S = 8  # steps/epoch at the GBM protocol (256-patient train split)
        N_PAT = 256
        rngd = np.random.RandomState(seed)
        Xnp = rngd.randn(N_PAT, batch.x.shape[1]).astype(np.float32)
        Ynp = np.eye(2, dtype=np.float32)[rngd.randint(0, 2, N_PAT)]
        Anp = rngd.rand(N_PAT).astype(np.float32)

        fns = build_train_fns(model, cfg)
        params, opt_state = fns.init_state(
            jax.random.PRNGKey(0), batch, ctx, S
        )
        cw = jnp.ones(2, jnp.float32)
        rng0 = jax.random.PRNGKey(1)

        def plan(rs):
            sel = rs.permutation(N_PAT)[: S * B].reshape(S, B)
            return sel.astype(np.int32), np.ones((S, B), bool)

        # ---------- per-step path (host gather + per-step dispatch) -----
        rs = np.random.RandomState(seed + 1)
        step_i = 0

        def run_epoch_steps(params, opt_state, step_i):
            take, _ = plan(rs)
            loss = None
            for s in range(S):
                b = batch.__class__(
                    x=jnp.asarray(Xnp[take[s]]),
                    y=jnp.asarray(Ynp[take[s]]),
                    age=jnp.asarray(Anp[take[s]]),
                    sample_mask=jnp.ones(B, bool),
                    raw_data=None,
                )
                params, opt_state, loss = fns.train_step(
                    params, opt_state, b, ctx, cw,
                    jax.random.fold_in(rng0, step_i),
                )
                step_i += 1
            return params, opt_state, step_i, loss

        t0 = time.perf_counter()
        params, opt_state, step_i, loss = run_epoch_steps(
            params, opt_state, step_i
        )
        _ = float(loss)
        compile_step_s = time.perf_counter() - t0
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            params, opt_state, step_i, loss = run_epoch_steps(
                params, opt_state, step_i
            )
            _ = float(loss)
            times.append(time.perf_counter() - t0)
        per_step_epoch_s = float(np.median(times))

        # ---------- scan path (device-resident X, one dispatch) ---------
        data = {
            "X": jnp.asarray(Xnp),
            "Y": jnp.asarray(Ynp),
            "ages": jnp.asarray(Anp),
        }

        def run_epoch_scan(params, opt_state, step_i):
            take, mask = plan(rs)
            sidx = np.arange(step_i, step_i + S, dtype=np.int32)
            params, opt_state, losses = fns.train_epoch(
                params, opt_state, data, jnp.asarray(take),
                jnp.asarray(mask), None, jnp.asarray(sidx), ctx, cw, rng0,
            )
            return params, opt_state, step_i + S, losses

        t0 = time.perf_counter()
        params, opt_state, step_i, losses = run_epoch_scan(
            params, opt_state, step_i
        )
        _ = float(losses[-1])
        compile_scan_s = time.perf_counter() - t0
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            params, opt_state, step_i, losses = run_epoch_scan(
                params, opt_state, step_i
            )
            _ = float(losses[-1])
            times.append(time.perf_counter() - t0)
        scan_epoch_s = float(np.median(times))

        # ---------- eval: per-step vs one scan (2 splits x 3 batches) ---
        EV = 6  # total eval batches per epoch
        ev_take = rs.permutation(N_PAT)[: EV * B].reshape(EV, B).astype(
            np.int32
        )
        ev_mask = np.ones((EV, B), bool)

        def eval_steps():
            out = 0.0
            for s in range(EV):
                b = batch.__class__(
                    x=jnp.asarray(Xnp[ev_take[s]]),
                    y=jnp.asarray(Ynp[ev_take[s]]),
                    age=jnp.asarray(Anp[ev_take[s]]),
                    sample_mask=jnp.ones(B, bool),
                    raw_data=None,
                )
                pred, loss = fns.eval_step(params, b, ctx)
                out += float(loss)
            return out

        def eval_scan():
            preds, losses = fns.eval_scan(
                params, data, jnp.asarray(ev_take), jnp.asarray(ev_mask), ctx
            )
            return float(losses.sum())

        eval_steps()  # compile
        t0 = time.perf_counter()
        for _ in range(4):
            eval_steps()
        eval_steps_s = (time.perf_counter() - t0) / 4
        eval_scan()  # compile
        t0 = time.perf_counter()
        for _ in range(4):
            eval_scan()
        eval_scan_s = (time.perf_counter() - t0) / 4
    finally:
        spmm.set_backend("xla")
        spmm.set_spmm_dtype(None)

    out = {
        "metric": "epoch_scan_speedup",
        "value": per_step_epoch_s / scan_epoch_s,
        "unit": "x",
        "steps_per_epoch": S,
        "per_step_epoch_s": per_step_epoch_s,
        "scan_epoch_s": scan_epoch_s,
        "per_step_ms_equiv": per_step_epoch_s / S * 1e3,
        "scan_step_ms_equiv": scan_epoch_s / S * 1e3,
        "compile_step_s": compile_step_s,
        "compile_scan_s": compile_scan_s,
        "eval_steps_s": eval_steps_s,
        "eval_scan_s": eval_scan_s,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
