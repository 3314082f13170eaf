"""Protocol-scale accuracy pin for the shipped TPU numeric stack
(VERDICT r2 Next #4; extended to all shipped protocols + multi-seed per
VERDICT r3 Next #4).

The shipped configs default to kernel_backend=pallas + spmm_bf16 +
windowed_spmm + compute_dtype=bfloat16; r2 validated that stack's accuracy
only at toy scale.  This tool runs the FULL CV protocol (driver, fold
derivation, model dims from the shipped YAML) on a reference-scale
synthetic cohort (400 patients, 146 pathways, 15.4k node slots — the
bench_fold_deriv fixture) twice on the SAME cohort:

  arm A: the shipped stack exactly as configs/<protocol>.yaml ships it
  arm B: the f32/XLA fallback (kernel_backend=xla, no bf16 anywhere)

and reports pooled CV AUC per check-epoch for both plus the max delta.
Pass threshold (recorded in BASELINE.md): |delta| < 0.005 at every
check-epoch.

--protocol kirc|lgg pins the 140-epoch / batch-64 / lr-5e-5 regime
(twice the bf16 drift accumulation window of GBM's 70 epochs); --seeds
takes several cohort seeds so the delta gets an error bar against
run-to-run noise.

Reading the result (measured, PINS_r04.jsonl): GBM (3 seeds) and KIRC
pass the strict <0.005-at-every-check-epoch criterion.  LGG does NOT —
and neither does the --control arm (f32 Pallas vs f32 XLA, reduction
-ORDER-only perturbation: transients 0.0038-0.0112, one 0.0057 final),
which proves the excursions are chaotic amplification of infinitesimal
perturbations through the discrete best-valid checkpoint selection, an
intrinsic ~0.01-class noise floor of that protocol — not bf16 drift.
The stable drift indicators are the by-loss finals (<=0.001 across all
shipped AND control runs) and sign-symmetric transients; judge LGG
against the control, not against the raw 0.005 threshold.

Run on TPU:   timeout 7200 python tools/accuracy_pin.py --protocol gbm \
                  --seeds 2 3 4
              timeout 7200 python tools/accuracy_pin.py --protocol kirc
CPU smoke:    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
              python tools/accuracy_pin.py --small --epochs 5
(on CPU the pallas arm falls back to xla — smoke only, not the pin).
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_pin(protocol: str, seed: int, epochs, num_run: int, small: bool,
            control: bool = False):
    from multilevel_gnn_tpu.core.config import Config
    from multilevel_gnn_tpu.data.synthetic import make_synthetic_cohort
    from multilevel_gnn_tpu.train.driver import run_experiment
    from multilevel_gnn_tpu.utils.runtime import configure_backend

    yaml_path = os.path.join(
        os.path.dirname(__file__), "..", "configs", f"{protocol}.yaml"
    )
    kw = {"num_run": num_run}
    if epochs is not None:
        kw["epochs"] = epochs
    base = Config.from_yaml(yaml_path, **kw)
    cohort_kw = (
        dict(n_patients=60, n_pathways=6)
        if small
        else dict(
            n_patients=400, n_pathways=146, genes_per_pathway=38,
            overlap=3, n_edges=60000,
        )
    )

    f32_xla = dict(
        kernel_backend="xla", spmm_bf16=False, windowed_spmm=False,
        compute_dtype=None,
    )
    if control:
        # Noise-floor control: f32 Pallas (exact 3-limb matmul segment
        # sum) vs f32 XLA — NO reduced precision anywhere, only reduction
        # -ORDER differences (~1e-7 relative).  Any pooled-AUC excursion
        # here bounds what chaotic trajectory amplification + discrete
        # best-valid checkpoint selection does to an infinitesimal
        # perturbation over the protocol — the yardstick for reading the
        # shipped arm's transients (observed: LGG seed-4 epoch-55-70
        # selection flip, 0.0255, with final-epoch delta 0.0001).
        test_arm = "f32_pallas"
        arms = {
            test_arm: dict(
                kernel_backend="pallas", spmm_bf16=False,
                windowed_spmm=False, compute_dtype=None,
            ),
            "f32_xla": f32_xla,
        }
    else:
        test_arm = "shipped"
        arms = {test_arm: {}, "f32_xla": f32_xla}  # shipped = YAML verbatim
    results = {}
    for name, overrides in arms.items():
        cfg = base.replace(**overrides)
        configure_backend(cfg)
        # fresh cohort per arm (identical seed -> identical data + splits);
        # reusing one cohort object would share fold caches, which is fine,
        # but a fresh build keeps the arms fully independent
        cohort = make_synthetic_cohort(cfg, seed=seed, **cohort_kw)
        res = run_experiment(cfg, cohort)
        results[name] = res
        print(
            f"[{protocol} seed={seed}] {name}: wall "
            f"{res['wall_time_s']:.0f}s  "
            + "  ".join(
                f"auc@{e}={res['auc'][e]:.4f}" for e in res["check_epochs"]
            ),
            file=sys.stderr,
        )

    ce = results[test_arm]["check_epochs"]
    deltas = {
        e: results[test_arm]["auc"][e] - results["f32_xla"]["auc"][e]
        for e in ce
    }
    max_abs = max(abs(v) for v in deltas.values())
    # End-state deltas separate real numeric drift from transient best
    # -valid SELECTION-TIMING flips: the pooled curve is a step function
    # of per-fold argmaxes over noisy valid AUC, so a ~1e-7 perturbation
    # can shift WHICH epoch a new best lands on (arms briefly hold
    # different snapshots) without any accuracy loss — both arms converge
    # again once both have taken the improvement.  Drift accumulates and
    # does NOT converge; flips do.  pass_final is the drift criterion;
    # `pass` (max over every check-epoch) stays as the strict transient
    # record, read against the --control noise floor.
    final_delta = abs(deltas[ce[-1]])
    by_loss_final_delta = abs(
        results[test_arm]["auc_by_loss"][ce[-1]]
        - results["f32_xla"]["auc_by_loss"][ce[-1]]
    )
    return {
        "protocol": protocol,
        "seed": seed,
        "metric": f"{test_arm}_auc_delta_max",
        "value": max_abs,
        "unit": "auc",
        "pass": max_abs < 0.005,
        "final_delta": final_delta,
        "by_loss_final_delta": by_loss_final_delta,
        "pass_final": final_delta < 0.005 and by_loss_final_delta < 0.005,
        "check_epochs": ce,
        f"auc_{test_arm}": {str(e): results[test_arm]["auc"][e] for e in ce},
        "auc_f32_xla": {str(e): results["f32_xla"]["auc"][e] for e in ce},
        f"auc_by_loss_{test_arm}_final":
            results[test_arm]["auc_by_loss"][ce[-1]],
        "auc_by_loss_f32_final": results["f32_xla"]["auc_by_loss"][ce[-1]],
        f"wall_{test_arm}_s": results[test_arm]["wall_time_s"],
        "wall_f32_xla_s": results["f32_xla"]["wall_time_s"],
        "epochs": base.epochs,
        "batch_size": base.batch_size,
        "cohort": cohort_kw,
    }


REGISTERED_RULE = (
    "PASS iff (a) every shipped seed's by-loss FINAL delta <= 0.001, and "
    "(b) max-over-seeds shipped transient max-delta <= max(0.005, control "
    "envelope), where the control envelope = max-over-seeds transient "
    "max-delta of the f32-Pallas-vs-f32-XLA control (reduction-order-only "
    "perturbation) on the SAME seeds"
)


def run_pin_registered(protocol: str, seeds, epochs, num_run: int,
                       small: bool):
    """Pre-registered machine-checked pin (VERDICT r4 Next #3).

    The r4 LGG reading ("judge by by-loss finals and against the control")
    was a post-hoc paragraph; this encodes it as ONE pass rule, decided
    before the r5 measurement and evaluated identically for all three
    protocols:

        %s

    Rationale: by-loss finals are the stable drift indicator (selection
    flips do not move them; accumulated numeric drift does), and the
    control arm measures what the protocol's discrete best-valid
    checkpoint selection does to an infinitesimal (order-only)
    perturbation — transients beyond 0.005 are only acceptable inside
    that measured envelope.  Three experiments per seed (shipped, f32
    Pallas control, f32 XLA baseline); both arms' deltas are computed
    against the SAME f32 XLA run.
    """ % REGISTERED_RULE
    from multilevel_gnn_tpu.core.config import Config
    from multilevel_gnn_tpu.data.synthetic import make_synthetic_cohort
    from multilevel_gnn_tpu.train.driver import run_experiment
    from multilevel_gnn_tpu.utils.runtime import configure_backend

    yaml_path = os.path.join(
        os.path.dirname(__file__), "..", "configs", f"{protocol}.yaml"
    )
    kw = {"num_run": num_run}
    if epochs is not None:
        kw["epochs"] = epochs
    base = Config.from_yaml(yaml_path, **kw)
    cohort_kw = (
        dict(n_patients=60, n_pathways=6)
        if small
        else dict(
            n_patients=400, n_pathways=146, genes_per_pathway=38,
            overlap=3, n_edges=60000,
        )
    )
    arms = {
        "shipped": {},  # the YAML verbatim
        "f32_pallas": dict(kernel_backend="pallas", spmm_bf16=False,
                           windowed_spmm=False, compute_dtype=None),
        "f32_xla": dict(kernel_backend="xla", spmm_bf16=False,
                        windowed_spmm=False, compute_dtype=None),
    }
    per_seed = []
    for seed in seeds:
        t0 = time.time()
        results = {}
        for name, overrides in arms.items():
            cfg = base.replace(**overrides)
            configure_backend(cfg)
            cohort = make_synthetic_cohort(cfg, seed=seed, **cohort_kw)
            res = run_experiment(cfg, cohort)
            results[name] = res
            print(
                f"[{protocol} seed={seed}] {name}: wall "
                f"{res['wall_time_s']:.0f}s  "
                + "  ".join(
                    f"auc@{e}={res['auc'][e]:.4f}"
                    for e in res["check_epochs"]
                ),
                file=sys.stderr,
            )
        ce = results["shipped"]["check_epochs"]

        def delta_stats(arm):
            d = {e: results[arm]["auc"][e] - results["f32_xla"]["auc"][e]
                 for e in ce}
            return {
                "max_abs": max(abs(v) for v in d.values()),
                "final": abs(d[ce[-1]]),
                "by_loss_final": abs(
                    results[arm]["auc_by_loss"][ce[-1]]
                    - results["f32_xla"]["auc_by_loss"][ce[-1]]
                ),
            }

        row = {
            "protocol": protocol,
            "seed": seed,
            "shipped": delta_stats("shipped"),
            "control": delta_stats("f32_pallas"),
            "auc_shipped_final": results["shipped"]["auc"][ce[-1]],
            "auc_f32_xla_final": results["f32_xla"]["auc"][ce[-1]],
            "seed_wall_s": round(time.time() - t0, 1),
        }
        print(json.dumps({"registered_pin_seed": row}))
        per_seed.append(row)

    envelope = max(r["control"]["max_abs"] for r in per_seed)
    shipped_max = max(r["shipped"]["max_abs"] for r in per_seed)
    by_loss_ok = all(r["shipped"]["by_loss_final"] <= 0.001
                     for r in per_seed)
    transient_ok = shipped_max <= max(0.005, envelope)
    return {
        "metric": "registered_accuracy_pin",
        "protocol": protocol,
        "rule": REGISTERED_RULE,
        "pass": bool(by_loss_ok and transient_ok),
        "by_loss_finals_ok": bool(by_loss_ok),
        "transients_ok": bool(transient_ok),
        "shipped_max_delta": shipped_max,
        "control_envelope": envelope,
        "by_loss_final_per_seed": {
            str(r["seed"]): r["shipped"]["by_loss_final"] for r in per_seed
        },
        "shipped_max_per_seed": {
            str(r["seed"]): r["shipped"]["max_abs"] for r in per_seed
        },
        "control_max_per_seed": {
            str(r["seed"]): r["control"]["max_abs"] for r in per_seed
        },
        "seeds": list(seeds),
        "epochs": base.epochs,
        "num_run": num_run,
        "per_seed": per_seed,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--protocol", default="gbm",
                    choices=["gbm", "kirc", "lgg"])
    ap.add_argument("--epochs", type=int, default=None,
                    help="override the protocol's epoch count (default: "
                         "the shipped YAML's — gbm 70, kirc/lgg 140)")
    ap.add_argument("--num-run", type=int, default=1)
    ap.add_argument("--small", action="store_true",
                    help="tiny cohort smoke test")
    ap.add_argument("--seeds", type=int, nargs="+", default=[2],
                    help="cohort seeds (2 = the bench_fold_deriv fixture); "
                         "several give the delta an error bar")
    ap.add_argument("--control", action="store_true",
                    help="noise-floor control: f32 Pallas vs f32 XLA "
                         "(reduction-order-only perturbation) — bounds "
                         "the selection-flip class of transients")
    ap.add_argument("--registered", action="store_true",
                    help="pre-registered machine-checked pin: 3 arms per "
                         "seed, ONE PASS/FAIL line per protocol under "
                         "REGISTERED_RULE (VERDICT r4 Next #3)")
    args = ap.parse_args()

    from multilevel_gnn_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    import jax

    print(f"devices: {jax.devices()}", file=sys.stderr)

    if args.registered:
        t0 = time.time()
        verdict = run_pin_registered(
            args.protocol, args.seeds, args.epochs, args.num_run, args.small
        )
        verdict["wall_s"] = round(time.time() - t0, 1)
        print(json.dumps(verdict))
        return

    rows = []
    for seed in args.seeds:
        t0 = time.time()
        row = run_pin(
            args.protocol, seed, args.epochs, args.num_run, args.small,
            control=args.control,
        )
        row["pin_wall_s"] = time.time() - t0
        print(json.dumps(row))
        rows.append(row)
    if len(rows) > 1:
        vals = [r["value"] for r in rows]
        print(json.dumps({
            "metric": rows[0]["metric"] + "_over_seeds",
            "protocol": args.protocol,
            "value": max(vals),
            "per_seed": {str(r["seed"]): r["value"] for r in rows},
            "final_per_seed": {
                str(r["seed"]): r["final_delta"] for r in rows
            },
            "mean": float(np.mean(vals)),
            "std": float(np.std(vals)),
            "pass": all(r["pass"] for r in rows),
            "pass_final": all(r["pass_final"] for r in rows),
        }))


if __name__ == "__main__":
    main()
