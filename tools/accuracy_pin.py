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


def run_pin(protocol: str, seed: int, epochs, num_run: int, small: bool):
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
        "shipped": {},  # exactly as the YAML ships
        "f32_xla": dict(
            kernel_backend="xla", spmm_bf16=False, windowed_spmm=False,
            compute_dtype=None,
        ),
    }
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

    ce = results["shipped"]["check_epochs"]
    deltas = {
        e: results["shipped"]["auc"][e] - results["f32_xla"]["auc"][e]
        for e in ce
    }
    max_abs = max(abs(v) for v in deltas.values())
    return {
        "protocol": protocol,
        "seed": seed,
        "metric": "shipped_stack_auc_delta_max",
        "value": max_abs,
        "unit": "auc",
        "pass": max_abs < 0.005,
        "check_epochs": ce,
        "auc_shipped": {str(e): results["shipped"]["auc"][e] for e in ce},
        "auc_f32_xla": {str(e): results["f32_xla"]["auc"][e] for e in ce},
        "auc_by_loss_shipped_final": results["shipped"]["auc_by_loss"][ce[-1]],
        "auc_by_loss_f32_final": results["f32_xla"]["auc_by_loss"][ce[-1]],
        "wall_shipped_s": results["shipped"]["wall_time_s"],
        "wall_f32_xla_s": results["f32_xla"]["wall_time_s"],
        "epochs": base.epochs,
        "batch_size": base.batch_size,
        "cohort": cohort_kw,
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
    args = ap.parse_args()

    from multilevel_gnn_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    import jax

    print(f"devices: {jax.devices()}", file=sys.stderr)

    rows = []
    for seed in args.seeds:
        t0 = time.time()
        row = run_pin(
            args.protocol, seed, args.epochs, args.num_run, args.small
        )
        row["pin_wall_s"] = time.time() - t0
        print(json.dumps(row))
        rows.append(row)
    if len(rows) > 1:
        vals = [r["value"] for r in rows]
        print(json.dumps({
            "metric": "shipped_stack_auc_delta_max_over_seeds",
            "protocol": args.protocol,
            "value": max(vals),
            "per_seed": {str(r["seed"]): r["value"] for r in rows},
            "mean": float(np.mean(vals)),
            "std": float(np.std(vals)),
            "pass": all(r["pass"] for r in rows),
        }))


if __name__ == "__main__":
    main()
