"""mgtpu-warm: pre-flight compiler for cold processes (VERDICT r3 #6).

On the target TPU the compile path is REMOTE and weather-bound: first-call
windows of 200-560 s were measured for executables that are 2-40 ms steady
-state.  This tool AOT-compiles (``jit.lower().compile()``) every
executable an experiment will dispatch — the whole-fold scan (or epoch
scan / per-step pair for configs that disengage it), the jitted init, and
the optimizer init — into the persistent compilation cache
(utils/runtime.enable_compilation_cache) WITHOUT executing a training
step or paying the batch-transfer bytes.  Because the windowed/flat SpMM
shape buckets are geometric, fold 0's executables serve every fold of the
protocol; a subsequent ``mgtpu-train`` run (same config, any process)
starts on cache hits.

No reference counterpart: the reference's CUDA kernels JIT per-process in
milliseconds (SURVEY.md §5); this subsystem exists because of the remote
-compile tunnel economics documented in CLAUDE.md.
"""
from __future__ import annotations

import argparse
import logging
import time

log = logging.getLogger(__name__)


def warm_experiment(cfg, cohort) -> dict:
    """Compile every executable ``run_experiment(cfg, cohort)`` would
    dispatch; returns {'warm_s': wall seconds, 'path': which loop}."""
    from multilevel_gnn_tpu.parallel.mesh import maybe_make_mesh
    from multilevel_gnn_tpu.train.driver import run_fold, stratified_kfold

    t0 = time.time()
    mesh = maybe_make_mesh(cfg)
    labels = cohort.labels()
    check_epochs = list(range(5, cfg.epochs + 1, 5)) or [cfg.epochs]
    outer = stratified_kfold(labels, 5, cfg.split_shaffle, cfg.split_seed)
    tune, test_idx = outer[0]
    inner = stratified_kfold(labels[tune], 5, cfg.split_shaffle, cfg.split_seed)
    tr, va = inner[0]
    run_fold(
        cfg, cohort, tune[tr], tune[va], test_idx, 0, 0, check_epochs,
        mesh=mesh, warm_only=True,
    )
    return {"warm_s": time.time() - t0}


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="pre-compile an experiment's executables into the "
        "persistent compilation cache (no training step is executed)"
    )
    ap.add_argument("--config", required=True)
    ap.add_argument(
        "--synthetic", action="store_true",
        help="warm against a synthetic cohort (same flag as mgtpu-train)",
    )
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--debug", action="store_true")
    ap.add_argument("--set", nargs="*", default=[], help="key=value overrides")
    args = ap.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

    from multilevel_gnn_tpu.core.config import Config
    from multilevel_gnn_tpu.train.cli import make_cohort, parse_overrides
    from multilevel_gnn_tpu.utils.runtime import (
        configure_backend,
        enable_compilation_cache,
    )

    enable_compilation_cache()
    cfg = Config.from_yaml(args.config, **parse_overrides(args.set))
    if args.debug:
        cfg = cfg.replace(num_run=1, epochs=5, batch_size=8)
    configure_backend(cfg)
    cohort = make_cohort(cfg, args.synthetic, args.data_dir, args.debug)
    out = warm_experiment(cfg, cohort)
    log.info("warm done in %.1f s (cache ready for mgtpu-train)", out["warm_s"])
    print(out)


if __name__ == "__main__":
    main()
