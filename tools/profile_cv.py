"""Profile the synthetic-cohort full-CV wall time on TPU.

Runs bench.py's bench_cv() protocol (configs/gbm.yaml, 1 run x 5 folds x
10 epochs, 200 patients) with INFO logging so the per-fold host-prep and
per-epoch timings land on stderr, and prints a phase decomposition.
"""
import logging
import sys
import time


def main():
    logging.basicConfig(level=logging.INFO, stream=sys.stderr)

    import jax

    from multilevel_gnn_tpu.core.config import Config
    from multilevel_gnn_tpu.data.synthetic import make_synthetic_cohort
    from multilevel_gnn_tpu.train.driver import run_experiment
    from multilevel_gnn_tpu.utils.runtime import (
        configure_backend,
        enable_compilation_cache,
    )

    enable_compilation_cache()
    print("devices:", jax.devices(), file=sys.stderr)

    t0 = time.time()
    cfg = Config.from_yaml("configs/gbm.yaml", num_run=1, epochs=10)
    configure_backend(cfg)
    t_cfg = time.time()
    cohort = make_synthetic_cohort(
        cfg, seed=cfg.seed, n_patients=200, n_pathways=20
    )
    t_cohort = time.time()
    res = run_experiment(cfg, cohort)
    t_end = time.time()
    print(
        f"cfg+backend {t_cfg - t0:.1f}s  cohort {t_cohort - t_cfg:.1f}s  "
        f"experiment {t_end - t_cohort:.1f}s  total {t_end - t0:.1f}s  "
        f"driver-reported wall {res['wall_time_s']:.1f}s  "
        f"epoch_s_median {res.get('epoch_s_median')}"
    )


if __name__ == "__main__":
    main()
