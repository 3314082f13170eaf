"""Tile-shape sweep for the windowed SpMM kernel on TPU.

The shipped v5e tiles (tn=128, te=256, tc=512 bf16) give a ~1064-step grid
at GBM cohort scale (~580 chunk steps + 121*4 matmul steps); per-step
Mosaic overhead is a candidate cost.  This sweeps (tn, te, tc) to find the
step-count/VMEM sweet spot.  Chained-input timing per CLAUDE.md honesty
rules; data seed from the clock.

Usage: python tools/sweep_windowed.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from multilevel_gnn_tpu.data.synthetic import make_cohort_topology
    from multilevel_gnn_tpu.ops.pallas import windowed as W
    from multilevel_gnn_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    print("devices:", jax.devices(), file=sys.stderr)

    topo_rng = np.random.RandomState(0)  # pinned: executables cache-stable
    src, dst, n = make_cohort_topology(topo_rng)
    loop = np.arange(n)
    src = np.concatenate([src, loop])
    dst = np.concatenate([dst, loop])
    E = len(src)
    data_rng = np.random.RandomState(int(time.time()) % 1_000_000)
    w = data_rng.rand(E, 1).astype(np.float32)
    BC = 2048
    print(f"N={n} E={E}", file=sys.stderr)

    perm, f_id, f_best = W.choose_node_perm(
        src, dst, n, group=3, Wb=512, nwin=2
    )
    senders_j = jnp.asarray(src, jnp.int32)
    receivers_j = jnp.asarray(dst, jnp.int32)
    w_j = jnp.asarray(w)
    x0 = jnp.asarray(data_rng.randn(n, BC).astype(np.float32))

    def timed(fn, x, iters=20):
        t0 = time.time()
        y = fn(x)
        _ = float(jnp.sum(y[:1, :1]))
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(iters):
            x = fn(x)
        _ = float(jnp.sum(x[:1, :1]))
        return (time.time() - t0) / iters, compile_s

    # (tn, te, tc_bf16) variants; None tc = shipped heuristic
    variants = [
        (128, 256, None),
        (128, 256, 1024),
        (128, 256, 2048),
        (128, 512, 1024),
        (256, 256, 1024),
        (256, 512, 2048),
    ]
    for tn, te, tc in variants:
        try:
            plan = W.build_plan(src, dst, n, perm=perm, tn=tn, te=te)
            nf = 1 if (tc or 512) >= 2048 else 2048 // (tc or 512)
            steps = int(plan.fwd.steps[W.NF_VARIANTS.index(nf)][0].shape[0])
            W.TC_PREF_OVERRIDE = tc

            @jax.jit
            def windowed(x):
                out = W.windowed_spmm_2d(
                    x, w_j, senders_j, receivers_j, plan
                )
                return out.astype(jnp.bfloat16) * 1e-3 + x * 0.999

            dt, comp = timed(windowed, x0.astype(jnp.bfloat16))
            print(
                f"tn={tn} te={te} tc={tc or 'heur'}: {dt*1e3:.2f} ms "
                f"({E/dt/1e6:.0f}M edges/s, {steps} steps, "
                f"chunks={plan.fwd.n_chunks}, compile {comp:.1f}s)",
                flush=True,
            )
        except Exception as e:  # Mosaic VMEM/layout failures are data
            print(f"tn={tn} te={te} tc={tc}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
        finally:
            W.TC_PREF_OVERRIDE = None


if __name__ == "__main__":
    main()
