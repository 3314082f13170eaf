"""Decompose the flagship GBM-scale train step on TPU (pallas+bf16 path).

Times: full step / fwd+bwd (no adam) / fwd only, at num_layers=2 and 1 to
isolate the per-conv-layer cost.  Honest tunnel timing per CLAUDE.md:
chained inputs (params perturbed through the jit), clock-derived data
seed (the tunnel replays cached results of a previously-executed
identical-values chain), and timed windows ending in a scalar
device->host fetch (tunnel block_until_ready can return early).

Usage: python tools/profile_step.py [random|cohort] [windowed]
"""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from multilevel_gnn_tpu.data.synthetic import make_gbm_scale_setup
    from multilevel_gnn_tpu.models.multilevel_gnn import MultilevelGNN
    from multilevel_gnn_tpu.ops import spmm
    from multilevel_gnn_tpu.train.step import build_train_fns, make_loss_fn
    from multilevel_gnn_tpu.utils.runtime import enable_compilation_cache

    topology = sys.argv[1] if len(sys.argv) > 1 else "random"
    windowed = len(sys.argv) > 2 and sys.argv[2] == "windowed"
    mp = len(sys.argv) > 3 and sys.argv[3] == "mp"
    enable_compilation_cache()
    print("devices:", jax.devices(), file=sys.stderr)
    seed = int(time.time()) % 1_000_000
    print(f"topology={topology} windowed={windowed} seed={seed}",
          file=sys.stderr)

    spmm.set_backend("pallas")
    spmm.set_spmm_dtype(jnp.bfloat16)
    iters = 20

    def timed_chain(fn, state):
        out = fn(state)
        _ = float(jnp.sum(jax.tree.leaves(out)[0]))
        t0 = time.perf_counter()
        for _i in range(iters):
            out = fn(out)
        _ = float(jnp.sum(jax.tree.leaves(out)[0]))
        return (time.perf_counter() - t0) / iters

    try:
        for layers in (2,):
            cfg, model, graph, ctx, batch = make_gbm_scale_setup(
                seed=seed, topology=topology, windowed=windowed
            )
            if layers != 2 or mp:
                cfg = cfg.replace(
                    num_layers=layers,
                    compute_dtype="bfloat16" if mp else None,
                )
                model = MultilevelGNN(cfg)
            fns = build_train_fns(model, cfg)
            params, opt_state = fns.init_state(
                jax.random.PRNGKey(0), batch, ctx, 10
            )
            cw = jnp.ones(2, jnp.float32)
            key = jax.random.PRNGKey(1)
            loss_fn = make_loss_fn(model, cfg)

            t_step = timed_chain(
                lambda s: fns.train_step(s[0], s[1], batch, ctx, cw, key)[:2],
                (params, opt_state),
            )

            params, opt_state = fns.init_state(
                jax.random.PRNGKey(0), batch, ctx, 10
            )

            @jax.jit
            def fwdbwd(p):
                (_, _), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    p, batch, ctx, cw, key
                )
                return jax.tree.map(lambda a, b: a - 1e-12 * b, p, g)

            t_fwdbwd = timed_chain(fwdbwd, params)

            @jax.jit
            def fwd(p):
                l, _ = loss_fn(p, batch, ctx, cw, key)
                return jax.tree.map(lambda a: a + 1e-30 * l, p)

            t_fwd = timed_chain(fwd, params)

            print(
                f"layers={layers}: step={t_step*1e3:.1f} ms  "
                f"fwd+bwd={t_fwdbwd*1e3:.1f} ms  fwd={t_fwd*1e3:.1f} ms  "
                f"adam+chain~={max(t_step - t_fwdbwd, 0)*1e3:.1f} ms  "
                f"bwd~={max(t_fwdbwd - t_fwd, 0)*1e3:.1f} ms"
            )
    finally:
        spmm.set_backend("xla")
        spmm.set_spmm_dtype(None)


if __name__ == "__main__":
    main()
