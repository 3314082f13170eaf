"""Pod-ready scaling bench (VERDICT r2 Next #7; BASELINE >=80% efficiency
target).

One command per topology — the only thing that changes is the environment:

  1 chip (anchor, real TPU):
      mgtpu-train --config configs/gbm.yaml --synthetic --bench-scaling
  1 host, N chips:
      mgtpu-train --config configs/gbm.yaml --synthetic \
          --mesh 1xN --bench-scaling
  M hosts (run on EVERY host; coordinator = host 0's addr):
      MGTPU_COORDINATOR=host0:8476 MGTPU_NUM_PROC=M MGTPU_PROC_ID=<i> \
      mgtpu-train --config configs/gbm.yaml --synthetic \
          --mesh 1x<M*chips> --bench-scaling
  virtual-mesh dry run (no TPU):
      env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
          XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      mgtpu-train --config configs/gbm.yaml --synthetic \
          --mesh 1x8 --bench-scaling

Measures the boundary-only halo aggregation (parallel/halo.py — the
scaling-critical op of every conv) forward+backward at GBM production
scale over growing 'model' axis sizes, and reports edges/s/chip,
efficiency vs the single-chip anchor, and the PREDICTED bytes-on-wire per
conv from the halo partition stats (k, H, C) next to the full-psum
equivalent it replaces.  Committed dry-run output lives in
docs/SCALING.md; BASELINE.md cites this command for the >=80% target.
"""
from __future__ import annotations

import json
import sys
import time
from typing import Optional

import numpy as np


def run_bench_scaling(
    cfg,
    sizes=None,
    iters: int = 10,
    out=sys.stdout,
) -> dict:
    import jax
    import jax.numpy as jnp

    from multilevel_gnn_tpu.data.synthetic import make_gbm_scale_setup
    from multilevel_gnn_tpu.ops import spmm
    from multilevel_gnn_tpu.parallel import make_mesh
    from multilevel_gnn_tpu.parallel.halo import (
        build_halo_partition,
        halo_gather_scatter,
        pad_nodes_for,
    )

    n_dev = len(jax.devices())
    if sizes is None:
        want = max(cfg.mesh_model_axis, 1)
        sizes = sorted(
            {s for s in (1, 2, 4, 8, 16, 32) if s <= min(n_dev, max(want, 2))}
        )
    # Pallas in-shard kernels only on real TPU (interpret mode on CPU is
    # orders of magnitude slower than the xla path at this scale)
    use_pallas = jax.default_backend() in ("tpu", "axon")
    seed = int(time.time()) % 1_000_000

    cfg_s, model, graph, ctx, batch = make_gbm_scale_setup(
        topology="cohort", seed=seed, topo_seed=0,
    )
    B, C = 2, 64  # feature block for the aggregation bench
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(B, graph.n_nodes, C).astype(np.float32))
    E = int(graph.n_edges)

    def timeit(fn, x0):
        t0 = time.perf_counter()
        out_v = fn(x0)
        c0 = float(out_v[0])  # fetch forces completion
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            # chain: feed a scaled mix of output + grad back in (the axon
            # tunnel value-caches identical executions)
            out_v = fn(out_v[1])
        _ = float(out_v[0])
        return (time.perf_counter() - t0) / iters, c0, compile_s

    results = {"sizes": [], "ms": {}, "edges_per_s_per_chip": {},
               "efficiency": {}, "wire_bytes_per_conv": {},
               "psum_equiv_bytes": {}, "halo_H": {}}

    # ---- single-chip anchor: the shipped single-device aggregation ----
    if use_pallas:
        spmm.set_backend("pallas")
    try:
        def single(x):
            def loss(x):
                o = spmm.gather_scatter(x, graph, "mean", graph.edge_attr)
                return jnp.sum(o * 0.001), x * 0.9 + o * 0.1

            (v, nxt), g = jax.value_and_grad(loss, has_aux=True)(x)
            return v, nxt + g * 0.01

        fn1 = jax.jit(single)
        dt1, _, _ = timeit(fn1, x)
    finally:
        spmm.set_backend("xla")
    anchor = B * E / dt1
    results["sizes"].append(1)
    results["ms"]["1"] = dt1 * 1e3
    results["edges_per_s_per_chip"]["1"] = anchor
    results["efficiency"]["1"] = 1.0
    print(
        f"k=1 anchor: {dt1*1e3:.2f} ms fwd+bwd, "
        f"{anchor:.3e} edges/s/chip", file=sys.stderr,
    )

    for k in sizes:
        if k == 1 or k > n_dev:
            continue
        mesh = make_mesh(1, k)
        hp = build_halo_partition(graph, k, pallas=use_pallas)
        xp = pad_nodes_for(x, hp)
        H = int(hp.halo)

        def sharded(x, hp=hp, mesh=mesh):
            def loss(x):
                o = halo_gather_scatter(x, hp, mesh, "mean", graph.edge_attr)
                return jnp.sum(o * 0.001), x * 0.9 + o * 0.1

            (v, nxt), g = jax.value_and_grad(loss, has_aux=True)(x)
            return v, nxt + g * 0.01

        with mesh:
            fnk = jax.jit(sharded)
            dtk, _, _ = timeit(fnk, xp)
        eps_chip = B * E / dtk / k
        # wire bytes per conv: each shard all_to_all-sends (k-1) blocks of
        # (B, H, C) f32; total = k*(k-1)*B*H*C*4.  The full-psum path this
        # replaces all-reduces (B, N_pad, C) partials: ~2*(k-1)*B*N_pad*C*4
        # total (ring).
        wire = k * (k - 1) * B * H * C * 4
        psum_eq = 2 * (k - 1) * B * hp.k * hp.n_local * C * 4
        results["sizes"].append(k)
        results["ms"][str(k)] = dtk * 1e3
        results["edges_per_s_per_chip"][str(k)] = eps_chip
        results["efficiency"][str(k)] = eps_chip / anchor
        results["wire_bytes_per_conv"][str(k)] = wire
        results["psum_equiv_bytes"][str(k)] = psum_eq
        results["halo_H"][str(k)] = H
        print(
            f"k={k}: {dtk*1e3:.2f} ms, {eps_chip:.3e} edges/s/chip, "
            f"eff {eps_chip/anchor:.2f}, H={H}, wire {wire/1e6:.1f} MB/conv "
            f"(psum equiv {psum_eq/1e6:.1f} MB)", file=sys.stderr,
        )

    payload = {
        "metric": "halo_scaling_efficiency",
        "value": results["efficiency"].get(
            str(max(s for s in results["sizes"]))
        ),
        "unit": "x",
        "backend": "pallas" if use_pallas else "xla",
        "n_devices": n_dev,
        "E": E,
        "B": B,
        "C": C,
        **results,
    }
    print(json.dumps(payload), file=out)
    return payload


def maybe_init_multihost() -> Optional[int]:
    """Initialize jax.distributed from MGTPU_COORDINATOR / MGTPU_NUM_PROC /
    MGTPU_PROC_ID env vars (the documented M-host command); no-op when
    unset.  Returns the process id or None."""
    import os

    coord = os.environ.get("MGTPU_COORDINATOR")
    if not coord:
        return None
    from multilevel_gnn_tpu.parallel.multihost import initialize_multihost

    n = int(os.environ["MGTPU_NUM_PROC"])
    pid = int(os.environ["MGTPU_PROC_ID"])
    initialize_multihost(coord, n, pid)
    return pid
