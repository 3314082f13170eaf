"""f32 flat-kernel drift chase (VERDICT r3 Next #2 tail / Weak #2).

The f32 flat segment-sum measured 3.3-3.8e8 edges/s in r1/r2 and 2.79-2.81e8
in r3/r4, reproduced across fresh compiles while the bf16 kernel and the XLA
arm held — consistent with remote Mosaic codegen drift.  The shipped path is
bf16 (unaffected), but VERDICT asks for the drift to be explained or
recovered.  This sweep re-tunes the two kernel knobs under the CURRENT
backend build:

  MGTPU_TE        edge-chunk tile (graph.with_sorted_meta; default 256)
  MGTPU_MXU_PREC  f32 matmul mode: split3 (exact 3-limb bf16) | highest
                  (6-pass) | default (fast, inexact — diagnostic only)

and reports edges/s per config with the same timing-honesty rules as
bench.py (fixed topo seed for compile-cache hits, clock data seed +
chained inputs for value-cache honesty, value-fetch window ends).

Run on TPU:  timeout 3600 python tools/retune_flat.py
             python tools/retune_flat.py --te 256 512 --prec split3
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def measure(te: int, prec: str, seed: int):
    os.environ["MGTPU_TE"] = str(te)
    os.environ["MGTPU_MXU_PREC"] = prec
    import jax
    import jax.numpy as jnp

    from multilevel_gnn_tpu.core.graph import Graph
    from multilevel_gnn_tpu.ops import spmm

    rng = np.random.RandomState(0)
    rng_data = np.random.RandomState(seed)
    N, E, B, C = 15405, 150_000, 32, 64
    edges = rng.randint(0, N, size=(2, E))
    attr = rng.rand(E).astype(np.float32)
    g = Graph.from_edges(edges, attr, N).with_sorted_meta()

    fn = jax.jit(
        lambda x: spmm.gather_scatter(x, g, "mean", g.edge_attr,
                                      backend="pallas") + 0.001
    )
    x = jax.block_until_ready(
        jax.device_put(jnp.asarray(rng_data.randn(B, N, C).astype(np.float32)))
    )
    t0 = time.perf_counter()
    x2 = fn(x)
    _ = float(jnp.sum(x2))
    compile_s = time.perf_counter() - t0
    # chained timing, value-fetch end (bench.timeit_chained rules)
    for _ in range(2):
        x = fn(x)
    _ = float(jnp.sum(x))
    iters = 40
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x)
    _ = float(jnp.sum(x))
    dt = (time.perf_counter() - t0) / iters
    return {"te": te, "prec": prec, "edges_per_s": B * E / dt,
            "ms": dt * 1e3, "compile_s": compile_s}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--te", type=int, nargs="*", default=[128, 256, 512])
    ap.add_argument("--prec", nargs="*",
                    default=["split3", "highest", "default"])
    ap.add_argument("--seed", type=int, default=None)
    args = ap.parse_args()
    seed = args.seed if args.seed is not None else int(time.time()) % 1_000_000

    results = []
    for te in args.te:
        for prec in args.prec:
            r = measure(te, prec, seed)
            results.append(r)
            print(json.dumps(r), flush=True)
    best = max(results, key=lambda r: r["edges_per_s"])
    print(json.dumps({"best": best, "seed": seed,
                      "anchor_f32_edges_per_s": 3.65e8}), flush=True)


if __name__ == "__main__":
    main()
