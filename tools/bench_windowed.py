"""TPU bench: windowed SpMM vs composed (gather + flat segment-sum) path.

GBM-scale clustered graph: N=15405 rows (3*5135 interleaved omics slots),
E~150k edges = 90% community-banded in gene space + 10% uniform hubs, plus
15405 self loops — the realistic cohort-graph structure (cross-omics edges
adjacent, PPI community-local, hub spill).  BC = 32*64 = 2048 wide rows.

Chained-input timing per CLAUDE.md bench-honesty note.
"""
import sys
import time

import numpy as np


def make_clustered_graph(rng, **kw):
    """Cohort-like topology + self loops (library fixture + loop append)."""
    from multilevel_gnn_tpu.data.synthetic import make_cohort_topology

    src, dst, n = make_cohort_topology(rng, **kw)
    loop = np.arange(n)
    return np.concatenate([src, loop]), np.concatenate([dst, loop]), n


def main():
    import jax
    import jax.numpy as jnp

    from multilevel_gnn_tpu.ops.pallas import windowed as W
    from multilevel_gnn_tpu.ops.pallas.segment_sum import (
        SortedSegments, flat_segment_sum,
    )
    from multilevel_gnn_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    print("devices:", jax.devices(), file=sys.stderr)

    rng = np.random.RandomState(0)
    src, dst, n = make_clustered_graph(rng)
    E = len(src)
    w = rng.rand(E, 1).astype(np.float32)
    BC = 2048
    print(f"N={n} E={E}", file=sys.stderr)

    t0 = time.time()
    perm, f_id, f_best = W.choose_node_perm(src, dst, n, group=3, Wb=512, nwin=2)
    plan = W.build_plan(src, dst, n, perm=perm)
    print(
        f"plan: {time.time()-t0:.1f}s in_window={plan.in_window_frac:.3f} "
        f"(identity {f_id:.3f}) res={plan.n_res} tres={plan.n_tres} "
        f"chunks={plan.fwd.n_chunks} perm={'rcm' if perm is not None else 'id'}",
        file=sys.stderr,
    )

    csr = SortedSegments.build(dst, n, te=256)
    senders_j = jnp.asarray(src, jnp.int32)
    receivers_j = jnp.asarray(dst, jnp.int32)
    w_j = jnp.asarray(w)

    x0 = jnp.asarray(rng.randn(n, BC).astype(np.float32))

    def timed(fn, x, iters=20, tag=""):
        t0 = time.time()
        y = fn(x)
        jax.block_until_ready(y)
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(iters):
            x = fn(x)
        jax.block_until_ready(x)
        dt = (time.time() - t0) / iters
        eps = E / dt
        print(
            f"{tag}: {dt*1e3:.2f} ms  {eps/1e6:.0f}M edges/s  "
            f"(compile {compile_s:.1f}s)",
            file=sys.stderr,
        )
        return dt

    for dtype, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        xd = x0.astype(dtype)

        # composed path: XLA gather -> flat segment sum (current shipped)
        ext_idx = jnp.take(
            jnp.concatenate([senders_j, jnp.zeros((1,), jnp.int32)]),
            csr.perm_pad, axis=0,
        )
        flat_w = jnp.take(
            jnp.concatenate([w_j, jnp.zeros((1, 1), jnp.float32)]),
            csr.perm_pad, axis=0,
        ).astype(dtype)

        @jax.jit
        def composed(x):
            msg = jnp.take(x, ext_idx, axis=0) * flat_w
            out = flat_segment_sum(msg, csr)
            return out.astype(dtype) * 1e-3 + x * 0.999  # chain

        timed(composed, xd, tag=f"composed {name}")

        @jax.jit
        def windowed(x):
            out = W.windowed_spmm_2d(x, w_j, senders_j, receivers_j, plan)
            return out.astype(dtype) * 1e-3 + x * 0.999  # chain

        timed(windowed, xd, tag=f"windowed {name}")


if __name__ == "__main__":
    main()
