"""Empirical DMA-issue-rate bound for the fused gather SpMM (VERDICT r1 #1).

The fused gather-in-kernel SpMM needs one async DMA per edge slot
(166k at GBM scale).  Mosaic rejects single-row slices of a 2D
(8,128)-tiled HBM memref ("Slice shape along dimension 0 must be aligned
to tiling (8)"), so the only legal per-row fetch is via a 3D repack
x.reshape(N, 16, 128): dim 0 is untiled, one logical row = one (16,128)
= 8 KB DMA.

This kernel isolates that cost: it performs the EXACT flat-layout gather
DMA pattern (te per-row copies per grid step, double-buffered) with
near-zero compute.  Its runtime is a hard lower bound on any fused
kernel's runtime; compare against the composed path's gather+write+read
cost (~8.5 ms f32 / ~4 ms bf16 of its 13.1 / 6.7 ms totals) to decide
whether full fusion can win.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_dma_gather.py
"""
import sys
import time

import numpy as np


def build(n_rows, n_chunks, te, dtype):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G, L = 16, 128  # one logical 2048-wide row = (16, 128)

    def kernel(owner_ref, src_cur_ref, src_nxt_ref, x_hbm, out_ref, msg_buf,
               copy_sem):
        c = pl.program_id(0)
        n = pl.num_programs(0)
        slot = jax.lax.rem(c, 2)
        nxt = jax.lax.rem(c + 1, 2)

        # src blocks are 1024-wide (4 chunks) — XLA lays out 1D s32 args
        # with T(1024) tiling and Mosaic verifies block==layout tile
        def issue(src_ref, off, s):
            def body(e, _):
                idx = src_ref[off + e]
                pltpu.make_async_copy(
                    x_hbm.at[pl.ds(idx, 1)],
                    msg_buf.at[s, pl.ds(e, 1)],
                    copy_sem.at[s],
                ).start()
                return 0

            jax.lax.fori_loop(0, te, body, 0, unroll=te)

        def drain(s):
            def body(e, _):
                pltpu.make_async_copy(
                    x_hbm.at[pl.ds(0, 1)],
                    msg_buf.at[s, pl.ds(e, 1)],
                    copy_sem.at[s],
                ).wait()
                return 0

            jax.lax.fori_loop(0, te, body, 0, unroll=te)

        @pl.when(c == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)
            issue(src_cur_ref, jax.lax.rem(c, 4) * te, 0)
            drain(0)

        @pl.when(c + 1 < n)
        def _():
            issue(src_nxt_ref, jax.lax.rem(c + 1, 4) * te, nxt)

        # touch the landed data (cheap): accumulate first lane-group row sums
        out_ref[:] += jnp.sum(
            msg_buf[slot, :, 0, :].astype(jnp.float32), axis=0, keepdims=True
        )

        @pl.when(c + 1 < n)
        def _():
            drain(nxt)

    def run(x3, src):
        owner = jnp.zeros((n_chunks,), jnp.int32)
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_chunks,),
                in_specs=[
                    pl.BlockSpec(
                        (4 * te,), lambda c, ow: (c // 4,),
                        memory_space=pltpu.MemorySpace.SMEM,
                    ),
                    pl.BlockSpec(
                        (4 * te,),
                        lambda c, ow, _n=n_chunks: (
                            jnp.minimum(c + 1, _n - 1) // 4,
                        ),
                        memory_space=pltpu.MemorySpace.SMEM,
                    ),
                    pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
                ],
                out_specs=pl.BlockSpec((8, L), lambda c, ow: (0, 0)),
                scratch_shapes=[
                    pltpu.VMEM((2, te, G, L), dtype),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((8, L), jnp.float32),
        )(owner, src, src, x3)

    return run


def main():
    from multilevel_gnn_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    N, E_flat, te = 15408, 165888, 256
    n_chunks = E_flat // te
    for dtype in (jnp.float32, jnp.bfloat16):
        x3 = jnp.asarray(rng.randn(N, 16, 128), dtype)
        src = jnp.asarray(rng.randint(0, N, E_flat), jnp.int32)
        run = build(N, n_chunks, te, dtype)
        fn = jax.jit(run)
        t0 = time.perf_counter()
        jax.block_until_ready(fn(x3, src))
        compile_s = time.perf_counter() - t0
        # chain inputs so the tunnel can't value-cache (CLAUDE.md) — pallas
        # programs appear exempt but belt-and-braces via perturbed x3
        def step(x3):
            o = fn(x3, src)
            return x3 + (o[0, :1] * 1e-20).astype(x3.dtype)

        sfn = jax.jit(step)
        x = x3
        for _ in range(2):
            x = sfn(x)
        jax.block_until_ready(x)
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            x = sfn(x)
        jax.block_until_ready(x)
        dt = (time.perf_counter() - t0) / iters
        name = np.dtype(dtype).name if dtype != jnp.bfloat16 else "bf16"
        print(
            f"gather-DMA {name}: {E_flat/dt:.3e} rows/s "
            f"({dt*1e3:.2f} ms for {E_flat} x {16*128*np.dtype(np.float32 if dtype==jnp.float32 else np.float16).itemsize*2} B rows, "
            f"{E_flat*16*128*(4 if dtype==jnp.float32 else 2)/dt/1e9:.0f} GB/s, "
            f"compile {compile_s:.1f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
