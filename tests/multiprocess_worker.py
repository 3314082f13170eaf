"""Worker for the multi-process loopback tests (SURVEY §4.5 / §5.8).

Run as: python multiprocess_worker.py <pid> <nproc> <port> <out> \
            [--n-model K] [--steps S] [--save FILE] [--load FILE]

Each process sees 2 virtual CPU devices (XLA_FLAGS set by the spawning
test), joins the JAX process group over the loopback coordinator with gloo
CPU collectives, builds ONE global ('data','model') mesh over all
num_processes*2 devices via parallel.multihost.global_mesh (so the tests
exercise the same axis-placement helper a real pod uses), and runs S steps
of the mesh-parallel flagship train step
(parallel/mesh.py:make_parallel_train_step) on the deterministic tiny setup
from __graft_entry__.  It writes "loss param_checksum" to <out>; the tests
assert every process agrees AND matches a single-process run over the same
global device count.

--save/--load exercise the checkpoint-restart story ACROSS process groups
(SURVEY §5.3 failure model: barrier at init + checkpoint-restart): --save
writes the post-step replicated (params, opt_state) to an .npz from process
0 only; --load restores it in a FRESH process group (new coordinator, new
mesh) before stepping, exactly like a pod restart resuming from a
checkpoint.  np.savez stands in for orbax here deliberately — the state
layout (replicated pytree, deterministic leaf order) is what is under test,
not the serialization backend (driver-level orbax resume is covered by
test_driver_parallel_ckpt.py / test_aux_subsystems.py).
"""
import argparse
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("pid", type=int)
    ap.add_argument("nproc", type=int)
    ap.add_argument("port", type=int)
    ap.add_argument("out")
    ap.add_argument("--n-model", type=int, default=2)
    ap.add_argument("--steps", type=int, default=1)
    ap.add_argument("--step0", type=int, default=0,
                    help="global index of the first step (resume offset; "
                    "keeps the per-step RNG stream aligned across restarts)")
    ap.add_argument("--save", default=None)
    ap.add_argument("--load", default=None)
    args = ap.parse_args()
    import jax

    from multilevel_gnn_tpu.parallel.multihost import (
        global_mesh,
        initialize_multihost,
    )

    if args.nproc > 1:
        info = initialize_multihost(
            coordinator_address=f"localhost:{args.port}",
            num_processes=args.nproc,
            process_id=args.pid,
            cpu_collectives="gloo",
        )
        assert info["process_count"] == args.nproc, info
    import jax.numpy as jnp
    import numpy as np

    import __graft_entry__ as graft
    from multilevel_gnn_tpu.parallel.mesh import (
        make_parallel_train_step,
        replicate,
        shard_batch,
        shard_ctx,
    )
    from multilevel_gnn_tpu.train.step import make_optimizer

    cfg, cohort, fold, model, params, batch = graft._tiny_setup()
    optimizer = make_optimizer(cfg, steps_per_epoch=1)
    opt_state = optimizer.init(params)
    cw = jnp.asarray(fold.class_weight, jnp.float32)

    mesh = global_mesh(args.n_model)
    step = make_parallel_train_step(model, cfg, mesh, optimizer)

    state = {"params": params, "opt_state": opt_state}
    if args.load:
        # restart: restore the replicated state saved by a PREVIOUS process
        # group (leaf order is deterministic: same init, same treedef)
        leaves, treedef = jax.tree.flatten(state)
        with np.load(args.load) as z:
            loaded = [z[f"arr_{i}"] for i in range(len(leaves))]
        assert len(loaded) == len(leaves)
        state = jax.tree.unflatten(
            treedef,
            [np.asarray(l).astype(ref.dtype) for l, ref in zip(loaded, leaves)],
        )
    params = replicate(state["params"], mesh)
    opt_state = replicate(state["opt_state"], mesh)
    b = shard_batch(batch, mesh)
    ctx = shard_ctx(fold.ctx, mesh)
    with mesh:
        for s in range(args.steps):
            params, opt_state, loss = step(
                params, opt_state, b, ctx, replicate(cw, mesh),
                jax.random.PRNGKey(1 + args.step0 + s),
            )
        # replicated scalar checksum every process can read locally
        checksum = jax.jit(
            lambda p: sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(p)),
            out_shardings=jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec()
            ),
        )(params)
    if args.save and args.pid == 0:
        # fully-replicated arrays: the first addressable shard IS the value
        leaves = jax.tree.leaves({"params": params, "opt_state": opt_state})
        np.savez(
            args.save,
            **{
                f"arr_{i}": np.asarray(x.addressable_data(0))
                for i, x in enumerate(leaves)
            },
        )
    with open(args.out, "w") as f:
        f.write(f"{float(loss):.10e} {float(checksum):.10e}\n")


if __name__ == "__main__":
    main()
