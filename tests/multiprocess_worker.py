"""Worker for the multi-process loopback test (SURVEY §4.5 / §5.8).

Run as: python multiprocess_worker.py <process_id> <num_processes> <port> <out>

Each process sees 2 virtual CPU devices (XLA_FLAGS set by the spawning
test), joins the JAX process group over the loopback coordinator with gloo
CPU collectives, builds ONE global ('data','model') mesh over all
num_processes*2 devices, and runs one step of the mesh-parallel flagship
train step (parallel/mesh.py:make_parallel_train_step) on the deterministic
tiny setup from __graft_entry__.  It writes "loss param_checksum" to <out>;
the test asserts every process agrees AND matches a single-process run over
the same global device count.
"""
import sys


def main():
    pid, nproc, port, out = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    import jax

    from multilevel_gnn_tpu.parallel.multihost import initialize_multihost

    if nproc > 1:
        initialize_multihost(
            coordinator_address=f"localhost:{port}",
            num_processes=nproc,
            process_id=pid,
            cpu_collectives="gloo",
        )
    import jax.numpy as jnp

    import __graft_entry__ as graft
    from multilevel_gnn_tpu.parallel.mesh import (
        make_mesh,
        make_parallel_train_step,
        replicate,
        shard_batch,
        shard_ctx,
    )
    from multilevel_gnn_tpu.train.step import make_optimizer

    n_dev = len(jax.devices())
    assert n_dev % 2 == 0, n_dev
    cfg, cohort, fold, model, params, batch = graft._tiny_setup()
    optimizer = make_optimizer(cfg, steps_per_epoch=1)
    opt_state = optimizer.init(params)
    cw = jnp.asarray(fold.class_weight, jnp.float32)
    rng_key = jax.random.PRNGKey(1)

    mesh = make_mesh(n_dev // 2, 2)
    step = make_parallel_train_step(model, cfg, mesh, optimizer)
    params = replicate(params, mesh)
    opt_state = replicate(opt_state, mesh)
    b = shard_batch(batch, mesh)
    ctx = shard_ctx(fold.ctx, mesh)
    with mesh:
        params, opt_state, loss = step(params, opt_state, b, ctx,
                                       replicate(cw, mesh), rng_key)
        # replicated scalar checksum every process can read locally
        checksum = jax.jit(
            lambda p: sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(p)),
            out_shardings=jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec()
            ),
        )(params)
    with open(out, "w") as f:
        f.write(f"{float(loss):.10e} {float(checksum):.10e}\n")


if __name__ == "__main__":
    main()
