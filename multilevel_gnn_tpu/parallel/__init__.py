from multilevel_gnn_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    maybe_make_mesh,
    shard_batch,
    shard_ctx,
    replicate,
    make_parallel_train_step,
)
