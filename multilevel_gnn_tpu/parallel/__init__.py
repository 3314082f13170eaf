from multilevel_gnn_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    maybe_make_mesh,
    shard_batch,
    shard_ctx,
    replicate,
    make_parallel_train_step,
)
from multilevel_gnn_tpu.parallel.halo import (  # noqa: F401
    HaloPartition,
    build_halo_partition,
    halo_gather_scatter,
)
