from multilevel_gnn_tpu.ops.segment import (  # noqa: F401
    segment_sum,
    segment_mean,
    segment_max,
    segment_min,
    segment_softmax,
    segment_count,
)
from multilevel_gnn_tpu.ops.spmm import gather_scatter, spmm_mean, spmm_sum  # noqa: F401
