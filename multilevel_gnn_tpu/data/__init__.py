from multilevel_gnn_tpu.data.cohort import Cohort  # noqa: F401
from multilevel_gnn_tpu.data.synthetic import make_synthetic_cohort  # noqa: F401
