from multilevel_gnn_tpu.core.graph import Graph  # noqa: F401
