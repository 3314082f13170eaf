from multilevel_gnn_tpu.nn.basic import MLP, act, make_norm, torch_linear_init  # noqa: F401
from multilevel_gnn_tpu.nn.conv import (  # noqa: F401
    GraphConvLayer,
    RSAGEConv,
    GENConv,
    GCNConv,
    GATConv,
    GINConv,
    MRConv,
    EdgeConv,
    PathwayConv,
    MsgNorm,
)
