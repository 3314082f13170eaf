"""Pure-torch shims for torch_geometric 2.2 / torch_scatter 2.1 / torch_cluster.

Test-only (VERDICT r1 item #6): lets the REAL reference modules under
/root/reference execute as parity oracles without PyG installed.  Semantics
follow the pinned versions in /root/reference/requirements.txt:149-150
(torch-geometric==2.2.0, torch-scatter==2.1.0):

  * scatter(reduce='max'/'min'): true extrema (negatives preserved);
    segments with no contribution are set to 0.
  * MessagePassing: flow source_to_target — x_j = x[edge_index[0]],
    x_i = x[edge_index[1]]; message/update kwargs resolved by signature.
  * SAGEConv: lin_l (neighbor, bias=bias) + lin_r (root, bias=False) —
    the reference subclass reads self.lin_r.weight
    (reference torch_vertex.py:262).

Install with ``install()`` BEFORE importing reference modules; it also
prepends /root/reference to sys.path (read-only import).
"""
import inspect
import sys
import types

import torch
import torch.nn.functional as F

REFERENCE_ROOT = "/root/reference"


# ---------------------------------------------------------------- scatter ---
def _expand(index, src, dim):
    if index.dim() == 1:
        shape = [1] * src.dim()
        shape[dim] = -1
        index = index.view(shape).expand_as(src)
    return index


def _scatter_sum(src, index, dim, dim_size):
    size = list(src.shape)
    size[dim] = dim_size
    out = torch.zeros(size, dtype=src.dtype)
    return out.scatter_add_(dim, _expand(index, src, dim), src)


def _counts(index, dim_size, dtype):
    return torch.bincount(index, minlength=dim_size).to(dtype)


def scatter(src, index, dim=0, out=None, dim_size=None, reduce="sum"):
    assert out is None
    if dim < 0:
        dim += src.dim()
    if dim_size is None:
        dim_size = int(index.max()) + 1 if index.numel() else 0
    if reduce in ("sum", "add"):
        return _scatter_sum(src, index, dim, dim_size)
    if reduce == "mean":
        s = _scatter_sum(src, index, dim, dim_size)
        cnt = _counts(index, dim_size, s.dtype).clamp(min=1)
        shape = [1] * s.dim()
        shape[dim] = -1
        return s / cnt.view(shape)
    if reduce in ("max", "min"):
        size = list(src.shape)
        size[dim] = dim_size
        fill = float("-inf") if reduce == "max" else float("inf")
        o = torch.full(size, fill, dtype=src.dtype)
        o.scatter_reduce_(
            dim, _expand(index, src, dim), src,
            "amax" if reduce == "max" else "amin", include_self=True,
        )
        o[torch.isinf(o)] = 0  # torch_scatter 2.x zero-fills empty segments
        return o
    raise NotImplementedError(reduce)


def scatter_add(src, index, dim=0, out=None, dim_size=None):
    return scatter(src, index, dim, out, dim_size, "sum")


def scatter_mean(src, index, dim=0, out=None, dim_size=None):
    return scatter(src, index, dim, out, dim_size, "mean")


def _scatter_extreme_tuple(src, index, dim, dim_size, kind):
    if dim < 0:
        dim += src.dim()
    if dim_size is None:
        dim_size = int(index.max()) + 1 if index.numel() else 0
    out = scatter(src, index, dim, None, dim_size, kind)
    return out, None  # argextreme unused by the reference


def scatter_max(src, index, dim=0, out=None, dim_size=None):
    return _scatter_extreme_tuple(src, index, dim, dim_size, "max")


def scatter_min(src, index, dim=0, out=None, dim_size=None):
    return _scatter_extreme_tuple(src, index, dim, dim_size, "min")


def scatter_softmax(src, index, dim=0):
    if dim < 0:
        dim += src.dim()
    dim_size = int(index.max()) + 1 if index.numel() else 0
    mx = scatter(src, index, dim, None, dim_size, "max")
    shifted = (src - mx.index_select(dim, index)).exp()
    denom = _scatter_sum(shifted, index, dim, dim_size).clamp(min=1e-16)
    return shifted / denom.index_select(dim, index)


# ------------------------------------------------------------------- utils ---
def degree(index, num_nodes=None, dtype=None):
    if num_nodes is None:
        num_nodes = int(index.max()) + 1 if index.numel() else 0
    out = torch.bincount(index, minlength=num_nodes)
    return out.to(dtype or torch.float32)


def remove_self_loops(edge_index, edge_attr=None):
    keep = edge_index[0] != edge_index[1]
    edge_index = edge_index[:, keep]
    if edge_attr is not None:
        edge_attr = edge_attr[keep]
    return edge_index, edge_attr


def add_self_loops(edge_index, edge_attr=None, fill_value=1.0, num_nodes=None):
    if num_nodes is None:
        num_nodes = int(edge_index.max()) + 1 if edge_index.numel() else 0
    loop = torch.arange(num_nodes, dtype=edge_index.dtype)
    edge_index = torch.cat([edge_index, torch.stack([loop, loop])], dim=1)
    if edge_attr is not None:
        if edge_attr.dim() == 1:
            fill = torch.full((num_nodes,), fill_value, dtype=edge_attr.dtype)
        else:
            fill = torch.full(
                (num_nodes, edge_attr.size(1)), fill_value, dtype=edge_attr.dtype
            )
        edge_attr = torch.cat([edge_attr, fill], dim=0)
    return edge_index, edge_attr


def to_dense_batch(x, batch=None, fill_value=0.0, max_num_nodes=None):
    if batch is None:
        return x.unsqueeze(0), torch.ones(1, x.size(0), dtype=torch.bool)
    b = int(batch.max()) + 1
    counts = torch.bincount(batch, minlength=b)
    n = int(max_num_nodes or counts.max())
    out = torch.full((b, n, x.size(-1)), fill_value, dtype=x.dtype)
    mask = torch.zeros(b, n, dtype=torch.bool)
    for i in range(b):
        rows = x[batch == i][:n]
        out[i, : rows.size(0)] = rows
        mask[i, : rows.size(0)] = True
    return out, mask


def to_dense_adj(edge_index, batch=None, edge_attr=None, max_num_nodes=None):
    if batch is None:
        n = int(max_num_nodes or (int(edge_index.max()) + 1))
        adj = torch.zeros(1, n, n)
        w = edge_attr if edge_attr is not None else torch.ones(edge_index.size(1))
        adj[0, edge_index[0], edge_index[1]] = w.flatten().float()
        return adj
    raise NotImplementedError("batched to_dense_adj not needed by tests")


# --------------------------------------------------------- MessagePassing ---
class MessagePassing(torch.nn.Module):
    """PyG 2.2 subset: propagate with signature-resolved message/update
    kwargs, add/mean/max base aggregate at node_dim."""

    def __init__(self, aggr="add", flow="source_to_target", node_dim=-2):
        super().__init__()
        self.aggr = aggr
        self.flow = flow
        self.node_dim = node_dim

    def _size_of(self, kwargs, size):
        if isinstance(size, int):
            return size
        if isinstance(size, (list, tuple)) and size and size[-1] is not None:
            return int(size[-1])
        x = kwargs.get("x")
        if torch.is_tensor(x):
            return x.size(self.node_dim if x.dim() > 1 else 0)
        raise ValueError("cannot infer size")

    def propagate(self, edge_index, size=None, **kwargs):
        src, dst = edge_index[0], edge_index[1]
        n = self._size_of(kwargs, size)
        msg_args = {}
        for name in inspect.signature(self.message).parameters:
            if name.endswith("_j") and kwargs.get(name[:-2]) is not None:
                msg_args[name] = kwargs[name[:-2]].index_select(
                    self.node_dim, src
                )
            elif name.endswith("_i") and kwargs.get(name[:-2]) is not None:
                msg_args[name] = kwargs[name[:-2]].index_select(
                    self.node_dim, dst
                )
            elif name in kwargs:
                msg_args[name] = kwargs[name]
        msg = self.message(**msg_args)
        out = self.aggregate(msg, dst, ptr=None, dim_size=n)
        upd_params = list(inspect.signature(self.update).parameters)[1:]
        upd_args = [kwargs[p] for p in upd_params if p in kwargs]
        return self.update(out, *upd_args)

    def aggregate(self, inputs, index, ptr=None, dim_size=None):
        reduce = {"add": "sum", "sum": "sum", "mean": "mean", "max": "max"}[
            self.aggr or "add"
        ]
        return scatter(
            inputs, index, dim=self.node_dim, dim_size=dim_size, reduce=reduce
        )

    def message(self, x_j):
        return x_j

    def update(self, aggr_out):
        return aggr_out


# ------------------------------------------------------------ conv layers ---
class SAGEConv(MessagePassing):
    def __init__(self, in_channels, out_channels, normalize=False, bias=True,
                 **kwargs):
        super().__init__(aggr="mean", **kwargs)
        self.in_channels, self.out_channels = in_channels, out_channels
        self.normalize = normalize
        self.lin_l = torch.nn.Linear(in_channels, out_channels, bias=bias)
        self.lin_r = torch.nn.Linear(in_channels, out_channels, bias=False)

    def forward(self, x, edge_index):
        out = self.lin_l(self.propagate(edge_index, x=x))
        out = out + self.lin_r(x)
        if self.normalize:
            out = F.normalize(out, p=2.0, dim=-1)
        return out


class GCNConv(MessagePassing):
    def __init__(self, in_channels, out_channels, bias=True, **kwargs):
        super().__init__(aggr="add", **kwargs)
        self.lin = torch.nn.Linear(in_channels, out_channels, bias=False)
        self.bias = (
            torch.nn.Parameter(torch.zeros(out_channels)) if bias else None
        )

    def forward(self, x, edge_index, edge_weight=None):
        n = x.size(0)
        edge_index, edge_weight = remove_self_loops(edge_index, edge_weight)
        edge_index, edge_weight = add_self_loops(
            edge_index, edge_weight, num_nodes=n
        )
        if edge_weight is None:
            edge_weight = torch.ones(edge_index.size(1))
        deg = _scatter_sum(edge_weight.flatten(), edge_index[1], 0, n)
        dinv = deg.pow(-0.5)
        dinv[torch.isinf(dinv)] = 0
        norm = dinv[edge_index[0]] * edge_weight.flatten() * dinv[edge_index[1]]
        xw = self.lin(x)
        out = self.propagate(edge_index, x=xw, norm=norm)
        if self.bias is not None:
            out = out + self.bias
        return out

    def message(self, x_j, norm):
        return norm.view(-1, 1) * x_j


class GATConv(MessagePassing):
    def __init__(self, in_channels, out_channels, heads=1, concat=True,
                 negative_slope=0.2, dropout=0.0, add_self_loops=True,
                 bias=True, **kwargs):
        super().__init__(aggr="add", **kwargs)
        self.heads, self.out_channels = heads, out_channels
        self.negative_slope = negative_slope
        self.add_self_loops = add_self_loops
        self.lin_src = torch.nn.Linear(
            in_channels, heads * out_channels, bias=False
        )
        self.att_src = torch.nn.Parameter(torch.zeros(1, heads, out_channels))
        self.att_dst = torch.nn.Parameter(torch.zeros(1, heads, out_channels))
        torch.nn.init.xavier_uniform_(self.att_src)
        torch.nn.init.xavier_uniform_(self.att_dst)
        self.bias = (
            torch.nn.Parameter(torch.zeros(heads * out_channels))
            if bias and concat
            else None
        )

    def forward(self, x, edge_index):
        n = x.size(0)
        if self.add_self_loops:
            edge_index, _ = remove_self_loops(edge_index)
            edge_index, _ = add_self_loops(edge_index, num_nodes=n)
        src, dst = edge_index[0], edge_index[1]
        xw = self.lin_src(x).view(n, self.heads, self.out_channels)
        a_src = (xw * self.att_src).sum(-1)  # (N, H)
        a_dst = (xw * self.att_dst).sum(-1)
        alpha = F.leaky_relu(a_src[src] + a_dst[dst], self.negative_slope)
        alpha = scatter_softmax(alpha, dst, dim=0)
        msg = xw[src] * alpha.unsqueeze(-1)
        out = scatter(
            msg.reshape(-1, self.heads * self.out_channels), dst,
            dim=0, dim_size=n, reduce="sum",
        )
        if self.bias is not None:
            out = out + self.bias
        return out


class GINConv(MessagePassing):
    def __init__(self, nn_module, eps=0.0, train_eps=False, **kwargs):
        super().__init__(aggr="add", **kwargs)
        self.nn = nn_module
        self.eps = eps

    def forward(self, x, edge_index):
        out = self.propagate(edge_index, x=x)
        return self.nn((1 + self.eps) * x + out)


class EdgeConv(MessagePassing):
    def __init__(self, nn_module, aggr="max", **kwargs):
        super().__init__(aggr=aggr, **kwargs)
        self.nn = nn_module

    def forward(self, x, edge_index):
        return self.propagate(edge_index, x=x)

    def message(self, x_i, x_j):
        return self.nn(torch.cat([x_i, x_j - x_i], dim=-1))


class DenseSAGEConv(torch.nn.Module):
    def __init__(self, in_channels, out_channels, normalize=False, bias=True):
        super().__init__()
        self.normalize = normalize
        self.lin_rel = torch.nn.Linear(in_channels, out_channels, bias=False)
        self.lin_root = torch.nn.Linear(in_channels, out_channels, bias=bias)

    def forward(self, x, adj, mask=None):
        x = x.unsqueeze(0) if x.dim() == 2 else x
        adj = adj.unsqueeze(0) if adj.dim() == 2 else adj
        out = torch.matmul(adj, x) / adj.sum(dim=-1, keepdim=True).clamp(min=1)
        out = self.lin_rel(out) + self.lin_root(x)
        if self.normalize:
            out = F.normalize(out, p=2.0, dim=-1)
        if mask is not None:
            out = out * mask.view(adj.size(0), adj.size(1), 1).to(x.dtype)
        return out


class DenseGraphConv(torch.nn.Module):
    def __init__(self, in_channels, out_channels, aggr="add", bias=True):
        super().__init__()
        self.lin_rel = torch.nn.Linear(in_channels, out_channels, bias=bias)
        self.lin_root = torch.nn.Linear(in_channels, out_channels, bias=False)

    def forward(self, x, adj, mask=None):
        x = x.unsqueeze(0) if x.dim() == 2 else x
        adj = adj.unsqueeze(0) if adj.dim() == 2 else adj
        out = self.lin_rel(torch.matmul(adj, x)) + self.lin_root(x)
        if mask is not None:
            out = out * mask.view(adj.size(0), adj.size(1), 1).to(x.dtype)
        return out


def dense_diff_pool(x, adj, s, mask=None):
    x = x.unsqueeze(0) if x.dim() == 2 else x
    adj = adj.unsqueeze(0) if adj.dim() == 2 else adj
    s = s.unsqueeze(0) if s.dim() == 2 else s
    s = torch.softmax(s, dim=-1)
    if mask is not None:
        m = mask.view(x.size(0), x.size(1), 1).to(x.dtype)
        x, s = x * m, s * m
    out = torch.matmul(s.transpose(1, 2), x)
    out_adj = torch.matmul(torch.matmul(s.transpose(1, 2), adj), s)
    link_loss = torch.norm(adj - torch.matmul(s, s.transpose(1, 2)), p=2)
    link_loss = link_loss / adj.numel()
    ent_loss = (-s * torch.log(s + 1e-15)).sum(dim=-1).mean()
    return out, out_adj, link_loss, ent_loss


def _global_pool(reduce, name):
    def pool(x, batch, size=None):
        n = size or (int(batch.max()) + 1 if batch.numel() else 0)
        return scatter(x, batch, dim=0, dim_size=n, reduce=reduce)

    pool.__name__ = name
    return pool


global_add_pool = _global_pool("sum", "global_add_pool")
global_mean_pool = _global_pool("mean", "global_mean_pool")
global_max_pool = _global_pool("max", "global_max_pool")


class TopKPooling(torch.nn.Module):  # imported by reference, never called
    def __init__(self, *a, **kw):
        super().__init__()

    def forward(self, *a, **kw):
        raise NotImplementedError("TopKPooling is dead code in the reference")


def knn_graph(x, k, batch=None, loop=False):
    """torch_cluster.knn_graph: edges (2, N*k) src->dst, dst = each node,
    src = its k nearest neighbors (euclidean)."""
    assert batch is None or int(batch.max()) == 0
    d = torch.cdist(x, x)
    if not loop:
        d.fill_diagonal_(float("inf"))
    idx = d.topk(k, dim=-1, largest=False).indices  # (N, k)
    dst = torch.arange(x.size(0)).repeat_interleave(k)
    return torch.stack([idx.reshape(-1), dst])


# ------------------------------------------------------------------ install ---
def install():
    """Register shim modules in sys.modules and put /root/reference on
    sys.path.  Idempotent."""
    if "torch_scatter" in sys.modules and hasattr(
        sys.modules["torch_scatter"], "_mgtpu_shim"
    ):
        return
    ts = types.ModuleType("torch_scatter")
    ts._mgtpu_shim = True
    for f in (scatter, scatter_add, scatter_mean, scatter_max, scatter_min,
              scatter_softmax):
        setattr(ts, f.__name__, f)

    tg = types.ModuleType("torch_geometric")
    tg_nn = types.ModuleType("torch_geometric.nn")
    for obj in (MessagePassing, SAGEConv, GCNConv, GATConv, GINConv, EdgeConv,
                DenseSAGEConv, DenseGraphConv, dense_diff_pool,
                global_add_pool, global_mean_pool, global_max_pool,
                TopKPooling):
        setattr(tg_nn, getattr(obj, "__name__", None) or obj.__class__.__name__, obj)
    tg_utils = types.ModuleType("torch_geometric.utils")
    for f in (degree, remove_self_loops, add_self_loops, to_dense_batch,
              to_dense_adj):
        setattr(tg_utils, f.__name__, f)
    tg_data = types.ModuleType("torch_geometric.data")

    class Data:
        def __init__(self, **kw):
            self.__dict__.update(kw)

    class InMemoryDataset:
        pass

    def extract_zip(*a, **kw):
        raise NotImplementedError

    tg_data.Data = Data
    tg_data.InMemoryDataset = InMemoryDataset
    tg_data.extract_zip = extract_zip
    # reference train.py:17 imports it; the full-stack trajectory test
    # builds its own sequential loaders instead (torch shuffle RNG is the
    # one intentional divergence), so a placeholder suffices
    tg_data.DataLoader = None
    tg.nn = tg_nn
    tg.utils = tg_utils
    tg.data = tg_data

    tc = types.ModuleType("torch_cluster")
    tc.knn_graph = knn_graph

    sys.modules["torch_scatter"] = ts
    sys.modules["torch_geometric"] = tg
    sys.modules["torch_geometric.nn"] = tg_nn
    sys.modules["torch_geometric.utils"] = tg_utils
    sys.modules["torch_geometric.data"] = tg_data
    sys.modules["torch_cluster"] = tc

    # Deps the reference imports at module top but never exercises on the
    # paths under test: cvxopt (utils/knnie.py:13 — only the unused
    # _solve_lp helpers touch it) and torchvision (multiloader.py:22 —
    # transforms are never instantiated).  matplotlib IS installed.
    if "cvxopt" not in sys.modules:
        cv = types.ModuleType("cvxopt")
        cv.matrix = None
        cv.solvers = types.SimpleNamespace()
        sys.modules["cvxopt"] = cv
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_t = types.ModuleType("torchvision.transforms")
        tv.transforms = tv_t
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv_t

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
