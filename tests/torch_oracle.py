"""Independent PyTorch oracles for conv-layer parity tests.

These are *test-only* dense/loop reference implementations of the documented
layer semantics (see SURVEY.md §2 and reference file:line cites in
multilevel_gnn_tpu/nn/conv.py), written against explicit weight tensors so we
can inject the exact parameters initialized by the flax modules.  They use
naive per-segment loops — slow but unambiguous.
"""
import numpy as np
import torch
import torch.nn.functional as F


def scatter_reduce(msg, dst, n, op="sum"):
    """msg: (E, C) tensor; returns (n, C)."""
    out = torch.zeros(n, msg.shape[1], dtype=msg.dtype)
    for s in range(n):
        rows = msg[dst == s]
        if len(rows) == 0:
            continue
        if op == "sum":
            out[s] = rows.sum(0)
        elif op == "mean":
            out[s] = rows.mean(0)
        elif op == "max":
            out[s] = rows.max(0).values
    return out


def scatter_softmax(z, dst, n):
    out = torch.zeros_like(z)
    for s in range(n):
        rows = dst == s
        if rows.sum() == 0:
            continue
        out[rows] = torch.softmax(z[rows], dim=0)
    return out


def with_self_loops(edges, attr, n, fill=1.0):
    keep = edges[0] != edges[1]
    edges = edges[:, keep]
    attr = attr[keep] if attr is not None else None
    loop = torch.arange(n, dtype=edges.dtype)
    edges = torch.cat([edges, torch.stack([loop, loop])], dim=1)
    if attr is not None:
        attr = torch.cat([attr, torch.full((n, attr.shape[1]), fill)], dim=0)
    return edges, attr


def sage_oracle(x, edges, attr, W, mlp_W, mlp_b, relative=False, normalize=False,
                act="leakyrelu"):
    """RSAGEConv semantics: per-edge (x_j*attr)@W -> scatter-mean -> MLP(cat)."""
    n = x.shape[0]
    edges, attr = with_self_loops(edges, attr, n)
    src, dst = edges[0], edges[1]
    xj = x[src]
    if attr is not None:
        xj = xj * attr
    if relative:
        msg = (xj - x[dst]) @ W
    else:
        msg = xj @ W
    aggr = scatter_reduce(msg, dst, n, "mean")
    h = torch.cat([x, aggr], dim=1) @ mlp_W + mlp_b
    if act == "leakyrelu":
        h = F.leaky_relu(h, 0.2)
    elif act == "relu":
        h = F.relu(h)
    if normalize:
        h = F.normalize(h, p=2, dim=-1)
    return h


def genconv_oracle(x, edges, e_attr, params, aggr="softmax", t=1.0, p=1.0,
                   y=0.0, eps=1e-7):
    """GENConv semantics: msg=relu(x_j+e)+eps -> gen-aggregate -> x+m -> MLP.

    params: dict with optional 'edge_W','edge_b' and 'mlp' = list of (W, b).
    MLP applies relu between layers, last layer linear (norm='none').
    """
    src, dst = edges[0], edges[1]
    n = x.shape[0]
    e = e_attr
    if "edge_W" in params and e_attr is not None:
        e = e_attr @ params["edge_W"] + params["edge_b"]
    msg = x[src]
    if e is not None:
        msg = msg + e
    msg = F.relu(msg) + eps
    if aggr in ("softmax", "softmax_sg", "softmax_sum"):
        w = scatter_softmax(msg * t, dst, n)
        m = scatter_reduce(msg * w, dst, n, "sum")
        if aggr == "softmax_sum":
            deg = torch.zeros(n)
            for d in dst.tolist():
                deg[d] += 1
            m = deg[:, None] ** torch.sigmoid(torch.tensor(y)) * m
    elif aggr in ("power", "power_sum"):
        msg = torch.clamp(msg, 1e-7, 1e1)
        m = scatter_reduce(msg**p, dst, n, "mean")
        m = torch.clamp(m, 1e-7, 1e1) ** (1.0 / p)
        if aggr == "power_sum":
            deg = torch.zeros(n)
            for d in dst.tolist():
                deg[d] += 1
            m = deg[:, None] ** torch.sigmoid(torch.tensor(y)) * m
    elif aggr in ("add", "sum"):
        m = scatter_reduce(msg, dst, n, "sum")
    elif aggr == "mean":
        m = scatter_reduce(msg, dst, n, "mean")
    elif aggr == "max":
        m = scatter_reduce(msg, dst, n, "max")
    h = x + m
    for i, (W, b) in enumerate(params["mlp"]):
        h = h @ W + b
        if i < len(params["mlp"]) - 1:
            h = F.relu(h)
    return h


def gcn_oracle(x, edges, W, b, act="relu"):
    """Kipf GCN: D^-1/2 (A+I) D^-1/2 X W + b, then act."""
    n = x.shape[0]
    edges, _ = with_self_loops(edges, None, n)
    src, dst = edges[0], edges[1]
    A = torch.zeros(n, n)
    for s, d in zip(src.tolist(), dst.tolist()):
        A[d, s] += 1.0
    deg = A.sum(1)
    dinv = deg.pow(-0.5)
    dinv[torch.isinf(dinv)] = 0
    An = dinv[:, None] * A * dinv[None, :]
    h = An @ (x @ W) + b
    if act == "relu":
        h = F.relu(h)
    return h


def gat_oracle(x, edges, W, att_src, att_dst, bias, heads, dim, neg_slope=0.2,
               act="relu"):
    n = x.shape[0]
    edges, _ = with_self_loops(edges, None, n)
    src, dst = edges[0], edges[1]
    xw = (x @ W).reshape(n, heads, dim)
    a_src = (xw * att_src).sum(-1)  # (n, H)
    a_dst = (xw * att_dst).sum(-1)
    alpha = F.leaky_relu(a_src[src] + a_dst[dst], neg_slope)  # (E, H)
    alpha = scatter_softmax(alpha, dst, n)
    out = torch.zeros(n, heads, dim)
    for e in range(src.shape[0]):
        out[dst[e]] += alpha[e][:, None] * xw[src[e]]
    out = out.reshape(n, heads * dim) + bias
    if act == "relu":
        out = F.relu(out)
    return out


def gin_oracle(x, edges, W, b, act="relu"):
    src, dst = edges[0], edges[1]
    n = x.shape[0]
    agg = scatter_reduce(x[src], dst, n, "sum")
    h = (x + agg) @ W + b
    if act == "relu":
        h = F.relu(h)
    return h


def mr_oracle(x, edges, W, b, act="relu"):
    src, dst = edges[0], edges[1]
    n = x.shape[0]
    agg = scatter_reduce(x[src] - x[dst], dst, n, "max")
    h = torch.cat([x, agg], dim=1) @ W + b
    if act == "relu":
        h = F.relu(h)
    return h


def edgeconv_oracle(x, edges, W, b, act="relu"):
    src, dst = edges[0], edges[1]
    n = x.shape[0]
    msg = torch.cat([x[dst], x[src] - x[dst]], dim=1) @ W + b
    if act == "relu":
        msg = F.relu(msg)
    return scatter_reduce(msg, dst, n, "max")
