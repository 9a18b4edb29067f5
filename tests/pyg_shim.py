"""Pure-torch shim of the PyG surface the reference imports.

Purpose (VERDICT r4 item 1): let the ACTUAL reference layer code at
``/root/reference/experiments/layers.py``, ``optimized_layers.py`` and
``rmag/models.py`` execute in this environment (torch is installed;
torch_geometric / torch_scatter / torch_sparse are not) and serve as
executable ground truth — forward AND backward — for this framework's
layers, eliminating the hand-transcribed-oracle error class.

The shim implements the documented public semantics of:

- ``torch_scatter.scatter`` (reduce = sum/add/mean/min/max; empty
  segments -> 0; mean divides by count clamped to 1),
- ``torch_sparse.SparseTensor`` (transposed-adjacency convention:
  row = destination, col = source) + ``matmul(adj_t, x, reduce)`` +
  ``fill_diag``,
- ``torch_geometric.nn.MessagePassing`` (signature-driven
  propagate -> message -> aggregate -> update dispatch, ``_j``/``_i``
  gather resolution, SparseTensor fused ``message_and_aggregate`` path),
- ``gcn_norm`` (both edge_index and SparseTensor variants, PyG 2.0
  semantics: deg from the destination column, D^-1/2 A D^-1/2),
- ``add_remaining_self_loops`` (drop existing loops, append one loop per
  node at the end, preserving existing loop weights),
- ``torch_geometric.nn.inits.glorot`` / ``zeros``,
- the PyG 2.0 conv zoo the reference's net modules construct: GCNConv,
  GATConv, GATv2Conv, GINConv, SAGEConv, PNAConv (PyG 2.0 state-dict
  layouts, so exp/weight_port's import rules apply unchanged).

Everything here is written from the public API contracts; nothing is
copied from PyG or the reference. Only this file is "trusted base" —
the reference layer/net logic runs as-is on top, and the convs are
cross-checked two independent ways (against this framework's layers AND
inside the reference's own net wiring).
"""

from __future__ import annotations

import importlib.util
import inspect
import math
import sys
import types

import torch

REFERENCE_ROOT = "/root/reference"


# ---------------------------------------------------------------------------
# torch_scatter
# ---------------------------------------------------------------------------

def scatter(src, index, dim=-1, out=None, dim_size=None, reduce="sum"):
    """torch_scatter.scatter for the call shapes the reference uses
    (dim resolves to 0, index is 1-D over rows)."""
    assert out is None, "out= not supported by the shim"
    dim = dim % src.dim()
    assert dim == 0, f"shim supports row scatter only, got dim={dim}"
    if dim_size is None:
        dim_size = int(index.max().item()) + 1 if index.numel() else 0
    shape = (dim_size,) + tuple(src.shape[1:])
    zeros_ = torch.zeros(shape, dtype=src.dtype, device=src.device)
    if reduce in ("sum", "add"):
        return zeros_.index_add(0, index, src)
    if reduce == "mean":
        s = zeros_.index_add(0, index, src)
        cnt = torch.zeros(dim_size, dtype=src.dtype).index_add(
            0, index, torch.ones(index.shape[0], dtype=src.dtype))
        cnt = cnt.clamp(min=1).view((dim_size,) + (1,) * (src.dim() - 1))
        return s / cnt
    if reduce in ("min", "max"):
        idx = index.view((-1,) + (1,) * (src.dim() - 1)).expand_as(src)
        return zeros_.scatter_reduce(
            0, idx, src, "amin" if reduce == "min" else "amax",
            include_self=False)
    raise ValueError(f"unknown reduce {reduce!r}")


# ---------------------------------------------------------------------------
# torch_sparse
# ---------------------------------------------------------------------------

class SparseTensor:
    """Minimal transposed-adjacency sparse matrix: row = dst, col = src."""

    def __init__(self, row=None, col=None, value=None, sparse_sizes=None):
        self.row = torch.as_tensor(row, dtype=torch.long)
        self.col = torch.as_tensor(col, dtype=torch.long)
        self.value = value
        if sparse_sizes is None:
            m = int(self.row.max().item()) + 1 if self.row.numel() else 0
            n = int(self.col.max().item()) + 1 if self.col.numel() else 0
            sparse_sizes = (m, n)
        self._sizes = tuple(sparse_sizes)

    # -- torch_sparse API used by the reference ---------------------------
    def sparse_sizes(self):
        return self._sizes

    def size(self, i):
        return self._sizes[i]

    def has_value(self):
        return self.value is not None

    def set_value(self, value, layout=None):
        return SparseTensor(self.row, self.col, value, self._sizes)

    def fill_value(self, v, dtype=None):
        val = torch.full((self.row.numel(),), float(v),
                         dtype=dtype or torch.float32)
        return SparseTensor(self.row, self.col, val, self._sizes)

    def sum(self, dim):
        assert dim == 1
        val = self.value if self.value is not None else \
            torch.ones(self.row.numel())
        return torch.zeros(self._sizes[0], dtype=val.dtype).index_add(
            0, self.row, val)

    def matmul(self, x, reduce="sum"):
        return matmul(self, x, reduce=reduce)


def matmul(adj_t, x, reduce="sum"):
    """torch_sparse.matmul(adj_t, x, reduce): per destination row, reduce
    value_e * x[col_e] over that row's entries. Empty rows -> 0; mean
    divides by the entry count (clamped to 1)."""
    row, col, val = adj_t.row, adj_t.col, adj_t.value
    gathered = x.index_select(0, col)
    if val is not None:
        gathered = gathered * val.view(-1, 1)
    m = adj_t.sparse_sizes()[0]
    if reduce in ("sum", "add"):
        return scatter(gathered, row, 0, None, m, reduce="sum")
    if reduce == "mean":
        return scatter(gathered, row, 0, None, m, reduce="mean")
    if reduce in ("min", "max"):
        return scatter(gathered, row, 0, None, m, reduce=reduce)
    raise ValueError(f"unknown reduce {reduce!r}")


def fill_diag(adj_t, fill_value):
    """torch_sparse.diag.fill_diag: replace/insert all diagonal entries
    with ``fill_value``."""
    m, n = adj_t.sparse_sizes()
    k = min(m, n)
    keep = adj_t.row != adj_t.col
    row = torch.cat([adj_t.row[keep], torch.arange(k)])
    col = torch.cat([adj_t.col[keep], torch.arange(k)])
    if adj_t.value is not None:
        value = torch.cat([
            adj_t.value[keep],
            torch.full((k,), float(fill_value), dtype=adj_t.value.dtype)])
    else:
        # entries were implicit ones; keep them implicit only if the fill
        # is also 1, else materialize
        if float(fill_value) == 1.0:
            value = None
        else:
            value = torch.cat([
                torch.ones(int(keep.sum())),
                torch.full((k,), float(fill_value))])
    return SparseTensor(row, col, value, (m, n))


# ---------------------------------------------------------------------------
# torch_geometric.utils / inits / gcn_norm
# ---------------------------------------------------------------------------

def add_remaining_self_loops(edge_index, edge_weight=None, fill_value=1.0,
                             num_nodes=None):
    row, col = edge_index[0], edge_index[1]
    if num_nodes is None:
        num_nodes = int(edge_index.max().item()) + 1 if edge_index.numel() \
            else 0
    mask = row != col
    loop = torch.arange(num_nodes, dtype=edge_index.dtype)
    out_index = torch.cat(
        [edge_index[:, mask], torch.stack([loop, loop])], dim=1)
    out_weight = None
    if edge_weight is not None:
        loop_weight = torch.full((num_nodes,), float(fill_value),
                                 dtype=edge_weight.dtype)
        inv = ~mask
        if int(inv.sum()) > 0:
            # nodes that already had a self-loop keep its original weight
            loop_weight[row[inv]] = edge_weight[inv]
        out_weight = torch.cat([edge_weight[mask], loop_weight])
    return out_index, out_weight


def gcn_norm(edge_index, edge_weight=None, num_nodes=None, improved=False,
             add_self_loops=True, dtype=None):
    fill_value = 2.0 if improved else 1.0
    if isinstance(edge_index, SparseTensor):
        adj_t = edge_index
        if not adj_t.has_value():
            adj_t = adj_t.fill_value(1.0)
        if add_self_loops:
            adj_t = fill_diag(adj_t, fill_value)
            if not adj_t.has_value():
                adj_t = adj_t.fill_value(1.0)
        deg = adj_t.sum(dim=1)
        dinv = deg.pow(-0.5)
        dinv = dinv.masked_fill(torch.isinf(dinv), 0.0)
        value = adj_t.value * dinv[adj_t.row] * dinv[adj_t.col]
        return SparseTensor(adj_t.row, adj_t.col, value,
                            adj_t.sparse_sizes())
    if num_nodes is None:
        num_nodes = int(edge_index.max().item()) + 1
    if edge_weight is None:
        edge_weight = torch.ones(edge_index.shape[1])
    if add_self_loops:
        edge_index, edge_weight = add_remaining_self_loops(
            edge_index, edge_weight, fill_value, num_nodes)
    row, col = edge_index[0], edge_index[1]
    deg = torch.zeros(num_nodes, dtype=edge_weight.dtype).index_add(
        0, col, edge_weight)
    dinv = deg.pow(-0.5)
    dinv = dinv.masked_fill(torch.isinf(dinv), 0.0)
    return edge_index, dinv[row] * edge_weight * dinv[col]


def glorot(tensor):
    if tensor is not None:
        stdv = math.sqrt(6.0 / (tensor.size(-2) + tensor.size(-1)))
        tensor.data.uniform_(-stdv, stdv)


def zeros(tensor):
    if tensor is not None:
        tensor.data.fill_(0.0)


# ---------------------------------------------------------------------------
# torch_geometric.nn.MessagePassing
# ---------------------------------------------------------------------------

class MessagePassing(torch.nn.Module):
    """Signature-driven propagate dispatch (flow source_to_target)."""

    def __init__(self, aggr="add", flow="source_to_target", node_dim=-2,
                 **kwargs):
        super().__init__()
        assert flow == "source_to_target"
        self.aggr = aggr
        self.flow = flow
        self.node_dim = node_dim

    # -- default hooks ----------------------------------------------------
    def message(self, x_j):
        return x_j

    def aggregate(self, inputs, index, ptr=None, dim_size=None):
        return scatter(inputs, index, dim=self.node_dim, dim_size=dim_size,
                       reduce=self.aggr)

    def message_and_aggregate(self, adj_t, **kwargs):
        raise NotImplementedError

    def update(self, inputs):
        return inputs

    # -- dispatch ---------------------------------------------------------
    @staticmethod
    def _fn_kwargs(fn, available, skip=0):
        """Resolve a hook's keyword args from ``available`` by name,
        falling back to the parameter's declared default."""
        out = {}
        params = list(inspect.signature(fn).parameters.items())[skip:]
        for name, p in params:
            if name in available:
                out[name] = available[name]
            elif p.default is not inspect.Parameter.empty:
                out[name] = p.default
            else:
                raise TypeError(f"cannot resolve argument {name!r} for "
                                f"{fn.__qualname__}")
        return out

    def propagate(self, edge_index=None, size=None, **kwargs):
        if isinstance(edge_index, SparseTensor):
            maa = self.message_and_aggregate
            extra = self._fn_kwargs(maa, kwargs, skip=1)
            out = maa(edge_index, **extra)
            return self.update(out, **self._fn_kwargs(self.update, kwargs,
                                                      skip=1))
        row, col = edge_index[0], edge_index[1]   # j = source, i = target

        gathered = {}
        for name in inspect.signature(self.message).parameters:
            if name.endswith("_j"):
                gathered[name] = kwargs[name[:-2]].index_select(0, row)
            elif name.endswith("_i"):
                gathered[name] = kwargs[name[:-2]].index_select(0, col)
        avail = dict(kwargs)
        avail.update(gathered)
        msg = self.message(**self._fn_kwargs(self.message, avail))

        dim_size = kwargs["x"].shape[0] if size is None else size
        avail_agg = dict(kwargs)
        avail_agg.update(index=col, ptr=None, dim_size=dim_size)
        out = self.aggregate(msg, **self._fn_kwargs(self.aggregate,
                                                    avail_agg, skip=1))
        return self.update(out, **self._fn_kwargs(self.update, kwargs,
                                                  skip=1))


# ---------------------------------------------------------------------------
# graph-level pooling (for net-level module imports)
# ---------------------------------------------------------------------------

def global_add_pool(x, batch, size=None):
    if size is None:
        size = int(batch.max().item()) + 1 if batch.numel() else 0
    return scatter(x, batch, 0, None, size, reduce="sum")


def global_mean_pool(x, batch, size=None):
    if size is None:
        size = int(batch.max().item()) + 1 if batch.numel() else 0
    return scatter(x, batch, 0, None, size, reduce="mean")


def global_max_pool(x, batch, size=None):
    if size is None:
        size = int(batch.max().item()) + 1 if batch.numel() else 0
    return scatter(x, batch, 0, None, size, reduce="max")


# OGB mol AtomEncoder (public contract: per-feature Embedding sum over the
# 9 categorical atom features, xavier-uniform init; dims =
# ogb.utils.features.get_atom_feature_dims()). Not reference-authored, but
# needed importable+runnable for the reference's HIV nets; the net wiring
# under test is the reference's.
ATOM_FEATURE_DIMS = (119, 4, 12, 12, 10, 6, 6, 2, 2)


class AtomEncoder(torch.nn.Module):
    def __init__(self, emb_dim):
        super().__init__()
        self.atom_embedding_list = torch.nn.ModuleList()
        for d in ATOM_FEATURE_DIMS:
            emb = torch.nn.Embedding(d, emb_dim)
            torch.nn.init.xavier_uniform_(emb.weight.data)
            self.atom_embedding_list.append(emb)

    def forward(self, x):
        out = 0
        for i, emb in enumerate(self.atom_embedding_list):
            out = out + emb(x[:, i])
        return out


# ---------------------------------------------------------------------------
# PyG 2.0 conv zoo. The reference pins torch-geometric==2.0 (its
# Dockerfile:54) and instantiates these six convs in its net modules
# (arxiv/norm_models.py:5, code/models.py:5-9, mol/pna_style_models.py:7-8,
# zinc/models.py:8, cifar/models.py:8). Implemented from PyG 2.0's
# documented public semantics (nothing copied); parameter names follow the
# PyG 2.0 state_dict layout so exp/weight_port's import rules apply
# unchanged. These make the reference's GCN/GAT/GATv2/GIN/SAGE/PNA nets
# executable ground truth, not just the reference-authored EGC/MPNN layers.
# ---------------------------------------------------------------------------

def softmax(src, index, num_nodes):
    """torch_geometric.utils.softmax over destination segments (PyG 2.0):
    segment-max-shifted exp, denominator + 1e-16."""
    mx = scatter(src, index, 0, None, num_nodes, reduce="max")
    out = (src - mx.index_select(0, index)).exp()
    den = scatter(out, index, 0, None, num_nodes, reduce="sum")
    return out / (den.index_select(0, index) + 1e-16)


class GCNConv(torch.nn.Module):
    """x' = D^-1/2 (A + I) D^-1/2 X W + b (PyG 2.0 GCNConv defaults)."""

    def __init__(self, in_channels, out_channels, improved=False,
                 cached=False, add_self_loops=True, normalize=True,
                 bias=True):
        super().__init__()
        assert normalize and not cached
        self.improved, self.add_self_loops = improved, add_self_loops
        self.lin = torch.nn.Linear(in_channels, out_channels, bias=False)
        glorot(self.lin.weight)
        self.bias = torch.nn.Parameter(torch.zeros(out_channels)) \
            if bias else None

    def forward(self, x, edge_index):
        n = x.size(0)
        edge_index, w = gcn_norm(edge_index, None, n, self.improved,
                                 self.add_self_loops)
        h = self.lin(x)
        out = scatter(h.index_select(0, edge_index[0]) * w.unsqueeze(-1),
                      edge_index[1], 0, None, n, reduce="sum")
        return out if self.bias is None else out + self.bias


class GATConv(torch.nn.Module):
    """PyG 2.0 GATConv: shared lin_src, per-head additive logits
    a_src·h_j + a_dst·h_i, LeakyReLU(0.2), softmax at the receiver over
    incoming edges + self-loop, dropout on alpha, heads concatenated."""

    def __init__(self, in_channels, out_channels, heads=1, concat=True,
                 negative_slope=0.2, dropout=0.0, add_self_loops=True,
                 bias=True):
        super().__init__()
        self.heads, self.out_channels, self.concat = heads, out_channels, \
            concat
        self.negative_slope, self.dropout = negative_slope, dropout
        self.add_self_loops = add_self_loops
        self.lin_src = torch.nn.Linear(in_channels, heads * out_channels,
                                       bias=False)
        self.att_src = torch.nn.Parameter(
            torch.empty(1, heads, out_channels))
        self.att_dst = torch.nn.Parameter(
            torch.empty(1, heads, out_channels))
        glorot(self.lin_src.weight)
        glorot(self.att_src)
        glorot(self.att_dst)
        odim = heads * out_channels if concat else out_channels
        self.bias = torch.nn.Parameter(torch.zeros(odim)) if bias else None

    def forward(self, x, edge_index):
        n, H, C = x.size(0), self.heads, self.out_channels
        h = self.lin_src(x).view(n, H, C)
        a_src = (h * self.att_src).sum(-1)          # [N, H]
        a_dst = (h * self.att_dst).sum(-1)
        if self.add_self_loops:
            edge_index, _ = add_remaining_self_loops(edge_index,
                                                     num_nodes=n)
        j, i = edge_index[0], edge_index[1]
        alpha = a_src.index_select(0, j) + a_dst.index_select(0, i)
        alpha = torch.nn.functional.leaky_relu(alpha, self.negative_slope)
        alpha = softmax(alpha, i, n)
        alpha = torch.nn.functional.dropout(alpha, p=self.dropout,
                                            training=self.training)
        out = scatter(h.index_select(0, j) * alpha.unsqueeze(-1), i, 0,
                      None, n, reduce="sum")
        out = out.reshape(n, H * C) if self.concat else out.mean(dim=1)
        return out if self.bias is None else out + self.bias


class GATv2Conv(torch.nn.Module):
    """PyG 2.0 GATv2Conv: separate lin_l (sender) / lin_r (receiver) with
    biases, logit a·LeakyReLU(h_l[j] + h_r[i]), value h_l[j]."""

    def __init__(self, in_channels, out_channels, heads=1, concat=True,
                 negative_slope=0.2, dropout=0.0, add_self_loops=True,
                 bias=True, share_weights=False):
        super().__init__()
        self.heads, self.out_channels, self.concat = heads, out_channels, \
            concat
        self.negative_slope, self.dropout = negative_slope, dropout
        self.add_self_loops = add_self_loops
        self.lin_l = torch.nn.Linear(in_channels, heads * out_channels,
                                     bias=bias)
        self.lin_r = self.lin_l if share_weights else torch.nn.Linear(
            in_channels, heads * out_channels, bias=bias)
        self.att = torch.nn.Parameter(torch.empty(1, heads, out_channels))
        glorot(self.lin_l.weight)
        glorot(self.lin_r.weight)
        glorot(self.att)
        odim = heads * out_channels if concat else out_channels
        self.bias = torch.nn.Parameter(torch.zeros(odim)) if bias else None

    def forward(self, x, edge_index):
        n, H, C = x.size(0), self.heads, self.out_channels
        h_l = self.lin_l(x).view(n, H, C)
        h_r = self.lin_r(x).view(n, H, C)
        if self.add_self_loops:
            edge_index, _ = add_remaining_self_loops(edge_index,
                                                     num_nodes=n)
        j, i = edge_index[0], edge_index[1]
        e = torch.nn.functional.leaky_relu(
            h_l.index_select(0, j) + h_r.index_select(0, i),
            self.negative_slope)
        alpha = (e * self.att).sum(-1)              # [E, H]
        alpha = softmax(alpha, i, n)
        alpha = torch.nn.functional.dropout(alpha, p=self.dropout,
                                            training=self.training)
        out = scatter(h_l.index_select(0, j) * alpha.unsqueeze(-1), i, 0,
                      None, n, reduce="sum")
        out = out.reshape(n, H * C) if self.concat else out.mean(dim=1)
        return out if self.bias is None else out + self.bias


class GINConv(torch.nn.Module):
    """x' = nn((1 + eps) x + sum_j x_j) (PyG 2.0; eps stored as a [1]
    parameter when train_eps)."""

    def __init__(self, nn, eps=0.0, train_eps=False):
        super().__init__()
        self.nn = nn
        if train_eps:
            self.eps = torch.nn.Parameter(torch.tensor([float(eps)]))
        else:
            self.register_buffer("eps", torch.tensor([float(eps)]))

    def forward(self, x, edge_index):
        agg = scatter(x.index_select(0, edge_index[0]), edge_index[1], 0,
                      None, x.size(0), reduce="sum")
        return self.nn(agg + (1.0 + self.eps) * x)


class SAGEConv(torch.nn.Module):
    """x' = W_l mean_j(x_j) + W_r x (PyG 2.0 defaults: mean aggregation,
    root weight, bias on the neighbor path only)."""

    def __init__(self, in_channels, out_channels, bias=True):
        super().__init__()
        self.lin_l = torch.nn.Linear(in_channels, out_channels, bias=bias)
        self.lin_r = torch.nn.Linear(in_channels, out_channels, bias=False)

    def forward(self, x, edge_index):
        agg = scatter(x.index_select(0, edge_index[0]), edge_index[1], 0,
                      None, x.size(0), reduce="mean")
        return self.lin_l(agg) + self.lin_r(x)


class PNAConv(torch.nn.Module):
    """PyG 2.0 PNAConv (no edge features): per-tower pre-MLP on
    [x_i || x_j], aggregator concat, degree scalers from the histogram
    statistic avg_deg['log'], per-tower post-MLP on [x_i || agg], final
    Linear. std = sqrt(relu(E[x^2]-E[x]^2) + 1e-5), scaler degree clamped
    to >= 1."""

    def __init__(self, in_channels, out_channels, aggregators, scalers,
                 deg, edge_dim=None, towers=1, pre_layers=1, post_layers=1,
                 divide_input=False):
        super().__init__()
        assert edge_dim is None, "shim PNAConv: no edge features"
        assert in_channels % towers == 0 and out_channels % towers == 0
        self.aggregators, self.scalers = list(aggregators), list(scalers)
        self.towers, self.divide_input = towers, divide_input
        self.F_in = in_channels // towers if divide_input else in_channels
        self.F_out = out_channels // towers

        deg = torch.as_tensor(deg, dtype=torch.float)
        total = deg.sum().clamp(min=1)
        bins = torch.arange(deg.numel(), dtype=torch.float)
        self.avg_deg_log = float(((bins + 1).log() * deg).sum() / total)

        def seq(din, dmid, n_layers):
            mods = [torch.nn.Linear(din, dmid)]
            for _ in range(n_layers - 1):
                mods += [torch.nn.ReLU(), torch.nn.Linear(dmid, dmid)]
            return torch.nn.Sequential(*mods)

        self.pre_nns = torch.nn.ModuleList(
            [seq(2 * self.F_in, self.F_in, pre_layers)
             for _ in range(towers)])
        post_in = (len(self.aggregators) * len(self.scalers) + 1) * self.F_in
        self.post_nns = torch.nn.ModuleList(
            [seq(post_in, self.F_out, post_layers) for _ in range(towers)])
        self.lin = torch.nn.Linear(out_channels, out_channels)

    def forward(self, x, edge_index):
        n, T = x.size(0), self.towers
        if self.divide_input:
            xt = x.view(n, T, self.F_in)
        else:
            xt = x.view(n, 1, self.F_in).repeat(1, T, 1)
        j, i = edge_index[0], edge_index[1]
        h = torch.cat([xt.index_select(0, i), xt.index_select(0, j)],
                      dim=-1)                      # [E, T, 2 F_in]
        msg = torch.stack([nn_(h[:, t]) for t, nn_ in
                           enumerate(self.pre_nns)], dim=1)

        outs = []
        for a in self.aggregators:
            if a in ("sum", "mean", "min", "max"):
                outs.append(scatter(msg, i, 0, None, n, reduce=a))
            elif a in ("var", "std"):
                mean = scatter(msg, i, 0, None, n, reduce="mean")
                msq = scatter(msg * msg, i, 0, None, n, reduce="mean")
                v = msq - mean * mean
                outs.append((v.relu() + 1e-5).sqrt() if a == "std" else v)
            else:
                raise ValueError(f"unknown PNA aggregator {a!r}")
        out = torch.cat(outs, dim=-1)

        deg = scatter(torch.ones(j.numel()), i, 0, None, n,
                      reduce="sum").clamp(min=1).view(n, 1, 1)
        scaled = []
        for s in self.scalers:
            if s == "identity":
                scaled.append(out)
            elif s == "amplification":
                scaled.append(out * ((deg + 1).log() / self.avg_deg_log))
            elif s == "attenuation":
                scaled.append(out * (self.avg_deg_log / (deg + 1).log()))
            else:
                raise ValueError(f"unknown PNA scaler {s!r}")
        out = torch.cat([xt] + [torch.cat(scaled, dim=-1)], dim=-1)
        out = torch.cat([nn_(out[:, t]) for t, nn_ in
                         enumerate(self.post_nns)], dim=1)
        return self.lin(out)


# ---------------------------------------------------------------------------
# module installation + reference loading
# ---------------------------------------------------------------------------

def _mod(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def install():
    """Register the fake torch_geometric / torch_scatter / torch_sparse
    modules in sys.modules (idempotent)."""
    if "torch_scatter" in sys.modules and \
            getattr(sys.modules["torch_scatter"], "_egc_tpu_shim", False):
        return
    ts = _mod("torch_scatter", scatter=scatter)
    ts._egc_tpu_shim = True
    tsp = _mod("torch_sparse", SparseTensor=SparseTensor, matmul=matmul)
    tsp.diag = _mod("torch_sparse.diag", fill_diag=fill_diag)

    tg = _mod("torch_geometric")
    tg.nn = _mod("torch_geometric.nn", MessagePassing=MessagePassing,
                 global_add_pool=global_add_pool,
                 global_mean_pool=global_mean_pool,
                 global_max_pool=global_max_pool,
                 GCNConv=GCNConv, GATConv=GATConv, GATv2Conv=GATv2Conv,
                 GINConv=GINConv, PNAConv=PNAConv, SAGEConv=SAGEConv)
    tg.nn.conv = _mod("torch_geometric.nn.conv",
                      MessagePassing=MessagePassing)
    tg.nn.conv.gcn_conv = _mod("torch_geometric.nn.conv.gcn_conv",
                               gcn_norm=gcn_norm)
    tg.nn.inits = _mod("torch_geometric.nn.inits", glorot=glorot,
                       zeros=zeros)
    tg.typing = _mod("torch_geometric.typing", Adj=object, OptTensor=object)
    tg.utils = _mod("torch_geometric.utils",
                    add_remaining_self_loops=add_remaining_self_loops)
    # import-only stubs for data-pipeline modules the reference's code2
    # utils import at top level (the functions under test never touch them)
    tg.transforms = _mod("torch_geometric.transforms")
    tg.data = _mod("torch_geometric.data", DataLoader=object, Data=object)
    ogb = _mod("ogb")
    ogb.graphproppred = _mod("ogb.graphproppred",
                             PygGraphPropPredDataset=object,
                             Evaluator=object)
    ogb.graphproppred.mol_encoder = _mod("ogb.graphproppred.mol_encoder",
                                         AtomEncoder=AtomEncoder)


def load_reference(relpath, name=None):
    """Exec a reference source file under the shim and return the module."""
    install()
    path = f"{REFERENCE_ROOT}/{relpath}"
    name = name or "ref_" + relpath.replace("/", "_").removesuffix(".py")
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def import_reference_module(dotted):
    """Import ``experiments.*`` as a namespace package rooted at the
    reference tree (net modules use package-absolute imports like
    ``from experiments.layers import ...``)."""
    install()
    if REFERENCE_ROOT not in sys.path:
        # APPEND: the reference tree also has a top-level main.py —
        # prepending would shadow this repo's main for later tests
        sys.path.append(REFERENCE_ROOT)
    return importlib.import_module(dotted)


class FakeBatch:
    """Stand-in for a PyG Batch: just the attributes the nets read."""

    def __init__(self, x, edge_index, batch, pos=None):
        self.x = x
        self.edge_index = edge_index
        self.batch = batch
        self.pos = pos
