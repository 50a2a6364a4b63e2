"""Pure-torch (CPU) oracle of the reference model.

Re-states the numerical contract of the reference SoftPoolingGcnEncoder
(reference model/network.py:127-291) with the pinned PyG-1.2.1 layer semantics
(DenseSAGEConv / DenseGINConv as released; the reference pins torch-geometric
1.2.1 at requirements.txt:40), so the JAX model can be checked activation-by-
activation with transplanted weights. torch-geometric itself is not installed
in this image — these ~100 lines *are* the pinned semantics, written from the
release sources, runnable on CPU torch.

Validation status: tests/vendor/PYG_AUDIT.md is the line-by-line audit of
this file — which semantics are pinned by reference call-site text, which are
algebraically cross-checked in-repo, and which rest on the release text alone
(vendoring the release is impossible here: zero egress, attempt recorded in
the audit §1).

This file is test infrastructure, not part of the framework.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F

EPS = 1e-15


def uniform(size, tensor):
    bound = 1.0 / math.sqrt(size)
    if tensor is not None:
        tensor.data.uniform_(-bound, bound)


class DenseSAGEConvRef(nn.Module):
    """PyG 1.2.1 DenseSAGEConv (torch_geometric/nn/dense/dense_sage_conv.py)."""

    def __init__(self, in_channels, out_channels, normalize=True, bias=True):
        super().__init__()
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.normalize = normalize
        self.weight = nn.Parameter(torch.Tensor(in_channels, out_channels))
        self.bias = nn.Parameter(torch.Tensor(out_channels)) if bias else None
        self.reset_parameters()

    def reset_parameters(self):
        uniform(self.in_channels, self.weight)
        uniform(self.in_channels, self.bias)

    def forward(self, x, adj, mask=None, add_loop=True):
        x = x.unsqueeze(0) if x.dim() == 2 else x
        adj = adj.unsqueeze(0) if adj.dim() == 2 else adj
        B, N, _ = adj.size()
        if add_loop:
            adj = adj.clone()
            idx = torch.arange(N, dtype=torch.long)
            adj[:, idx, idx] = 1
        out = torch.matmul(adj, x)
        out = out / adj.sum(dim=-1, keepdim=True).clamp(min=1)
        out = torch.matmul(out, self.weight)
        if self.bias is not None:
            out = out + self.bias
        if self.normalize:
            out = F.normalize(out, p=2, dim=-1)
        if mask is not None:
            out = out * mask.view(B, N, 1).to(x.dtype)
        return out


class DenseGINConvRef(nn.Module):
    """PyG DenseGINConv as used by the reference (model/network.py:96-99)."""

    def __init__(self, mlp, eps=0.0, train_eps=False):
        super().__init__()
        self.nn = mlp
        self.initial_eps = eps
        if train_eps:
            self.eps = nn.Parameter(torch.Tensor([eps]))
        else:
            self.register_buffer("eps", torch.Tensor([eps]))

    def forward(self, x, adj, mask=None, add_loop=True):
        x = x.unsqueeze(0) if x.dim() == 2 else x
        adj = adj.unsqueeze(0) if adj.dim() == 2 else adj
        B, N, _ = adj.size()
        out = torch.matmul(adj, x)
        if add_loop:
            out = (1 + self.eps) * x + out
        out = self.nn(out)
        if mask is not None:
            out = out * mask.view(B, N, 1).to(x.dtype)
        return out


class DenseJKRef(nn.Module):
    """Reference DenseJK (model/network.py:11-55), mode='lstm'."""

    def __init__(self, channels, num_layers):
        super().__init__()
        self.channel = channels
        self.lstm = nn.LSTM(
            channels, channels * num_layers // 2, bidirectional=True, batch_first=True
        )
        self.att = nn.Linear(2 * channels * num_layers // 2, 1)

    def forward(self, xs):
        xs = torch.split(xs, self.channel, -1)
        xs = torch.stack(xs, 2)
        shape = xs.shape
        x = xs.reshape((-1, shape[2], shape[3]))
        alpha, _ = self.lstm(x)
        alpha = self.att(alpha).squeeze(-1)
        alpha = torch.softmax(alpha, dim=-1)
        x = (x * alpha.unsqueeze(-1)).sum(dim=1)
        return x.reshape((shape[0], shape[1], shape[3]))


class GNNModuleRef(nn.Module):
    """Reference GNN_Module (model/network.py:57-125)."""

    def __init__(self, input_dim, hidden_dim, embedding_dim, bias, bn,
                 add_loop, lin=True, gcn_name="SAGE", activation="relu"):
        super().__init__()
        self.add_loop = add_loop
        self.gcn1 = self._gcn(gcn_name, input_dim, hidden_dim, bias, activation)
        self.gcn2 = self._gcn(gcn_name, hidden_dim, hidden_dim, bias, activation)
        self.gcn3 = self._gcn(gcn_name, hidden_dim, embedding_dim, bias, activation)
        self.active = self._activation(activation)
        if bn:
            self.bn1 = nn.BatchNorm1d(hidden_dim)
            self.bn2 = nn.BatchNorm1d(hidden_dim)
            self.bn3 = nn.BatchNorm1d(embedding_dim)
        self.use_bn = bn
        if lin:
            self.lin = nn.Linear(2 * hidden_dim + embedding_dim, embedding_dim)
        else:
            self.lin = None

    @staticmethod
    def _activation(name="relu"):
        return {"relu": nn.ReLU(), "elu": nn.ELU(), "leakyrelu": nn.LeakyReLU()}[name]

    def _gcn(self, name, input_dim, hidden_dim, bias, activation="relu"):
        if name == "SAGE":
            return DenseSAGEConvRef(input_dim, hidden_dim, normalize=True, bias=bias)
        mlp = nn.Sequential(
            nn.Linear(input_dim, hidden_dim),
            self._activation(activation),
            nn.Linear(hidden_dim, hidden_dim),
        )
        return DenseGINConvRef(mlp)

    def bn(self, i, x):
        if not self.use_bn:
            return x
        b, n, c = x.size()
        x = x.view(-1, c)
        x = getattr(self, f"bn{i}")(x)
        return x.view(b, n, c)

    def forward(self, x, adj, mask=None):
        x1 = self.bn(1, self.active(self.gcn1(x, adj, mask, self.add_loop)))
        x2 = self.bn(2, self.active(self.gcn2(x1, adj, mask, self.add_loop)))
        x3 = self.bn(3, self.active(self.gcn3(x2, adj, mask, self.add_loop)))
        x = torch.cat([x1, x2, x3], dim=-1)
        if mask is not None:
            x = x * mask
        if self.lin is not None:
            x = self.lin(x)
            if mask is not None:
                x = x * mask
        return x


class SoftPoolingGcnEncoderRef(nn.Module):
    """Reference SoftPoolingGcnEncoder (model/network.py:127-291), forward on
    a dense (x, adj, batch_num_nodes) tuple, CPU."""

    def __init__(self, max_num_nodes, input_dim, hidden_dim, embedding_dim, bias,
                 bn, assign_hidden_dim, label_dim, assign_ratio=0.25,
                 pred_hidden_dims=(50,), concat=True, gcn_name="SAGE",
                 norm_adj=False, activation="relu", drop_out=0.0, jk=False):
        super().__init__()
        self.jk = jk
        self.drop_out = drop_out
        self.norm_adj = norm_adj
        assign_dim = int(max_num_nodes * assign_ratio)
        self.GCN_embed_1 = GNNModuleRef(input_dim, hidden_dim, embedding_dim, bias,
                                        bn, add_loop=False, lin=False,
                                        gcn_name=gcn_name, activation=activation)
        if jk:
            self.jk1 = DenseJKRef(hidden_dim, 3)
        self.GCN_pool_1 = GNNModuleRef(input_dim, assign_hidden_dim, assign_dim,
                                       bias, bn, add_loop=False,
                                       gcn_name=gcn_name, activation=activation)
        if concat and not jk:
            input_dim = hidden_dim * 2 + embedding_dim
        else:
            input_dim = embedding_dim
        assign_dim = int(assign_dim * assign_ratio)
        self.GCN_embed_2 = GNNModuleRef(input_dim, hidden_dim, embedding_dim, bias,
                                        bn, add_loop=False, lin=False,
                                        gcn_name=gcn_name, activation=activation)
        if jk:
            self.jk2 = DenseJKRef(hidden_dim, 3)
        self.GCN_pool_2 = GNNModuleRef(input_dim, assign_hidden_dim, assign_dim,
                                       bias, bn, add_loop=False,
                                       gcn_name=gcn_name, activation=activation)
        self.GCN_embed_3 = GNNModuleRef(input_dim, hidden_dim, embedding_dim, bias,
                                        bn, add_loop=False, lin=False,
                                        gcn_name=gcn_name, activation=activation)
        if jk:
            self.jk3 = DenseJKRef(hidden_dim, 3)
        pred_input = input_dim * 3
        layers = []
        act = GNNModuleRef._activation(activation)
        d = pred_input
        for hd in pred_hidden_dims:
            layers.append(nn.Linear(d, hd))
            layers.append(act)
            d = hd
            if drop_out > 0:
                layers.append(nn.Dropout(drop_out))
        layers.append(nn.Linear(d, label_dim))
        self.pred_model = nn.Sequential(*layers)

    @staticmethod
    def construct_mask(max_nodes, batch_num_nodes):
        batch_size = len(batch_num_nodes)
        out_tensor = torch.zeros(batch_size, max_nodes)
        for i, n in enumerate(batch_num_nodes):
            out_tensor[i, : int(n)] = 1
        return out_tensor.unsqueeze(2)

    def _re_norm_adj(self, adj, p, mask=None):
        idx = torch.arange(0, adj.shape[1])
        adj = adj.clone()
        adj[:, idx, idx] = 0
        new_adj = torch.div(adj, adj.sum(-1)[..., None] + EPS) * (1 - p)
        new_adj[:, idx, idx] = p
        if mask is not None:
            new_adj = new_adj * mask
        return new_adj

    def _diff_pool(self, x, adj, s, mask):
        s = torch.softmax(s, dim=-1)
        if mask is not None:
            s = s * mask
        out = torch.matmul(s.transpose(1, 2), x)
        out_adj = torch.matmul(torch.matmul(s.transpose(1, 2), adj), s)
        return out, out_adj

    def forward(self, x, adj, batch_num_nodes, collect=None):
        out_all = []
        max_num_nodes = adj.size()[1]
        mask = self.construct_mask(max_num_nodes, batch_num_nodes)
        if self.norm_adj:
            adj = self._re_norm_adj(adj, 0.4, mask)
        embed = self.GCN_embed_1(x, adj, mask)
        if self.jk:
            embed = self.jk1(embed)
        if collect is not None:
            collect["embed1"] = embed.detach().clone()
        out_all.append(torch.max(embed, dim=1)[0])
        assign = self.GCN_pool_1(x, adj, mask)
        x, adj = self._diff_pool(embed, adj, assign, mask)
        if self.norm_adj:
            adj = self._re_norm_adj(adj, 0.4)
        embed = self.GCN_embed_2(x, adj, None)
        if self.jk:
            embed = self.jk2(embed)
        if collect is not None:
            collect["embed2"] = embed.detach().clone()
        out_all.append(torch.max(embed, dim=1)[0])
        assign = self.GCN_pool_2(x, adj, None)
        x, adj = self._diff_pool(embed, adj, assign, None)
        if self.norm_adj:
            adj = self._re_norm_adj(adj, 0.4)
        embed = self.GCN_embed_3(x, adj, None)
        if self.jk:
            embed = self.jk3(embed)
        if collect is not None:
            collect["embed3"] = embed.detach().clone()
        out_all.append(torch.max(embed, dim=1)[0])
        output = torch.cat(out_all, 1)
        return self.pred_model(output)
