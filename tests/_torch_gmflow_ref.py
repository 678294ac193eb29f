"""Torch reference GMFlow matching the OFFICIAL checkpoint layout
(haofeixu/gmflow): backbone.conv1/layer1-3/conv2 with affine-free
InstanceNorm, transformer.layers.N.{self_attn,cross_attn_ffn},
feature_flow_attn, upsampler. Used by tests to validate
tools/convert_gmflow.py offline."""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class ResidualBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride=stride, padding=1,
                               bias=False)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1, bias=False)
        self.norm1 = nn.InstanceNorm2d(cout)
        self.norm2 = nn.InstanceNorm2d(cout)
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride=stride, bias=False),
                nn.InstanceNorm2d(cout))
        else:
            self.downsample = None

    def forward(self, x):
        y = F.relu(self.norm1(self.conv1(x)))
        y = F.relu(self.norm2(self.conv2(y)))
        sc = x if self.downsample is None else self.downsample(x)
        return F.relu(sc + y)


class CNNEncoder(nn.Module):
    def __init__(self, dim=128):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.norm1 = nn.InstanceNorm2d(64)
        self.layer1 = nn.Sequential(ResidualBlock(64, 64),
                                    ResidualBlock(64, 64))
        self.layer2 = nn.Sequential(ResidualBlock(64, 96, 2),
                                    ResidualBlock(96, 96))
        self.layer3 = nn.Sequential(ResidualBlock(96, 128, 2),
                                    ResidualBlock(128, 128))
        self.conv2 = nn.Conv2d(128, dim, 1)

    def forward(self, x):
        y = F.relu(self.norm1(self.conv1(x)))
        y = self.layer3(self.layer2(self.layer1(y)))
        return self.conv2(y)


class TransformerLayer(nn.Module):
    def __init__(self, dim=128, ffn=True, expansion=4):
        super().__init__()
        self.q_proj = nn.Linear(dim, dim)
        self.k_proj = nn.Linear(dim, dim)
        self.v_proj = nn.Linear(dim, dim)
        self.merge = nn.Linear(dim, dim)
        self.norm1 = nn.LayerNorm(dim)
        self.ffn = ffn
        if ffn:
            cin = dim * 2
            self.mlp = nn.Sequential(
                nn.Linear(cin, cin * expansion, bias=False),
                nn.GELU(),
                nn.Linear(cin * expansion, dim, bias=False))
            self.norm2 = nn.LayerNorm(dim)

    def forward(self, source, target):
        D = source.shape[-1]
        q, k, v = self.q_proj(source), self.k_proj(target), self.v_proj(target)
        att = torch.einsum("bnd,bmd->bnm", q, k) / math.sqrt(D)
        msg = att.softmax(dim=-1) @ v
        msg = self.norm1(self.merge(msg))
        if self.ffn:
            msg = self.norm2(self.mlp(torch.cat([source, msg], dim=-1)))
        return source + msg


class TransformerBlock(nn.Module):
    def __init__(self, dim=128):
        super().__init__()
        self.self_attn = TransformerLayer(dim, ffn=False)
        self.cross_attn_ffn = TransformerLayer(dim, ffn=True)


class Transformer(nn.Module):
    def __init__(self, dim=128, num_layers=6):
        super().__init__()
        self.layers = nn.ModuleList(
            [TransformerBlock(dim) for _ in range(num_layers)])


class FlowAttn(nn.Module):
    def __init__(self, dim=128):
        super().__init__()
        self.q_proj = nn.Linear(dim, dim)
        self.k_proj = nn.Linear(dim, dim)


class GMFlowRef(nn.Module):
    def __init__(self, dim=128, num_layers=6, uf=8, seed=0):
        super().__init__()
        torch.manual_seed(seed)
        self.backbone = CNNEncoder(dim)
        self.transformer = Transformer(dim, num_layers)
        self.feature_flow_attn = FlowAttn(dim)
        self.upsampler = nn.Sequential(
            nn.Conv2d(2 + dim, 256, 3, padding=1),
            nn.ReLU(),
            nn.Conv2d(256, uf * uf * 9, 1))
