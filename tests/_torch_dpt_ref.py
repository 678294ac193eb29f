"""Torch reference DPT-hybrid matching the OFFICIAL checkpoint layout.

Used only by tests: builds a DPTDepthModel-shaped module tree whose
state_dict() keys are exactly those of the Omnidata/DPT checkpoints
(pretrained.model.patch_embed.backbone.*, pretrained.model.blocks.*,
pretrained.act_postprocess3/4.*, scratch.layer*_rn, scratch.refinenet*,
scratch.output_conv.*), so tools/convert_omnidata.py can be validated
offline end-to-end: random-init this model -> state_dict -> converter ->
JAX model -> forward equality.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def _pad_same(x, k, s):
    ih, iw = x.shape[-2:]
    ph = max((math.ceil(ih / s) - 1) * s + k - ih, 0)
    pw = max((math.ceil(iw / s) - 1) * s + k - iw, 0)
    return F.pad(x, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2))


class StdConv2dSame(nn.Conv2d):
    """timm StdConv2dSame: weight standardization + TF-SAME padding."""

    def __init__(self, ci, co, k, stride=1, bias=False):
        super().__init__(ci, co, k, stride=stride, padding=0, bias=bias)

    def forward(self, x):
        w = self.weight
        mu = w.mean(dim=(1, 2, 3), keepdim=True)
        var = w.var(dim=(1, 2, 3), unbiased=False, keepdim=True)
        w = (w - mu) / torch.sqrt(var + 1e-6)
        x = _pad_same(x, self.kernel_size[0], self.stride[0])
        return F.conv2d(x, w, self.bias, self.stride)


class MaxPool2dSame(nn.Module):
    def forward(self, x):
        x = _pad_same(x, 3, 2)
        return F.max_pool2d(x, 3, 2)


class Stem(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv = StdConv2dSame(3, 64, 7, stride=2)
        self.norm = nn.GroupNorm(32, 64)


class Downsample(nn.Module):
    def __init__(self, ci, co, stride):
        super().__init__()
        self.conv = StdConv2dSame(ci, co, 1, stride=stride)
        self.norm = nn.GroupNorm(32, co)

    def forward(self, x):
        return self.norm(self.conv(x))


class Bottleneck(nn.Module):
    def __init__(self, ci, cmid, co, stride=1):
        super().__init__()
        self.conv1 = StdConv2dSame(ci, cmid, 1)
        self.norm1 = nn.GroupNorm(32, cmid)
        self.conv2 = StdConv2dSame(cmid, cmid, 3, stride=stride)
        self.norm2 = nn.GroupNorm(32, cmid)
        self.conv3 = StdConv2dSame(cmid, co, 1)
        self.norm3 = nn.GroupNorm(32, co)
        if stride != 1 or ci != co:
            self.downsample = Downsample(ci, co, stride)
        else:
            self.downsample = None

    def forward(self, x):
        sc = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.norm1(self.conv1(x)))
        y = F.relu(self.norm2(self.conv2(y)))
        y = self.norm3(self.conv3(y))
        return F.relu(y + sc)


class Stage(nn.Module):
    def __init__(self, blocks):
        super().__init__()
        self.blocks = nn.ModuleList(blocks)

    def forward(self, x):
        for b in self.blocks:
            x = b(x)
        return x


class Backbone(nn.Module):
    def __init__(self):
        super().__init__()
        self.stem = Stem()
        self.pool = MaxPool2dSame()
        widths = ((64, 256), (128, 512), (256, 1024))
        layers = (3, 4, 9)
        stages = []
        cin = 64
        for si, (n, (cmid, co)) in enumerate(zip(layers, widths)):
            blocks = []
            for bi in range(n):
                stride = 2 if (bi == 0 and si > 0) else 1
                blocks.append(Bottleneck(cin, cmid, co, stride))
                cin = co
            stages.append(Stage(blocks))
        self.stages = nn.ModuleList(stages)

    def forward(self, x):
        y = self.pool(F.relu(self.stem.norm(self.stem.conv(x))))
        outs = []
        for st in self.stages:
            y = st(y)
            outs.append(y)
        return outs


class PatchEmbed(nn.Module):
    def __init__(self, dim=768):
        super().__init__()
        self.backbone = Backbone()
        self.proj = nn.Conv2d(1024, dim, 1)


class Attention(nn.Module):
    def __init__(self, dim=768, heads=12):
        super().__init__()
        self.heads = heads
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        B, N, D = x.shape
        h = self.heads
        qkv = self.qkv(x).reshape(B, N, 3, h, D // h)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        att = torch.einsum("bnhd,bmhd->bhnm", q, k) / math.sqrt(D // h)
        att = att.softmax(dim=-1)
        y = torch.einsum("bhnm,bmhd->bnhd", att, v).reshape(B, N, D)
        return self.proj(y)


class Mlp(nn.Module):
    def __init__(self, dim=768, hidden=3072):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class Block(nn.Module):
    def __init__(self, dim=768):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = Attention(dim)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = Mlp(dim)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class VitModel(nn.Module):
    def __init__(self, dim=768, depth=12, grid=24):
        super().__init__()
        self.patch_embed = PatchEmbed(dim)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = nn.Parameter(torch.zeros(1, grid * grid + 1, dim))
        self.blocks = nn.ModuleList([Block(dim) for _ in range(depth)])


class ProjectReadout(nn.Module):
    def __init__(self, dim=768):
        super().__init__()
        self.project = nn.Sequential(nn.Linear(2 * dim, dim), nn.GELU())

    def forward(self, x):
        cls = x[:, :1].expand_as(x[:, 1:])
        return self.project(torch.cat([x[:, 1:], cls], dim=-1))


class Transpose(nn.Module):
    def forward(self, x):
        return x.transpose(1, 2)


class Unflatten(nn.Module):
    def __init__(self, hw):
        super().__init__()
        self.hw = hw

    def forward(self, x):
        return x.reshape(x.shape[0], x.shape[1], self.hw, self.hw)


class Pretrained(nn.Module):
    def __init__(self, dim=768, grid=24):
        super().__init__()
        self.model = VitModel(dim, grid=grid)
        self.act_postprocess3 = nn.Sequential(
            ProjectReadout(dim), Transpose(), Unflatten(grid),
            nn.Conv2d(dim, dim, 1))
        self.act_postprocess4 = nn.Sequential(
            ProjectReadout(dim), Transpose(), Unflatten(grid),
            nn.Conv2d(dim, dim, 1),
            nn.Conv2d(dim, dim, 3, stride=2, padding=1))


class ResidualConvUnit(nn.Module):
    def __init__(self, features):
        super().__init__()
        self.conv1 = nn.Conv2d(features, features, 3, padding=1)
        self.conv2 = nn.Conv2d(features, features, 3, padding=1)

    def forward(self, x):
        y = self.conv1(F.relu(x))
        y = self.conv2(F.relu(y))
        return x + y


class FeatureFusionBlock(nn.Module):
    def __init__(self, features):
        super().__init__()
        self.resConfUnit1 = ResidualConvUnit(features)
        self.resConfUnit2 = ResidualConvUnit(features)
        self.out_conv = nn.Conv2d(features, features, 1)

    def forward(self, x, skip=None):
        if skip is not None:
            x = x + self.resConfUnit1(skip)
        x = self.resConfUnit2(x)
        x = F.interpolate(x, scale_factor=2, mode="bilinear",
                          align_corners=True)
        return self.out_conv(x)


class Interpolate(nn.Module):
    def forward(self, x):
        return F.interpolate(x, scale_factor=2, mode="bilinear",
                             align_corners=True)


class Scratch(nn.Module):
    def __init__(self, features=256, dim=768, out_channels=1):
        super().__init__()
        self.layer1_rn = nn.Conv2d(256, features, 3, padding=1, bias=False)
        self.layer2_rn = nn.Conv2d(512, features, 3, padding=1, bias=False)
        self.layer3_rn = nn.Conv2d(dim, features, 3, padding=1, bias=False)
        self.layer4_rn = nn.Conv2d(dim, features, 3, padding=1, bias=False)
        self.refinenet1 = FeatureFusionBlock(features)
        self.refinenet2 = FeatureFusionBlock(features)
        self.refinenet3 = FeatureFusionBlock(features)
        self.refinenet4 = FeatureFusionBlock(features)
        self.output_conv = nn.Sequential(
            nn.Conv2d(features, features // 2, 3, padding=1),
            Interpolate(),
            nn.Conv2d(features // 2, 32, 3, padding=1),
            nn.ReLU(),
            nn.Conv2d(32, out_channels, 1),
        )


class DPTRef(nn.Module):
    """Full DPT-hybrid with official key names and forward semantics."""

    def __init__(self, out_channels=1, grid=24, seed=0):
        super().__init__()
        torch.manual_seed(seed)
        self.pretrained = Pretrained(grid=grid)
        self.scratch = Scratch(out_channels=out_channels)
        self.out_channels = out_channels
        # break the default-zero symmetry of cls/pos for a meaningful test
        nn.init.normal_(self.pretrained.model.cls_token, std=0.02)
        nn.init.normal_(self.pretrained.model.pos_embed, std=0.02)

    def forward(self, x):
        """x [B,3,H,W], normalized to [-1,1] by the caller."""
        pm = self.pretrained.model
        s0, s1, s2 = pm.patch_embed.backbone(x)
        tok = pm.patch_embed.proj(s2)
        B, D, th, tw = tok.shape
        tok = tok.flatten(2).transpose(1, 2)
        cls = pm.cls_token.expand(B, -1, -1)
        tok = torch.cat([cls, tok], dim=1) + pm.pos_embed
        taps = []
        for i, blk in enumerate(pm.blocks):
            tok = blk(tok)
            if i in (8, 11):
                taps.append(tok)

        l3 = self.pretrained.act_postprocess3(taps[0])
        l4 = self.pretrained.act_postprocess4(taps[1])

        r1 = self.scratch.layer1_rn(s0)
        r2 = self.scratch.layer2_rn(s1)
        r3 = self.scratch.layer3_rn(l3)
        r4 = self.scratch.layer4_rn(l4)

        y = self.scratch.refinenet4(r4)
        y = self.scratch.refinenet3(y, r3)
        y = self.scratch.refinenet2(y, r2)
        y = self.scratch.refinenet1(y, r1)
        y = self.scratch.output_conv(y)
        if self.out_channels == 1:
            return F.relu(y)
        return y.clamp(0.0, 1.0)
