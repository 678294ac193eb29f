"""DPT-hybrid (ViT-B + ResNetV2-50) monocular depth/normal nets in JAX.

The Omnidata models the reference shells out to
(preprocess/extract_monocular_cues.py: vitb_rn50_384 at 384x384) are
DPT-hybrid networks (Ranftl et al., "Vision Transformers for Dense
Prediction"): a ResNetV2 backbone (weight-standardized convs + GroupNorm,
stages of 3/4/9 bottlenecks at /4, /8, /16) whose stage-0/1 activations feed
two skip paths and whose /16 feature map is patch-embedded into a 12-layer
ViT-B with taps at blocks {8, 11}; tapped tokens go through a
"project"-readout (cls token concatenated to every token, then Linear+GELU),
RefineNet-style fusion across 4 scales, and a task head (1-channel ReLU
depth / 3-channel normals).

This is a from-scratch JAX implementation whose parameter tree mirrors the
official torch checkpoint layout one-to-one (see tools/convert_omnidata.py
for the key map). The official weights cannot be fetched in this offline
environment; the converter + this model are validated by a round-trip test
(tests/test_priors_models.py) that builds a torch-format state dict of the
official layout, converts it, and asserts forward equality against a torch
reference implementation of the same blocks.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# basic layers (params are plain dicts: conv {w [kh,kw,ci,co], b}, ln {g,b})
# ---------------------------------------------------------------------------

def conv2d(p, x, stride=1, padding="SAME"):
    y = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "b" in p:
        y = y + p["b"]
    return y


def std_conv2d(p, x, stride=1, padding="SAME", eps=1e-6):
    """Weight-standardized conv (timm StdConv2dSame): w normalized to zero
    mean / unit variance per output filter before the convolution."""
    w = p["w"]
    mu = w.mean(axis=(0, 1, 2), keepdims=True)
    var = w.var(axis=(0, 1, 2), keepdims=True)
    w = (w - mu) * jax.lax.rsqrt(var + eps)
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "b" in p:
        y = y + p["b"]
    return y


def group_norm(p, x, groups=32, eps=1e-5):
    B, H, W, C = x.shape
    xg = x.reshape(B, H, W, groups, C // groups)
    mu = xg.mean(axis=(1, 2, 4), keepdims=True)
    var = ((xg - mu) ** 2).mean(axis=(1, 2, 4), keepdims=True)
    xg = (xg - mu) * jax.lax.rsqrt(var + eps)
    return xg.reshape(B, H, W, C) * p["g"] + p["b"]


def layer_norm(p, x, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]


def dense(p, x):
    return x @ p["w"] + p["b"]


def _init_conv(rng, kh, kw, ci, co, bias=True):
    std = np.sqrt(2.0 / (kh * kw * ci))
    p = {"w": jnp.asarray(rng.normal(0, std, (kh, kw, ci, co)).astype(np.float32))}
    if bias:
        p["b"] = jnp.zeros((co,), jnp.float32)
    return p


def _init_dense(rng, ci, co):
    std = np.sqrt(2.0 / ci)
    return {"w": jnp.asarray(rng.normal(0, std, (ci, co)).astype(np.float32)),
            "b": jnp.zeros((co,), jnp.float32)}


def _init_gn(c):
    return {"g": jnp.ones((c,)), "b": jnp.zeros((c,))}


_init_ln = _init_gn


# ---------------------------------------------------------------------------
# ResNetV2 backbone: stem + stages (3, 4, 9) at /4, /8, /16
# (timm resnetv2 Bottleneck, non-preact: conv->GN+ReLU x2, conv->GN,
#  downsample conv+GN on the input, ReLU after the residual add)
# ---------------------------------------------------------------------------

def init_bottleneck(rng, cin, cmid, cout, stride=1):
    p = {
        "conv1": _init_conv(rng, 1, 1, cin, cmid, bias=False),
        "norm1": _init_gn(cmid),
        "conv2": _init_conv(rng, 3, 3, cmid, cmid, bias=False),
        "norm2": _init_gn(cmid),
        "conv3": _init_conv(rng, 1, 1, cmid, cout, bias=False),
        "norm3": _init_gn(cout),
    }
    if stride != 1 or cin != cout:
        p["down"] = _init_conv(rng, 1, 1, cin, cout, bias=False)
        p["down_norm"] = _init_gn(cout)
    return p


def bottleneck(p, x, s: int = 1):
    y = jax.nn.relu(group_norm(p["norm1"], std_conv2d(p["conv1"], x)))
    y = jax.nn.relu(group_norm(p["norm2"], std_conv2d(p["conv2"], y, stride=s)))
    y = group_norm(p["norm3"], std_conv2d(p["conv3"], y))
    if "down" in p:
        x = group_norm(p["down_norm"], std_conv2d(p["down"], x, stride=s))
    return jax.nn.relu(x + y)


RESNET_LAYERS = (3, 4, 9)          # vit_base_r50_s16_384 backbone
RESNET_WIDTHS = ((64, 256), (128, 512), (256, 1024))


def init_resnet_stages(rng):
    p: Dict[str, Any] = {
        "stem": _init_conv(rng, 7, 7, 3, 64, bias=False),
        "stem_norm": _init_gn(64),
    }
    cin = 64
    for si, (n_blocks, (cmid, cout)) in enumerate(zip(RESNET_LAYERS,
                                                      RESNET_WIDTHS)):
        blocks = []
        for bi in range(n_blocks):
            stride = 2 if (bi == 0 and si > 0) else 1
            blocks.append(init_bottleneck(rng, cin, cmid, cout, stride))
            cin = cout
        p[f"stage{si}"] = blocks
    return p


def resnet_stages(p, x):
    """Returns (s0 [/4, 256], s1 [/8, 512], s2 [/16, 1024])."""
    y = std_conv2d(p["stem"], x, stride=2)
    y = jax.nn.relu(group_norm(p["stem_norm"], y))
    y = jax.lax.reduce_window(y, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                              (1, 2, 2, 1), "SAME")
    outs = []
    for si in range(3):
        for bi, blk in enumerate(p[f"stage{si}"]):
            y = bottleneck(blk, y, 2 if (bi == 0 and si > 0) else 1)
        outs.append(y)
    return tuple(outs)


# ---------------------------------------------------------------------------
# ViT-B encoder
# ---------------------------------------------------------------------------

def init_vit_block(rng, dim=768, mlp=3072):
    return {
        "ln1": _init_ln(dim), "ln2": _init_ln(dim),
        "qkv": _init_dense(rng, dim, dim * 3),
        "proj": _init_dense(rng, dim, dim),
        "fc1": _init_dense(rng, dim, mlp),
        "fc2": _init_dense(rng, mlp, dim),
    }


def vit_block(p, x, h: int = 12):
    B, N, D = x.shape
    y = layer_norm(p["ln1"], x)
    qkv = dense(p["qkv"], y).reshape(B, N, 3, h, D // h)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    att = jnp.einsum("bnhd,bmhd->bhnm", q, k) / np.sqrt(D // h)
    att = jax.nn.softmax(att, axis=-1)
    y = jnp.einsum("bhnm,bmhd->bnhd", att, v).reshape(B, N, D)
    x = x + dense(p["proj"], y)
    y = layer_norm(p["ln2"], x)
    y = dense(p["fc2"], jax.nn.gelu(dense(p["fc1"], y), approximate=False))
    return x + y


# ---------------------------------------------------------------------------
# DPT-hybrid model
# ---------------------------------------------------------------------------

VIT_TAPS = (8, 11)   # token taps; scale taps 0/1 come from the resnet stages


def init_dpt(rng_seed: int = 0, out_channels: int = 1,
             features: int = 256, dim: int = 768, depth: int = 12):
    rng = np.random.default_rng(rng_seed)
    p: Dict[str, Any] = {"resnet": init_resnet_stages(rng)}
    p["patch_embed"] = _init_conv(rng, 1, 1, 1024, dim)    # /16 map -> tokens
    p["pos_embed"] = jnp.zeros((1, 24 * 24 + 1, dim))
    p["cls_token"] = jnp.zeros((1, 1, dim))
    p["blocks"] = [init_vit_block(rng, dim) for _ in range(depth)]
    # "project" readout per tap: Linear(2*dim -> dim) + GELU
    p["readout"] = [_init_dense(rng, 2 * dim, dim) for _ in range(2)]
    # act_postprocess3: 1x1 conv dim->dim; act_postprocess4: 1x1 conv then
    # 3x3 stride-2 conv (downsample /16 -> /32)
    p["act_post"] = {
        "proj3": _init_conv(rng, 1, 1, dim, dim),
        "proj4": _init_conv(rng, 1, 1, dim, dim),
        "down4": _init_conv(rng, 3, 3, dim, dim),
    }
    # scratch.layerN_rn: 3x3 no-bias projections to the fusion width
    p["layer_rn"] = [
        _init_conv(rng, 3, 3, 256, features, bias=False),
        _init_conv(rng, 3, 3, 512, features, bias=False),
        _init_conv(rng, 3, 3, dim, features, bias=False),
        _init_conv(rng, 3, 3, dim, features, bias=False),
    ]
    # scratch.refinenetN: two residual conv units + 1x1 out conv
    p["fusion"] = [
        {"rcu1": {"conv1": _init_conv(rng, 3, 3, features, features),
                  "conv2": _init_conv(rng, 3, 3, features, features)},
         "rcu2": {"conv1": _init_conv(rng, 3, 3, features, features),
                  "conv2": _init_conv(rng, 3, 3, features, features)},
         "out": _init_conv(rng, 1, 1, features, features)}
        for _ in range(4)
    ]
    p["head"] = [
        _init_conv(rng, 3, 3, features, features // 2),
        _init_conv(rng, 3, 3, features // 2, 32),
        _init_conv(rng, 1, 1, 32, out_channels),
    ]
    return p


def _resize(x, h, w):
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[3]), "bilinear")


def _resize_ac(x, h, w):
    """Bilinear resize with torch align_corners=True semantics (what every
    DPT upsample uses; jax.image.resize uses half-pixel centers instead)."""
    B, H, W, C = x.shape
    ys = jnp.linspace(0.0, H - 1.0, h) if h > 1 else jnp.zeros((1,))
    xs = jnp.linspace(0.0, W - 1.0, w) if w > 1 else jnp.zeros((1,))
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    top = x[:, y0][:, :, x0] * (1 - wx) + x[:, y0][:, :, x1] * wx
    bot = x[:, y1][:, :, x0] * (1 - wx) + x[:, y1][:, :, x1] * wx
    return top * (1 - wy) + bot * wy


def _residual_conv_unit(p, x):
    y = conv2d(p["conv1"], jax.nn.relu(x))
    y = conv2d(p["conv2"], jax.nn.relu(y))
    return x + y


def _fusion_block(p, x, skip=None):
    if skip is not None:
        x = x + _residual_conv_unit(p["rcu1"], skip)
    x = _residual_conv_unit(p["rcu2"], x)
    x = _resize_ac(x, x.shape[1] * 2, x.shape[2] * 2)
    return conv2d(p["out"], x)


def dpt_forward(p, img: jnp.ndarray, out_channels: int = 1) -> jnp.ndarray:
    """img [B,H,W,3] in [0,1] (H,W multiples of 32) -> [B,H,W,C]."""
    B, H, W, _ = img.shape
    x = (img - jnp.asarray([0.5, 0.5, 0.5])) / jnp.asarray([0.5, 0.5, 0.5])
    s0, s1, s2 = resnet_stages(p["resnet"], x)      # /4 256, /8 512, /16 1024

    tok = conv2d(p["patch_embed"], s2)              # /16 -> tokens
    th, tw = tok.shape[1], tok.shape[2]
    tok = tok.reshape(B, th * tw, -1)
    cls = jnp.broadcast_to(p["cls_token"], (B, 1, tok.shape[-1]))
    tok = jnp.concatenate([cls, tok], axis=1)
    pos = p["pos_embed"]
    if pos.shape[1] != tok.shape[1]:
        side = int(np.sqrt(pos.shape[1] - 1))
        grid = pos[:, 1:].reshape(1, side, side, -1)
        grid = _resize(grid, th, tw).reshape(1, th * tw, -1)
        pos = jnp.concatenate([pos[:, :1], grid], axis=1)
    tok = tok + pos

    taps: List[jnp.ndarray] = []
    for i, blk in enumerate(p["blocks"]):
        tok = vit_block(blk, tok)
        if i in VIT_TAPS:
            taps.append(tok)

    def readout_project(t, ro):
        # cat cls to every token, Linear + GELU, drop cls
        cls_t = jnp.broadcast_to(t[:, :1], t[:, 1:].shape)
        y = dense(ro, jnp.concatenate([t[:, 1:], cls_t], axis=-1))
        return jax.nn.gelu(y, approximate=False).reshape(B, th, tw, -1)

    t3 = readout_project(taps[0], p["readout"][0])
    t4 = readout_project(taps[1], p["readout"][1])
    f16 = conv2d(p["act_post"]["proj3"], t3)                          # /16
    # the DPT downsample conv uses torch symmetric padding=1, not TF-SAME
    f32 = conv2d(p["act_post"]["down4"],
                 conv2d(p["act_post"]["proj4"], t4), stride=2,
                 padding=((1, 1), (1, 1)))                            # /32

    r1 = conv2d(p["layer_rn"][0], s0)                                 # /4
    r2 = conv2d(p["layer_rn"][1], s1)                                 # /8
    r3 = conv2d(p["layer_rn"][2], f16)                                # /16
    r4 = conv2d(p["layer_rn"][3], f32)                                # /32

    y = _fusion_block(p["fusion"][0], r4)                             # -> /16
    y = _fusion_block(p["fusion"][1], _crop_to(y, r3), r3)            # -> /8
    y = _fusion_block(p["fusion"][2], _crop_to(y, r2), r2)            # -> /4
    y = _fusion_block(p["fusion"][3], _crop_to(y, r1), r1)            # -> /2

    y = conv2d(p["head"][0], y)
    y = _resize_ac(y, H, W)
    y = jax.nn.relu(conv2d(p["head"][1], y))
    y = conv2d(p["head"][2], y)
    if out_channels == 1:
        return jax.nn.relu(y)       # non_negative depth head
    return jnp.clip(y, 0.0, 1.0)    # omnidata normals are clamped to [0,1]


def _crop_to(x, ref):
    return x[:, : ref.shape[1], : ref.shape[2], :]


class DPTInference:
    """Checkpoint-backed inference wrapper used by extract_monocular_cues."""

    def __init__(self, ckpt_path: str, task: str = "depth",
                 input_size: int = 384):
        self.task = task
        self.input_size = input_size
        data = np.load(ckpt_path, allow_pickle=False)
        oc = 1 if task == "depth" else 3
        self.params = init_dpt(out_channels=oc)
        self.params = _load_flat_into(self.params, data)
        self._fwd = jax.jit(lambda p, x: dpt_forward(p, x, oc))

    def __call__(self, img: np.ndarray) -> np.ndarray:
        H, W = img.shape[:2]
        s = self.input_size
        x = jax.image.resize(jnp.asarray(img)[None], (1, s, s, 3), "bilinear")
        y = np.asarray(self._fwd(self.params, x))[0]
        y = np.asarray(jax.image.resize(jnp.asarray(y), (H, W, y.shape[-1]),
                                        "bilinear"))
        if self.task == "depth":
            d = y[..., 0]
            lo, hi = d.min(), max(d.max(), d.min() + 1e-6)
            return ((d - lo) / (hi - lo)).astype(np.float32)
        return y.transpose(2, 0, 1).astype(np.float32)  # [3,H,W] in [0,1]


def _load_flat_into(params, flat):
    """Load 'a/b/0/w'-style flat npz keys into the nested param dict."""
    def setp(tree, path, val):
        k = path[0]
        if isinstance(tree, list):
            k = int(k)
        if len(path) == 1:
            tree[k] = jnp.asarray(val)
        else:
            setp(tree[k], path[1:], val)

    for key in flat.files:
        setp(params, key.split("/"), flat[key])
    return params
