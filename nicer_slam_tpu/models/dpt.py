"""DPT-hybrid (ViT-B + ResNet50) monocular depth/normal nets in JAX.

The Omnidata models the reference shells out to
(preprocess/extract_monocular_cues.py: vitb_rn50_384 at 384x384) are
DPT-hybrid networks: a ResNet50 stem whose stage-1/2 activations feed both
the ViT patch embedding and two skip paths, a 12-layer ViT-B encoder with
taps at layers {0, 1, 8, 11}, RefineNet-style fusion across 4 scales, and a
task head (1-channel ReLU depth / 3-channel normals).

This is a from-scratch JAX implementation sized to load weights converted
from the official torch checkpoints (tools/convert_omnidata.py). The
checkpoints cannot be fetched in this offline environment, so numerical
parity is validated only by the converter where weights exist; here the
architecture is exercised by shape tests and the preprocessing hook.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

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


def layer_norm(p, x, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]


def batch_norm_inference(p, x, eps=1e-5):
    return (x - p["mean"]) * jax.lax.rsqrt(p["var"] + eps) * p["g"] + p["b"]


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


def _init_bn(c):
    return {"g": jnp.ones((c,)), "b": jnp.zeros((c,)),
            "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def _init_ln(c):
    return {"g": jnp.ones((c,)), "b": jnp.zeros((c,))}


# ---------------------------------------------------------------------------
# ResNet50 stem + stages 1-2 (the "hybrid" part)
# ---------------------------------------------------------------------------

def init_bottleneck(rng, cin, cmid, cout, stride=1):
    p = {
        "conv1": _init_conv(rng, 1, 1, cin, cmid, bias=False),
        "bn1": _init_bn(cmid),
        "conv2": _init_conv(rng, 3, 3, cmid, cmid, bias=False),
        "bn2": _init_bn(cmid),
        "conv3": _init_conv(rng, 1, 1, cmid, cout, bias=False),
        "bn3": _init_bn(cout),
    }
    if stride != 1 or cin != cout:
        p["down"] = _init_conv(rng, 1, 1, cin, cout, bias=False)
        p["down_bn"] = _init_bn(cout)
    return p


def bottleneck(p, x, s: int = 1):
    y = jax.nn.relu(batch_norm_inference(p["bn1"], conv2d(p["conv1"], x)))
    y = jax.nn.relu(batch_norm_inference(p["bn2"], conv2d(p["conv2"], y, stride=s)))
    y = batch_norm_inference(p["bn3"], conv2d(p["conv3"], y))
    if "down" in p:
        x = batch_norm_inference(p["down_bn"], conv2d(p["down"], x, stride=s))
    return jax.nn.relu(x + y)


def init_resnet_stages(rng):
    p: Dict[str, Any] = {
        "stem": _init_conv(rng, 7, 7, 3, 64, bias=False),
        "stem_bn": _init_bn(64),
    }
    # stage1: 3 bottlenecks 64->256 @ /4, stage2: 4 bottlenecks 256->512 @ /8
    p["stage1"] = [init_bottleneck(rng, 64, 64, 256)] + [
        init_bottleneck(rng, 256, 64, 256) for _ in range(2)]
    p["stage2"] = [init_bottleneck(rng, 256, 128, 512, stride=2)] + [
        init_bottleneck(rng, 512, 128, 512) for _ in range(3)]
    return p


def resnet_stages(p, x):
    y = conv2d(p["stem"], x, stride=2)
    y = jax.nn.relu(batch_norm_inference(p["stem_bn"], y))
    y = jax.lax.reduce_window(y, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                              (1, 2, 2, 1), "SAME")
    for blk in p["stage1"]:
        y = bottleneck(blk, y, 1)
    s1 = y                                  # /4, 256
    for i, blk in enumerate(p["stage2"]):
        y = bottleneck(blk, y, 2 if i == 0 else 1)
    s2 = y                                  # /8, 512
    return s1, s2


# ---------------------------------------------------------------------------
# ViT-B encoder
# ---------------------------------------------------------------------------

def init_vit_block(rng, dim=768, mlp=3072, heads=12):
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
    y = dense(p["fc2"], jax.nn.gelu(dense(p["fc1"], y)))
    return x + y


# ---------------------------------------------------------------------------
# DPT-hybrid model
# ---------------------------------------------------------------------------

VIT_TAPS = (0, 1, 8, 11)   # hybrid taps: 0,1 come from the resnet skips


def init_dpt(rng_seed: int = 0, out_channels: int = 1,
             features: int = 256, dim: int = 768, depth: int = 12):
    rng = np.random.default_rng(rng_seed)
    p: Dict[str, Any] = {"resnet": init_resnet_stages(rng)}
    p["patch_embed"] = _init_conv(rng, 1, 1, 512, dim)     # on /8 feature map... /16 after pool
    p["pos_embed"] = jnp.zeros((1, 24 * 24 + 1, dim))
    p["cls_token"] = jnp.zeros((1, 1, dim))
    p["blocks"] = [init_vit_block(rng, dim) for _ in range(depth)]
    p["ln"] = _init_ln(dim)
    # reassemble: project taps to pyramid channels then resize
    # (layers 0/1 use the resnet skips directly in the hybrid)
    p["act_post"] = {
        "proj2": _init_conv(rng, 1, 1, dim, features),   # tap 8  -> /16
        "proj3": _init_conv(rng, 1, 1, dim, features),   # tap 11 -> /32
        "proj0": _init_conv(rng, 1, 1, 256, features),   # rn skip /4
        "proj1": _init_conv(rng, 1, 1, 512, features),   # rn skip /8
    }
    p["fusion"] = [
        {"res1": _init_conv(rng, 3, 3, features, features),
         "res2": _init_conv(rng, 3, 3, features, features),
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


def _fusion_block(p, x, skip=None):
    if skip is not None:
        x = x + jax.nn.relu(conv2d(p["res1"], jax.nn.relu(skip)))
    y = jax.nn.relu(conv2d(p["res2"], jax.nn.relu(x)))
    x = x + y
    x = _resize(x, x.shape[1] * 2, x.shape[2] * 2)
    return conv2d(p["out"], x)


def dpt_forward(p, img: jnp.ndarray, out_channels: int = 1) -> jnp.ndarray:
    """img [B,H,W,3] in [0,1] (H,W multiples of 32) -> [B,H,W,C]."""
    B, H, W, _ = img.shape
    x = (img - jnp.asarray([0.5, 0.5, 0.5])) / jnp.asarray([0.5, 0.5, 0.5])
    s1, s2 = resnet_stages(p["resnet"], x)            # /4 256, /8 512
    # hybrid ViT runs on pooled /16 tokens of s2
    feat16 = jax.lax.reduce_window(s2, -jnp.inf, jax.lax.max,
                                   (1, 2, 2, 1), (1, 2, 2, 1), "SAME")
    tok = conv2d(p["patch_embed"], feat16)
    th, tw = tok.shape[1], tok.shape[2]
    tok = tok.reshape(B, th * tw, -1)
    cls = jnp.broadcast_to(p["cls_token"], (B, 1, tok.shape[-1]))
    tok = jnp.concatenate([cls, tok], axis=1)
    pos = p["pos_embed"]
    if pos.shape[1] != tok.shape[1]:
        grid = pos[:, 1:].reshape(1, int(np.sqrt(pos.shape[1] - 1)),
                                  int(np.sqrt(pos.shape[1] - 1)), -1)
        grid = _resize(grid, th, tw).reshape(1, th * tw, -1)
        pos = jnp.concatenate([pos[:, :1], grid], axis=1)
    tok = tok + pos

    taps: List[jnp.ndarray] = []
    for i, blk in enumerate(p["blocks"]):
        tok = vit_block(blk, tok)
        if i in VIT_TAPS[2:]:
            taps.append(layer_norm(p["ln"], tok))

    def tok2map(t):
        return t[:, 1:].reshape(B, th, tw, -1)

    f16 = conv2d(p["act_post"]["proj2"], tok2map(taps[0]))          # /16
    f32 = conv2d(p["act_post"]["proj3"],
                 _resize(tok2map(taps[1]), th // 2, tw // 2))        # /32
    f4 = conv2d(p["act_post"]["proj0"], s1)                          # /4
    f8 = conv2d(p["act_post"]["proj1"], s2)                          # /8

    y = _fusion_block(p["fusion"][0], f32)                           # -> /16
    y = _fusion_block(p["fusion"][1], _crop_to(y, f16), f16)         # -> /8
    y = _fusion_block(p["fusion"][2], _crop_to(y, f8), f8)           # -> /4
    y = _fusion_block(p["fusion"][3], _crop_to(y, f4), f4)           # -> /2

    y = conv2d(p["head"][0], y)
    y = _resize(y, H, W)
    y = jax.nn.relu(conv2d(p["head"][1], y))
    y = conv2d(p["head"][2], y)
    if out_channels == 1:
        return jax.nn.relu(y)
    return jax.nn.sigmoid(y)   # omnidata normals are emitted in [0,1]


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
