"""GMFlow optical flow in JAX (global matching flow).

The reference extracts keyframe-pair flow with GMFlow
(preprocess/extract_flows.py, gmflow_sintel checkpoint; settings
attn_splits=2, global correlation, global propagation, upsample_factor 8,
6 transformer layers, 1 head, ffn_dim_expansion 4, feature_channels 128).

This is a from-scratch JAX implementation of the official architecture,
parameter tree mirroring the torch checkpoint layout (see
tools/convert_gmflow.py):
  * CNNEncoder: 7x7/2 conv + InstanceNorm (no affine), three residual
    stages (64/96/128 at /2,/4,/8), 1x1 output conv.
  * FeatureTransformer: 6 blocks of {self_attn, cross_attn_ffn}
    TransformerLayers — q/k/v/merge linears + LayerNorm, FFN over
    [source, message] concat; attention inside 2x2 split windows with
    DETR-style sine positions added per window.
  * Global correlation softmax matching + SelfAttnPropagation
    (q_proj/k_proj over features, values = flow).
  * RAFT-style convex upsampling head (mask over 9 neighbors x 8^2).

Validated offline by tests/test_priors_models.py: a torch reference of the
encoder + one transformer block with the official key names round-trips
through the converter and matches this forward.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from .dpt import _init_conv, _init_dense, _init_ln, conv2d, dense, layer_norm, \
    _load_flat_into


# ---------------------------------------------------------------------------
# CNN encoder (official backbone.py: InstanceNorm2d affine=False -> no params)
# ---------------------------------------------------------------------------

def instance_norm(x, eps=1e-5):
    mu = x.mean(axis=(1, 2), keepdims=True)
    var = ((x - mu) ** 2).mean(axis=(1, 2), keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps)


def init_res_block(rng, cin, cout, stride=1):
    p = {"conv1": _init_conv(rng, 3, 3, cin, cout, bias=False),
         "conv2": _init_conv(rng, 3, 3, cout, cout, bias=False)}
    if stride != 1 or cin != cout:
        p["down"] = _init_conv(rng, 1, 1, cin, cout, bias=False)
    return p


def res_block(p, x, stride=1):
    # torch symmetric padding (GMFlow uses plain nn.Conv2d, not TF-SAME —
    # they differ for stride-2 convs on even input sizes)
    pad1 = ((1, 1), (1, 1))
    y = jax.nn.relu(instance_norm(conv2d(p["conv1"], x, stride=stride,
                                         padding=pad1)))
    y = jax.nn.relu(instance_norm(conv2d(p["conv2"], y, padding=pad1)))
    if "down" in p:
        x = instance_norm(conv2d(p["down"], x, stride=stride))
    return jax.nn.relu(x + y)


def init_backbone(rng, dim=128):
    return {
        "conv1": _init_conv(rng, 7, 7, 3, 64, bias=False),
        "layer1": [init_res_block(rng, 64, 64), init_res_block(rng, 64, 64)],
        "layer2": [init_res_block(rng, 64, 96, 2), init_res_block(rng, 96, 96)],
        "layer3": [init_res_block(rng, 96, 128, 2),
                   init_res_block(rng, 128, 128)],
        "conv2": _init_conv(rng, 1, 1, 128, dim),
    }


def backbone(p, x):
    y = jax.nn.relu(instance_norm(conv2d(p["conv1"], x, stride=2,
                                         padding=((3, 3), (3, 3)))))  # /2
    y = res_block(p["layer1"][0], y)
    y = res_block(p["layer1"][1], y)
    y = res_block(p["layer2"][0], y, stride=2)                        # /4
    y = res_block(p["layer2"][1], y)
    y = res_block(p["layer3"][0], y, stride=2)                        # /8
    y = res_block(p["layer3"][1], y)
    return conv2d(p["conv2"], y)


# ---------------------------------------------------------------------------
# Transformer (official transformer.py TransformerLayer / TransformerBlock)
# ---------------------------------------------------------------------------

def init_transformer_layer(rng, dim=128, ffn=True, expansion=4):
    p = {
        "q": _init_dense(rng, dim, dim),
        "k": _init_dense(rng, dim, dim),
        "v": _init_dense(rng, dim, dim),
        "merge": _init_dense(rng, dim, dim),
        "norm1": _init_ln(dim),
    }
    if ffn:
        cin = dim * 2
        # official FFN linears are bias-free (transformer.py mlp Sequential)
        p["mlp0"] = {"w": jnp.asarray(rng.normal(
            0, np.sqrt(2.0 / cin), (cin, cin * expansion)).astype(np.float32))}
        p["mlp2"] = {"w": jnp.asarray(rng.normal(
            0, np.sqrt(2.0 / (cin * expansion)),
            (cin * expansion, dim)).astype(np.float32))}
        p["norm2"] = _init_ln(dim)
    return p


def transformer_layer(p, source, target):
    """source attends to target; FFN over [source, message] when present.

    source/target: [B, N, D] (already windowed when attn_splits > 1)."""
    D = source.shape[-1]
    q = dense(p["q"], source)
    k = dense(p["k"], target)
    v = dense(p["v"], target)
    att = jnp.einsum("bnd,bmd->bnm", q, k) / np.sqrt(D)
    msg = jax.nn.softmax(att, axis=-1) @ v
    # torch nn.LayerNorm default eps (1e-5), unlike the ViT blocks' 1e-6
    msg = layer_norm(p["norm1"], dense(p["merge"], msg), eps=1e-5)
    if "mlp0" in p:
        cat = jnp.concatenate([source, msg], axis=-1)
        y = jax.nn.gelu(cat @ p["mlp0"]["w"], approximate=False) @ p["mlp2"]["w"]
        msg = layer_norm(p["norm2"], y, eps=1e-5)
    return source + msg


def init_gmflow(rng_seed: int = 0, dim: int = 128, num_blocks: int = 6,
                upsample_factor: int = 8):
    rng = np.random.default_rng(rng_seed)
    return {
        "backbone": init_backbone(rng, dim),
        "blocks": [
            {"self_attn": init_transformer_layer(rng, dim, ffn=False),
             "cross_attn_ffn": init_transformer_layer(rng, dim, ffn=True)}
            for _ in range(num_blocks)
        ],
        "prop": {"q": _init_dense(rng, dim, dim),
                 "k": _init_dense(rng, dim, dim)},
        "upsampler": [
            _init_conv(rng, 3, 3, 2 + dim, 256),
            _init_conv(rng, 1, 1, 256, upsample_factor ** 2 * 9),
        ],
    }


# ---------------------------------------------------------------------------
# position encoding (official position.py = DETR PositionEmbeddingSine,
# normalize=True, scale=2*pi, num_pos_feats=dim//2)
# ---------------------------------------------------------------------------

def sine_position(h, w, dim, temperature=10000.0):
    npf = dim // 2
    scale = 2.0 * np.pi
    eps = 1e-6
    y_embed = np.cumsum(np.ones((h, w)), axis=0)
    x_embed = np.cumsum(np.ones((h, w)), axis=1)
    y_embed = y_embed / (y_embed[-1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, -1:] + eps) * scale
    dim_t = temperature ** (2 * (np.arange(npf) // 2) / npf)
    pos_x = x_embed[:, :, None] / dim_t
    pos_y = y_embed[:, :, None] / dim_t
    pos_x = np.stack([np.sin(pos_x[..., 0::2]), np.cos(pos_x[..., 1::2])],
                     axis=3).reshape(h, w, -1)
    pos_y = np.stack([np.sin(pos_y[..., 0::2]), np.cos(pos_y[..., 1::2])],
                     axis=3).reshape(h, w, -1)
    return jnp.asarray(np.concatenate([pos_y, pos_x], axis=-1)
                       .astype(np.float32))           # [h, w, dim]


def _split_windows(x, ns):
    """[B, H, W, C] -> [B*ns*ns, H/ns, W/ns, C] (official split_feature)."""
    B, H, W, C = x.shape
    x = x.reshape(B, ns, H // ns, ns, W // ns, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B * ns * ns, H // ns, W // ns, C)


def _merge_windows(x, ns, H, W):
    B = x.shape[0] // (ns * ns)
    x = x.reshape(B, ns, ns, H // ns, W // ns, -1).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, -1)


def gmflow_forward(p, img0: jnp.ndarray, img1: jnp.ndarray,
                   attn_splits: int = 2,
                   upsample_factor: int = 8) -> jnp.ndarray:
    """[B,H,W,3] pair in [0,1] -> flow [B,H,W,2] (pixels, 0->1)."""
    B, H, W, _ = img0.shape
    x = jnp.concatenate([img0, img1], axis=0) * 2.0 - 1.0
    f = backbone(p["backbone"], x)                     # [2B, h, w, D]
    h, w, D = f.shape[1], f.shape[2], f.shape[3]

    # add sine positions inside attention windows (feature_add_position)
    ns = attn_splits
    pos = sine_position(h // ns, w // ns, D)[None]
    fw = _split_windows(f, ns) + pos
    f = _merge_windows(fw, ns, h, w)
    f0, f1 = f[:B], f[B:]

    def windowed(layer, src, tgt):
        s = _split_windows(src, ns).reshape(B * ns * ns, -1, D)
        t = _split_windows(tgt, ns).reshape(B * ns * ns, -1, D)
        out = transformer_layer(layer, s, t)
        return _merge_windows(out.reshape(B * ns * ns, h // ns, w // ns, D),
                              ns, h, w)

    for blk in p["blocks"]:
        f0n = windowed(blk["self_attn"], f0, f0)
        f1n = windowed(blk["self_attn"], f1, f1)
        f0c = windowed(blk["cross_attn_ffn"], f0n, f1n)
        f1 = windowed(blk["cross_attn_ffn"], f1n, f0n)
        f0 = f0c

    # global correlation softmax matching (matching.py global_correlation_
    # softmax): correlation normalized by sqrt(D), argmax-free soft matching
    t0 = f0.reshape(B, h * w, D)
    t1 = f1.reshape(B, h * w, D)
    corr = jnp.einsum("bnd,bmd->bnm", t0, t1) / np.sqrt(D)
    prob = jax.nn.softmax(corr, axis=-1)
    ys, xs = jnp.mgrid[0:h, 0:w]
    grid = jnp.stack([xs.reshape(-1), ys.reshape(-1)], -1).astype(jnp.float32)
    match_xy = prob @ grid                             # [B, h*w, 2]
    flow = match_xy - grid[None]

    # self-attention flow propagation (SelfAttnPropagation, global)
    q = dense(p["prop"]["q"], t0)
    k = dense(p["prop"]["k"], t0)
    att = jnp.einsum("bnd,bmd->bnm", q, k) / np.sqrt(D)
    flow = jax.nn.softmax(att, -1) @ flow              # [B, h*w, 2]
    flow = flow.reshape(B, h, w, 2)

    # convex upsampling (RAFT-style): predict a 9-neighbor mask per output
    # pixel from [flow, feature], softmax, blend the unfolded coarse flow
    uf = upsample_factor
    feat0 = f0
    mask = conv2d(p["upsampler"][1],
                  jax.nn.relu(conv2d(p["upsampler"][0],
                                     jnp.concatenate([flow, feat0], -1))))
    mask = mask.reshape(B, h, w, 9, uf * uf)
    mask = jax.nn.softmax(mask, axis=3)
    # unfold 3x3 neighborhoods of the (scaled) coarse flow
    fpad = jnp.pad(flow * uf, ((0, 0), (1, 1), (1, 1), (0, 0)))
    neigh = jnp.stack([fpad[:, dy:dy + h, dx:dx + w]
                       for dy in range(3) for dx in range(3)], axis=3)
    up = (mask[..., None] * neigh[:, :, :, :, None, :]).sum(axis=3)
    up = up.reshape(B, h, w, uf, uf, 2)
    up = up.transpose(0, 1, 3, 2, 4, 5).reshape(B, h * uf, w * uf, 2)
    return up[:, :H, :W]


class GMFlowInference:
    """Checkpoint-backed pairwise flow used by extract_flows."""

    def __init__(self, ckpt_path: str, pad_to: int = 32):
        data = np.load(ckpt_path, allow_pickle=False)
        self.params = init_gmflow()
        self.params = _load_flat_into(self.params, data)
        self.pad_to = pad_to
        self._fwd = jax.jit(lambda p, a, b: gmflow_forward(p, a, b))

    def __call__(self, img0: np.ndarray, img1: np.ndarray) -> np.ndarray:
        H, W = img0.shape[:2]
        ph = -H % self.pad_to
        pw = -W % self.pad_to
        a = np.pad(img0, ((0, ph), (0, pw), (0, 0)))
        b = np.pad(img1, ((0, ph), (0, pw), (0, 0)))
        flow = np.asarray(self._fwd(self.params, jnp.asarray(a)[None],
                                    jnp.asarray(b)[None]))[0]
        return flow[:H, :W].astype(np.float32)
