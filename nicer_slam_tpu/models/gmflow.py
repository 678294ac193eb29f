"""GMFlow optical flow in JAX (global matching flow).

The reference extracts keyframe-pair flow with GMFlow
(preprocess/extract_flows.py, gmflow_sintel checkpoint): a shared CNN
backbone at 1/8 resolution, a 6-block transformer alternating self/cross
attention between the two frames, global correlation softmax matching, a
self-attention flow propagation step, and bilinear upsampling.

From-scratch JAX implementation sized for weights converted from the
official torch checkpoint (tools/convert_gmflow.py). Offline environment:
numerical parity pending weights; exercised by shape tests + the
extract_flows hook.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .dpt import (_init_conv, _init_dense, _init_ln, conv2d, dense,
                  layer_norm, _load_flat_into)


def init_backbone(rng, dim=128):
    """6-layer conv backbone to 1/8 resolution."""
    return {
        "c1": _init_conv(rng, 7, 7, 3, 64),
        "c2": _init_conv(rng, 3, 3, 64, 64),
        "c3": _init_conv(rng, 3, 3, 64, 96),
        "c4": _init_conv(rng, 3, 3, 96, 96),
        "c5": _init_conv(rng, 3, 3, 96, dim),
        "c6": _init_conv(rng, 3, 3, dim, dim),
    }


def backbone(p, x):
    y = jax.nn.relu(conv2d(p["c1"], x, stride=2))   # /2
    y = jax.nn.relu(conv2d(p["c2"], y))
    y = jax.nn.relu(conv2d(p["c3"], y, stride=2))   # /4
    y = jax.nn.relu(conv2d(p["c4"], y))
    y = jax.nn.relu(conv2d(p["c5"], y, stride=2))   # /8
    return conv2d(p["c6"], y)


def init_attn_block(rng, dim=128, heads=1, ffn=512):
    return {
        "ln_q": _init_ln(dim), "ln_kv": _init_ln(dim),
        "ln_ffn": _init_ln(dim * 2),
        "q": _init_dense(rng, dim, dim),
        "k": _init_dense(rng, dim, dim),
        "v": _init_dense(rng, dim, dim),
        "proj": _init_dense(rng, dim, dim),
        "fc1": _init_dense(rng, dim * 2, ffn),
        "fc2": _init_dense(rng, ffn, dim),
    }


def attn_block(p, x, src, h: int = 1):
    """Attention of x over src (self when src is x) + FFN over the
    concatenated [x, message] (gmflow's transformer block structure)."""
    B, N, D = x.shape
    q = dense(p["q"], layer_norm(p["ln_q"], x)).reshape(B, N, h, D // h)
    kv_in = layer_norm(p["ln_kv"], src)
    k = dense(p["k"], kv_in).reshape(B, -1, h, D // h)
    v = dense(p["v"], kv_in).reshape(B, -1, h, D // h)
    att = jnp.einsum("bnhd,bmhd->bhnm", q, k) / np.sqrt(D // h)
    msg = jnp.einsum("bhnm,bmhd->bnhd", jax.nn.softmax(att, -1), v)
    msg = dense(p["proj"], msg.reshape(B, N, D))
    cat = layer_norm(p["ln_ffn"], jnp.concatenate([x, msg], axis=-1))
    y = dense(p["fc2"], jax.nn.gelu(dense(p["fc1"], cat)))
    return x + y


def init_gmflow(rng_seed: int = 0, dim: int = 128, num_blocks: int = 6):
    rng = np.random.default_rng(rng_seed)
    return {
        "backbone": init_backbone(rng, dim),
        "blocks": [init_attn_block(rng, dim) for _ in range(num_blocks * 2)],
        "prop": init_attn_block(rng, dim),
    }


def positional_grid(h, w, dim):
    """Sine-cosine 2D positional encoding [h*w, dim]."""
    d4 = dim // 4
    ys, xs = jnp.mgrid[0:h, 0:w]
    freqs = jnp.exp(jnp.arange(d4) * (-np.log(10000.0) / max(d4 - 1, 1)))
    px = xs.reshape(-1, 1) * freqs
    py = ys.reshape(-1, 1) * freqs
    return jnp.concatenate([jnp.sin(px), jnp.cos(px),
                            jnp.sin(py), jnp.cos(py)], axis=-1)


def gmflow_forward(p, img0: jnp.ndarray, img1: jnp.ndarray) -> jnp.ndarray:
    """[B,H,W,3] pair in [0,1] -> flow [B,H,W,2] (pixels, 0->1)."""
    B, H, W, _ = img0.shape
    x = jnp.concatenate([img0, img1], axis=0) * 2.0 - 1.0
    f = backbone(p["backbone"], x)
    h, w, D = f.shape[1], f.shape[2], f.shape[3]
    f = f.reshape(2 * B, h * w, D)
    pos = positional_grid(h, w, D)[None]
    f = f + pos
    f0, f1 = f[:B], f[B:]

    for i in range(0, len(p["blocks"]), 2):
        f0 = attn_block(p["blocks"][i], f0, f0)       # self
        f1 = attn_block(p["blocks"][i], f1, f1)
        f0n = attn_block(p["blocks"][i + 1], f0, f1)  # cross
        f1 = attn_block(p["blocks"][i + 1], f1, f0)
        f0 = f0n

    # global correlation softmax matching
    corr = jnp.einsum("bnd,bmd->bnm", f0, f1) / np.sqrt(D)
    prob = jax.nn.softmax(corr, axis=-1)
    ys, xs = jnp.mgrid[0:h, 0:w]
    grid = jnp.stack([xs.reshape(-1), ys.reshape(-1)], -1).astype(jnp.float32)
    match_xy = prob @ grid                            # [B, h*w, 2]
    flow = match_xy - grid[None]

    # self-attention flow propagation
    att = jnp.einsum("bnd,bmd->bnm", f0, f0) / np.sqrt(D)
    flow = jax.nn.softmax(att, -1) @ flow

    flow = flow.reshape(B, h, w, 2)
    flow = jax.image.resize(flow, (B, H, W, 2), "bilinear")
    scale = jnp.asarray([W / w, H / h], jnp.float32)
    return flow * scale


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
