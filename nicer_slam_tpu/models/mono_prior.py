"""Self-trained RGB-only monocular depth/normal prior (tiny UNet).

The reference's monocular cues come from Omnidata DPT models whose weights
cannot be fetched in this offline environment (converters for the official
checkpoints: tools/convert_omnidata.py + models/dpt.py). To keep the
RGB-ONLY capability honest — extract_monocular_cues must run on scans that
have no depth sensor — this module provides a small UNet trained from
scratch on procedurally generated room scenes (tools/train_mono_prior.py),
shipped as ``mono_prior.npz``. Its cues are real RGB->geometry predictions
(no GT depth is read at extraction time); provenance and domain (procedural
rooms) are documented, so it is a stand-in prior, not a claim of
Omnidata-level generality.

Outputs match the on-disk cue contract (preprocess/extract_monocular_cues.py):
depth in ~[0,1] (SSI loss is scale/shift invariant) and normals in [0,1]
(camera frame, stored as (n+1)/2).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from .dpt import _init_conv, _load_flat_into, conv2d

_WIDTHS = (24, 48, 96)


def init_mono_prior(rng_seed: int = 0) -> Dict[str, Any]:
    rng = np.random.default_rng(rng_seed)
    p: Dict[str, Any] = {"enc": [], "dec": []}
    cin = 3
    for w in _WIDTHS:
        p["enc"].append({"c1": _init_conv(rng, 3, 3, cin, w),
                         "c2": _init_conv(rng, 3, 3, w, w)})
        cin = w
    ws = list(_WIDTHS)
    for i in range(len(ws) - 2, -1, -1):
        p["dec"].append({"c1": _init_conv(rng, 3, 3, ws[i + 1] + ws[i], ws[i]),
                         "c2": _init_conv(rng, 3, 3, ws[i], ws[i])})
    p["head_depth"] = _init_conv(rng, 3, 3, _WIDTHS[0], 1)
    p["head_normal"] = _init_conv(rng, 3, 3, _WIDTHS[0], 3)
    return p


def mono_prior_forward(p, img: jnp.ndarray):
    """img [B,H,W,3] in [0,1] (H,W multiples of 4) ->
    (depth [B,H,W] in [0,1], normal [B,H,W,3] unit, camera frame)."""
    x = img * 2.0 - 1.0
    skips = []
    for i, blk in enumerate(p["enc"]):
        x = jax.nn.relu(conv2d(blk["c1"], x))
        x = jax.nn.relu(conv2d(blk["c2"], x))
        if i < len(p["enc"]) - 1:
            skips.append(x)
            x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                      (1, 2, 2, 1), (1, 2, 2, 1), "SAME")
    for blk, skip in zip(p["dec"], reversed(skips)):
        x = jax.image.resize(x, (x.shape[0], skip.shape[1], skip.shape[2],
                                 x.shape[3]), "bilinear")
        x = jnp.concatenate([x, skip], axis=-1)
        x = jax.nn.relu(conv2d(blk["c1"], x))
        x = jax.nn.relu(conv2d(blk["c2"], x))
    depth = jax.nn.sigmoid(conv2d(p["head_depth"], x))[..., 0]
    n = conv2d(p["head_normal"], x)
    n = n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-8)
    return depth, n


class MonoPriorInference:
    """Callable backend for extract_monocular_cues: RGB [H,W,3] in [0,1] ->
    (depth [H,W] in [0,1], normal01 [3,H,W] in [0,1])."""

    def __init__(self, ckpt_path: str):
        self.params = _load_flat_into(init_mono_prior(), np.load(ckpt_path))
        self._fwd = jax.jit(lambda p, x: mono_prior_forward(p, x))

    def __call__(self, img: np.ndarray):
        H, W = img.shape[:2]
        ph, pw = -H % 4, -W % 4
        x = np.pad(img, ((0, ph), (0, pw), (0, 0)), mode="edge")
        d, n = self._fwd(self.params, jnp.asarray(x)[None])
        d = np.asarray(d)[0][:H, :W].astype(np.float32)
        n = np.asarray(n)[0][:H, :W]
        n01 = ((n + 1.0) / 2.0).transpose(2, 0, 1).astype(np.float32)
        return d, n01
