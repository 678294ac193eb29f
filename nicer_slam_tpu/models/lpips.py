"""LPIPS perceptual distance (AlexNet variant) in JAX.

The reference reports PSNR/SSIM/LPIPS for rendering eval
(code/evaluation/eval_rendering.py:43-47,134-170, `lpips.LPIPS(net="alex")`).
This implements the same computation (Zhang et al. 2018):

  x -> scaling layer -> AlexNet conv features (5 taps, post-ReLU)
    -> per-tap channel-unit-normalize -> squared diff
    -> learned 1x1 "lin" weights -> spatial mean -> sum over taps

Weights: convert the official checkpoint with tools/convert_lpips.py where
torch + torchvision weights are available (this offline image cannot fetch
them). Without a converted checkpoint, `LPIPSMetric` falls back to a
DETERMINISTIC randomly-initialized AlexNet with uniform lin weights —
random-feature perceptual distances are rank-correlated with learned ones
but NOT numerically comparable to official LPIPS values; the metric is then
labeled "lpips_randfeat" so results are never mistaken for the official
metric.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .dpt import _init_conv, _load_flat_into, conv2d

# scaling layer constants (PerceptualSimilarity lpips/lpips.py ScalingLayer)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# AlexNet feature geometry: (kernel, stride, pad, cin, cout, pool_before)
_ALEX = (
    (11, 4, 2, 3, 64, False),
    (5, 1, 2, 64, 192, True),
    (3, 1, 1, 192, 384, True),
    (3, 1, 1, 384, 256, False),
    (3, 1, 1, 256, 256, False),
)


def init_lpips(rng_seed: int = 0) -> Dict[str, Any]:
    rng = np.random.default_rng(rng_seed)
    p: Dict[str, Any] = {"conv": [], "lin": []}
    for (k, s, pad, ci, co, _) in _ALEX:
        p["conv"].append(_init_conv(rng, k, k, ci, co, bias=True))
        # fallback lin weights: uniform average over channels (replaced by
        # the learned weights when a converted checkpoint is loaded)
        p["lin"].append({"w": jnp.full((1, 1, co, 1), 1.0 / co)})
    return p


def _alex_features(p, x):
    """x [B,H,W,3] normalized; returns the 5 post-ReLU tap activations."""
    taps = []
    for i, (k, s, pad, ci, co, pool) in enumerate(_ALEX):
        if pool:
            x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                      (1, 3, 3, 1), (1, 2, 2, 1), "VALID")
        x = conv2d(p["conv"][i], x, stride=s,
                   padding=((pad, pad), (pad, pad)))
        x = jax.nn.relu(x)
        taps.append(x)
    return taps


def lpips_distance(p, img0, img1):
    """img0/img1 [B,H,W,3] in [0,1] -> [B] perceptual distance."""
    def norm_input(im):
        x = im * 2.0 - 1.0
        return (x - _SHIFT) / _SCALE

    t0 = _alex_features(p, norm_input(img0))
    t1 = _alex_features(p, norm_input(img1))
    total = 0.0
    for i, (a, b) in enumerate(zip(t0, t1)):
        # official normalize_tensor: feat / (||feat||_channels + 1e-10)
        na = a / (jnp.sqrt((a * a).sum(-1, keepdims=True)) + 1e-10)
        nb = b / (jnp.sqrt((b * b).sum(-1, keepdims=True)) + 1e-10)
        d = (na - nb) ** 2
        w = p["lin"][i]["w"]                      # [1,1,C,1]
        total = total + jnp.einsum("bhwc,c->b", d, w[0, 0, :, 0]) / (
            d.shape[1] * d.shape[2])
    return total


class LPIPSMetric:
    """Callable (img0, img1 in [0,1] HWC numpy) -> float.

    Loads a converted checkpoint (tools/convert_lpips.py) when present;
    otherwise deterministic random features (metric_name "lpips_randfeat")."""

    def __init__(self, ckpt_path: Optional[str] = None):
        self.params = init_lpips()
        if ckpt_path and os.path.exists(ckpt_path):
            self.params = _load_flat_into(self.params, np.load(ckpt_path))
            self.metric_name = "lpips"
        else:
            self.metric_name = "lpips_randfeat"
        self._fwd = jax.jit(lambda p, a, b: lpips_distance(p, a, b))

    def __call__(self, img0: np.ndarray, img1: np.ndarray) -> float:
        a = jnp.asarray(img0, jnp.float32)[None]
        b = jnp.asarray(img1, jnp.float32)[None]
        return float(self._fwd(self.params, a, b)[0])
