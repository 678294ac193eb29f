"""Weight-normalized linear layers with the reference's geometric init.

Reference: code/model/base_networks.py:119-151. Torch's
``nn.utils.weight_norm`` (dim=0) reparameterizes W = g · V/||V||_row with g
initialized to the row norms of the initial W; we keep the same (v, g, b)
parameterization so the optimization dynamics match (gradients flow to the
direction and magnitude separately).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def weight_norm_apply(p: Dict[str, jnp.ndarray], x: jnp.ndarray) -> jnp.ndarray:
    """y = x @ W.T + b with W = g * v / ||v||_row."""
    v, g, b = p["v"], p["g"], p["b"]
    norm = jnp.sqrt(jnp.sum(v * v, axis=1, keepdims=True))
    w = v * (g / (norm))
    return x @ w.T + b


def linear_apply(p: Dict[str, jnp.ndarray], x: jnp.ndarray) -> jnp.ndarray:
    if "g" in p:
        return weight_norm_apply(p, x)
    return x @ p["v"].T + p["b"]


def _wrap_weight_norm(w: np.ndarray, b: np.ndarray, weight_norm: bool):
    if weight_norm:
        g = np.linalg.norm(w, axis=1, keepdims=True)
        return {"v": jnp.asarray(w), "g": jnp.asarray(g), "b": jnp.asarray(b)}
    return {"v": jnp.asarray(w), "b": jnp.asarray(b)}


def init_linear_default(rng: "np.random.Generator", d_in: int, d_out: int,
                        weight_norm: bool = True) -> Dict[str, jnp.ndarray]:
    """Torch nn.Linear default: kaiming-uniform U(-k,k), k=1/sqrt(d_in).

    Initialization uses host numpy RNG (jax.random would compile a fresh
    threefry program per shape — seconds each on first touch)."""
    bound = 1.0 / np.sqrt(d_in)
    w = rng.uniform(-bound, bound, (d_out, d_in)).astype(np.float32)
    b = rng.uniform(-bound, bound, (d_out,)).astype(np.float32)
    return _wrap_weight_norm(w, b, weight_norm)


def init_linear_geometric(
    rng: "np.random.Generator",
    d_in: int,
    d_out: int,
    layer: int,
    num_layers: int,
    *,
    multires: int,
    skip_layer: bool,
    dims0: int,
    bias: float,
    inside_outside: bool,
    weight_norm: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Geometric initialization exactly as base_networks.py:127-146.

    layer indexes 0..num_layers-2 (the reference's ``l``); dims0 is the input
    width of the whole MLP (for the skip-zeroing rule).
    """
    if layer == num_layers - 2:
        mean = np.sqrt(np.pi) / np.sqrt(d_in)
        if inside_outside:
            mean = -mean
            b_val = bias
        else:
            b_val = -bias
        w = mean + 1e-4 * rng.standard_normal((d_out, d_in))
        b = np.full((d_out,), b_val, dtype=np.float32)
    elif multires > 0 and layer == 0:
        w = np.zeros((d_out, d_in), dtype=np.float32)
        std = np.sqrt(2.0) / np.sqrt(d_out)
        w[:, :3] = std * rng.standard_normal((d_out, 3))
        b = np.zeros((d_out,), dtype=np.float32)
    elif multires > 0 and skip_layer:
        std = np.sqrt(2.0) / np.sqrt(d_out)
        w = std * rng.standard_normal((d_out, d_in))
        w[:, -(dims0 - 3):] = 0.0
        b = np.zeros((d_out,), dtype=np.float32)
    else:
        std = np.sqrt(2.0) / np.sqrt(d_out)
        w = std * rng.standard_normal((d_out, d_in))
        b = np.zeros((d_out,), dtype=np.float32)
    return _wrap_weight_norm(w.astype(np.float32), b.astype(np.float32), weight_norm)


def softplus_beta100(x: jnp.ndarray) -> jnp.ndarray:
    """nn.Softplus(beta=100) with torch's linear-above-threshold behavior
    (threshold=20 on beta*x)."""
    bx = 100.0 * x
    return jnp.where(bx > 20.0, x, jax.nn.softplus(bx) / 100.0)
