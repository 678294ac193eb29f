"""NeRF-style positional encoding (reference: code/model/embedder.py).

The reference's Embedder with log-sampled frequency bands
(embedder.py:12-37): output = [x, sin(x·2^0), cos(x·2^0), ..., sin(x·2^(m-1)),
cos(x·2^(m-1))] — note sin/cos interleave per frequency, input included first.
Gaussian Fourier features (embedder.py:40-68) are also provided for the
"fourier" embedding_method config value.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def positional_encoding_dim(multires: int, input_dims: int = 3) -> int:
    return input_dims * (1 + 2 * multires)


def positional_encoding(x: jnp.ndarray, multires: int) -> jnp.ndarray:
    """[..., D] -> [..., D*(1+2*multires)], matching embedder.py ordering:
    identity first, then (sin, cos) per frequency 2^0..2^(multires-1)."""
    if multires <= 0:
        return x
    freqs = 2.0 ** jnp.arange(multires, dtype=x.dtype)
    parts = [x]
    for i in range(multires):
        xf = x * freqs[i]
        parts.append(jnp.sin(xf))
        parts.append(jnp.cos(xf))
    return jnp.concatenate(parts, axis=-1)


def positional_encoding_grad_contract(x: jnp.ndarray, multires: int,
                                      cot: jnp.ndarray) -> jnp.ndarray:
    """Contract a cotangent over PE outputs with the analytic PE Jacobian:
    ``sum_j cot_j * dPE_j/dx`` -> [..., D].

    PE's Jacobian is block-diagonal (each output depends on exactly one
    input dim), so this is elementwise — no [N, d_pe, D] materialization.
    Used by the analytic-gradient field path (fields.py) alongside the hash
    encoder's cached dy_dx.
    """
    if multires <= 0:
        return cot
    D = x.shape[-1]
    c = cot.reshape(*x.shape[:-1], 1 + 2 * multires, D)
    g = c[..., 0, :]
    for i in range(multires):
        f = 2.0 ** i
        xf = x * f
        g = g + c[..., 1 + 2 * i, :] * (f * jnp.cos(xf))
        g = g + c[..., 2 + 2 * i, :] * (-f * jnp.sin(xf))
    return g


def init_fourier_features(rng: jax.Array, num_input_channels: int = 3,
                          mapping_size: int = 93, scale: float = 25.0) -> jnp.ndarray:
    return jax.random.normal(rng, (num_input_channels, mapping_size)) * scale


def fourier_features(x: jnp.ndarray, B: jnp.ndarray,
                     include_input: bool = True) -> jnp.ndarray:
    y = jnp.sin(x @ B)
    if include_input:
        return jnp.concatenate([x, y], axis=-1)
    return y
