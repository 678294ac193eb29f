"""NaN-safe norm/normalize.

torch defines the subgradient of ||x|| at 0 as 0; JAX's sqrt gives NaN.
Rays entirely in free space produce exactly-zero compositing weights (the
Laplace density underflows), making normal_map/smooth-loss differences
exactly zero — these helpers keep the gradients finite (and zero) there,
matching the reference's torch behavior.
"""

from __future__ import annotations

import jax.numpy as jnp


def safe_norm(x: jnp.ndarray, axis=-1, keepdims: bool = False) -> jnp.ndarray:
    sq = (x * x).sum(axis=axis, keepdims=keepdims)
    zero = sq <= 1e-30
    sq_safe = jnp.where(zero, 1.0, sq)
    return jnp.where(zero, 0.0, jnp.sqrt(sq_safe))


def safe_normalize(x: jnp.ndarray, axis=-1, eps: float = 1e-12) -> jnp.ndarray:
    n = safe_norm(x, axis=axis, keepdims=True)
    return x / (n + eps)
