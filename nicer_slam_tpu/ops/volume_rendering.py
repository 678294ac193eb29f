"""SDF volume rendering compositing (reference: code/model/network.py:349-370).

Log-space alpha/transmittance compositing over per-ray z samples:
  free_energy_i = dist_i · density_i      (last dist = 1e10)
  alpha_i       = 1 − exp(−free_energy_i)
  T_i           = exp(−Σ_{j<i} free_energy_j)
  w_i           = alpha_i · T_i
"""

from __future__ import annotations

import jax.numpy as jnp


def render_weights(z_vals: jnp.ndarray, density: jnp.ndarray) -> jnp.ndarray:
    """[R,S] z values + [R,S] densities -> [R,S] compositing weights."""
    dists = z_vals[:, 1:] - z_vals[:, :-1]
    dists = jnp.concatenate(
        [dists, jnp.full((dists.shape[0], 1), 1e10, dtype=z_vals.dtype)], axis=-1)
    free_energy = dists * density
    shifted = jnp.concatenate(
        [jnp.zeros((dists.shape[0], 1), dtype=z_vals.dtype), free_energy[:, :-1]],
        axis=-1)
    alpha = 1.0 - jnp.exp(-free_energy)
    transmittance = jnp.exp(-jnp.cumsum(shifted, axis=-1))
    return alpha * transmittance
