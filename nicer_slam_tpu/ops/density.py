"""SDF -> density conversion (reference: code/model/density.py).

Two production variants:
  * LaplaceDensity (density.py:16-29): α·CDF_Laplace(-sdf) with a learned β
    (``|β|+β_min``).
  * GridPredefineDensity (density.py:33-67): β is a function of a 64³ voxel
    visit counter — voxels mapped more often get a sharper (smaller) β:
    ``β(x) = a·exp(−b·1e−4·count(x)·d) + c`` with the reference's constants
    (density.py:56-59). Points within 0.01 of the unit-cube boundary
    (|x_dim|>0.99) get count 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# constants from density.py:56-59
BETA_A = 0.01207724805
BETA_B = 0.0116544676
BETA_C = 0.0023639156
BETA_D = 5.37538


def laplace_density(sdf: jnp.ndarray, beta: jnp.ndarray) -> jnp.ndarray:
    """α · (0.5 + 0.5·sign(sdf)·expm1(−|sdf|/β)), α = 1/β (density.py:21-25)."""
    alpha = 1.0 / beta
    return alpha * (0.5 + 0.5 * jnp.sign(sdf) * jnp.expm1(-jnp.abs(sdf) / beta))


def learned_beta(beta_param: jnp.ndarray, beta_min: float = 1e-4) -> jnp.ndarray:
    return jnp.abs(beta_param) + beta_min


def voxel_counts_at(voxels: jnp.ndarray, x: jnp.ndarray,
                    voxel_res: int = 64) -> jnp.ndarray:
    """Visit count per point [N] from the 64³ counter; boundary points
    (any |x_d| > 0.99) get 0 (density.py:43-55)."""
    boundary = jnp.any(jnp.abs(x) > 0.99, axis=-1)
    u = (x + 1.0) / 2.0
    idx = jnp.clip((u * voxel_res).astype(jnp.int32), 0, voxel_res - 1)
    counts = voxels[idx[:, 0], idx[:, 1], idx[:, 2]]
    return jnp.where(boundary, 0.0, counts)


def grid_predefined_beta(voxels: jnp.ndarray, x: jnp.ndarray,
                         voxel_res: int = 64) -> jnp.ndarray:
    """β per point [N,1] from the voxel counter (density.py:56-60)."""
    count = voxel_counts_at(voxels, x, voxel_res)
    beta = BETA_A * jnp.exp(-BETA_B * 1e-4 * count * BETA_D) + BETA_C
    return beta[:, None]


def grid_predefined_density(sdf: jnp.ndarray, x: jnp.ndarray,
                            voxels: jnp.ndarray,
                            voxel_res: int = 64) -> jnp.ndarray:
    beta = grid_predefined_beta(voxels, x, voxel_res)
    return laplace_density(sdf, beta)


def update_voxels(voxels: jnp.ndarray, x: jnp.ndarray,
                  voxel_res: int = 64) -> jnp.ndarray:
    """Scatter-add visit counts (network.py:62-76). Deterministic on TPU
    (XLA scatter-add), unlike the reference's fp atomics."""
    x = jax.lax.stop_gradient(x)
    boundary = jnp.any(jnp.abs(x) > 0.99, axis=-1)
    u = (x + 1.0) / 2.0
    idx = jnp.clip((u * voxel_res).astype(jnp.int32), 0, voxel_res - 1)
    ones = jnp.where(boundary, 0.0, 1.0)
    return voxels.at[idx[:, 0], idx[:, 1], idx[:, 2]].add(ones)
