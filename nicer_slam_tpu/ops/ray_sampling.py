"""Ray sampling: stratified uniform + CDF importance sampling.

Behavioral reference: cvg/nicer-slam ``code/model/ray_sampler.py``:
  * UniformSampler (``:16-61``): near from conf, far from axis-aligned cube
    intersection; stratified jitter during training.
  * ImportantSampler (``:64-166``): 640-sample no-grad SDF prepass →
    alpha/transmittance weights → inverse-CDF resample 64 + 32 random extras
    + near/far columns, sorted; plus one random z per ray as eikonal anchor.

All functions are shape-static and jit-safe; randomness flows through
explicit PRNG keys (the per-iteration resampling of the reference becomes
``jax.random.fold_in`` in the callers).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..utils.camera import near_far_from_cube


class SamplerConfig(NamedTuple):
    scene_bounding_sphere: float = 1.0
    near: float = 0.0
    N_samples: int = 64
    N_samples_eval: int = 640
    N_samples_extra: int = 32
    # rays per sequential prepass chunk (lax.map): bounds the peak HBM of
    # the 640-sample no-grad SDF prepass (N_eval x R points). 0 = no chunking.
    prepass_ray_chunk: int = 1024
    # "exact": evaluate the full SDF network for every prepass sample (the
    # reference's behavior, ray_sampler.py:100-112) — the DEFAULT so that
    # unconfigured runs match the reference. "cached": read a periodically
    # refreshed dense density cache — ONE gather per sample instead of
    # ~256, the difference between ~10s and ~0.3s per mapping iteration on
    # TPU (the prepass only PLACES samples; the main pass still evaluates
    # the exact network at the chosen z). Shipped confs opt into "cached"
    # explicitly; on the 9-frame synthetic probe cached+per-track-refresh
    # measured BETTER ATE than exact (0.0070 vs 0.0154, BASELINE.md) at a
    # fraction of the cost.
    prepass_mode: str = "exact"
    prepass_cache_res: int = 128

    @property
    def far(self) -> float:
        return 2.0 * self.scene_bounding_sphere

    @property
    def uniform_far(self) -> float:
        # UniformSampler(take_sphere_intersection=True) default far
        # (ray_sampler.py:18): 2 * bound * 1.75
        return 2.0 * self.scene_bounding_sphere * 1.75

    @property
    def total_samples(self) -> int:
        return self.N_samples + self.N_samples_extra + 2


def uniform_z_vals(cfg: SamplerConfig, rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                   rng: jax.Array | None, training: bool):
    """Stratified uniform samples from cube intersection
    (ray_sampler.py:37-61). Returns (z_vals [R,Ne], near [R,1], far [R,1]).

    Rays are detached (ray_sampler.py:38-39): z values never carry pose
    gradients; pose gradients flow only through point positions."""
    rays_o = jax.lax.stop_gradient(rays_o)
    rays_d = jax.lax.stop_gradient(rays_d)
    _, far = near_far_from_cube(rays_o, rays_d,
                                bound=cfg.scene_bounding_sphere,
                                near_min=cfg.near, far_max=cfg.uniform_far)
    near = jnp.full_like(far, cfg.near)
    t = jnp.linspace(0.0, 1.0, cfg.N_samples_eval, dtype=rays_o.dtype)
    z_vals = near * (1.0 - t) + far * t
    if training:
        mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        upper = jnp.concatenate([mids, z_vals[..., -1:]], -1)
        lower = jnp.concatenate([z_vals[..., :1], mids], -1)
        t_rand = jax.random.uniform(rng, z_vals.shape, dtype=z_vals.dtype)
        z_vals = lower + (upper - lower) * t_rand
    return z_vals, near, far


def _sample_cdf(bins: jnp.ndarray, weights: jnp.ndarray, n: int) -> jnp.ndarray:
    """Deterministic inverse-CDF sampling with u = linspace(0,1,n)
    (ray_sampler.py:114-139)."""
    pdf = weights[..., :-1] + 1e-5
    pdf = pdf / jnp.sum(pdf, -1, keepdims=True)
    cdf = jnp.cumsum(pdf, -1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)  # [R, Ne]

    u = jnp.linspace(0.0, 1.0, n, dtype=bins.dtype)
    u = jnp.broadcast_to(u, (cdf.shape[0], n))

    inds = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, cdf.shape[-1] - 1)

    cdf_g0 = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_g1 = jnp.take_along_axis(cdf, above, axis=-1)
    bins_g0 = jnp.take_along_axis(bins, below, axis=-1)
    bins_g1 = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_g1 - cdf_g0
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_g0) / denom
    return bins_g0 + t * (bins_g1 - bins_g0)


def importance_z_vals(
    cfg: SamplerConfig,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    sdf_fn: Callable[[jnp.ndarray], jnp.ndarray],
    density_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    rng: jax.Array,
    training: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The ImportantSampler.get_z_vals pipeline (ray_sampler.py:90-166).

    sdf_fn: [N,3] -> [N] or [N,1] SDF (evaluated under stop_gradient).
    density_fn: (sdf [N], pts [N,3]) -> density [N].
    Returns (z_vals [R, N+extra+2] sorted, z_eik [R,1]).
    """
    k_strat, k_extra, k_eik = jax.random.split(rng, 3)
    z_vals, near, far = uniform_z_vals(cfg, rays_o, rays_d, k_strat, training)
    R, Ne = z_vals.shape

    pts = rays_o[:, None, :] + z_vals[..., None] * rays_d[:, None, :]
    pts_flat = jax.lax.stop_gradient(pts.reshape(-1, 3))
    sdf = jax.lax.stop_gradient(sdf_fn(pts_flat)).reshape(-1)
    density = density_fn(sdf, pts_flat).reshape(R, Ne)

    dists = z_vals[:, 1:] - z_vals[:, :-1]
    dists = jnp.concatenate([dists, jnp.full((R, 1), 1e10, z_vals.dtype)], -1)
    free_energy = dists * density
    shifted = jnp.concatenate([jnp.zeros((R, 1), z_vals.dtype),
                               free_energy[:, :-1]], -1)
    alpha = 1.0 - jnp.exp(-free_energy)
    transmittance = jnp.exp(-jnp.cumsum(shifted, -1))
    weights = alpha * transmittance

    z_samples = _sample_cdf(z_vals, weights, cfg.N_samples)

    if cfg.N_samples_extra > 0:
        if training:
            # one shared random subset of the eval bins for all rays
            # (ray_sampler.py:147-148 uses a single randperm)
            perm = jax.random.permutation(k_extra, Ne)[: cfg.N_samples_extra]
        else:
            perm = jnp.linspace(0, Ne - 1, cfg.N_samples_extra).astype(jnp.int32)
        z_vals_extra = jnp.concatenate([near, far, z_vals[:, perm]], -1)
    else:
        z_vals_extra = jnp.concatenate([near, far], -1)

    z_all = jnp.sort(jnp.concatenate([z_samples, z_vals_extra], -1), -1)

    # eikonal anchor: one random existing z per ray (ray_sampler.py:158-159)
    idx = jax.random.randint(k_eik, (R, 1), 0, z_all.shape[-1])
    z_eik = jnp.take_along_axis(z_all, idx, axis=-1)
    return z_all, z_eik
