import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nicer_slam_tpu.ops import density as dens
from nicer_slam_tpu.ops.ray_sampling import SamplerConfig, importance_z_vals, uniform_z_vals
from nicer_slam_tpu.ops.volume_rendering import render_weights


def test_laplace_density_monotone_and_limits():
    sdf = jnp.linspace(-0.5, 0.5, 101)
    beta = jnp.asarray(0.1)
    d = np.asarray(dens.laplace_density(sdf, beta))
    assert np.all(np.diff(d) <= 1e-6)  # decreasing in sdf
    np.testing.assert_allclose(d[0], 1.0 / 0.1, rtol=1e-2)  # deep inside -> alpha
    assert d[-1] < 0.1  # far outside -> ~0
    np.testing.assert_allclose(
        float(dens.laplace_density(jnp.asarray(0.0), beta)), 0.5 / 0.1, rtol=1e-5)


def test_grid_beta_formula_and_boundary():
    voxels = jnp.zeros((64, 64, 64))
    voxels = voxels.at[32, 32, 32].set(1000.0)
    x_in = jnp.array([[0.01, 0.01, 0.01]])     # maps to voxel 32
    x_edge = jnp.array([[0.995, 0.0, 0.0]])    # boundary -> count 0
    b_in = float(dens.grid_predefined_beta(voxels, x_in)[0, 0])
    b_edge = float(dens.grid_predefined_beta(voxels, x_edge)[0, 0])
    a, b, c, d = dens.BETA_A, dens.BETA_B, dens.BETA_C, dens.BETA_D
    np.testing.assert_allclose(b_in, a * np.exp(-b * 1e-4 * 1000 * d) + c, rtol=1e-5)
    np.testing.assert_allclose(b_edge, a + c, rtol=1e-5)
    assert b_in < b_edge  # more visits -> sharper density


def test_update_voxels_counts():
    voxels = jnp.zeros((64, 64, 64))
    pts = jnp.array([[0.0, 0.0, 0.0]] * 5 + [[0.999, 0.0, 0.0]] * 3)
    v = dens.update_voxels(voxels, pts)
    assert float(v[32, 32, 32]) == 5.0
    assert float(v.sum()) == 5.0  # boundary points not counted


def test_render_weights_opaque_wall():
    """Golden: a hard density step at z=1 puts all weight at the wall."""
    z = jnp.linspace(0.1, 2.0, 100)[None, :]
    density = jnp.where(z >= 1.0, 1000.0, 0.0)
    w = np.asarray(render_weights(z, density))
    assert w.shape == (1, 100)
    hit = int(np.argmax(w[0]))
    np.testing.assert_allclose(float(z[0, hit]), 1.0, atol=0.03)
    np.testing.assert_allclose(w.sum(), 1.0, atol=1e-3)
    assert np.all(w[0, : hit - 1] < 1e-4)


def test_render_weights_empty_space_tail():
    """Zero density -> zero weights; near-zero density -> the 1e10 tail
    distance (network.py:357) pushes all weight onto the LAST sample."""
    z = jnp.linspace(0.1, 2.0, 50)[None, :]
    w0 = np.asarray(render_weights(z, jnp.zeros_like(z)))
    assert w0.sum() == 0.0
    w1 = np.asarray(render_weights(z, jnp.full_like(z, 1e-4)))
    assert w1[0, :-1].sum() < 0.01
    np.testing.assert_allclose(w1[0, -1], 1.0, atol=0.01)


def test_uniform_sampler_far_from_cube(rng):
    cfg = SamplerConfig(scene_bounding_sphere=1.0, N_samples_eval=64)
    o = jnp.array([[0.0, 0.0, -0.5]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    z, near, far = uniform_z_vals(cfg, o, d, rng, training=False)
    np.testing.assert_allclose(float(far[0, 0]), 1.5, atol=1e-5)  # exits cube
    np.testing.assert_allclose(float(z[0, -1]), 1.5, atol=1e-5)
    assert float(near[0, 0]) == 0.0


def test_importance_sampler_concentrates_near_surface(rng):
    """Analytic sphere SDF of radius 0.5: samples should cluster at the
    first surface crossing along the ray."""
    cfg = SamplerConfig(N_samples=64, N_samples_eval=128, N_samples_extra=32)
    o = jnp.tile(jnp.array([[0.0, 0.0, -0.9]]), (4, 1))
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (4, 1))

    def sdf_fn(pts):
        return jnp.linalg.norm(pts, axis=-1) - 0.5

    def density_fn(sdf, pts):
        return dens.laplace_density(sdf, jnp.asarray(0.02))

    z, z_eik = importance_z_vals(cfg, o, d, sdf_fn, density_fn, rng,
                                 training=False)
    assert z.shape == (4, cfg.total_samples)
    assert np.all(np.diff(np.asarray(z), axis=-1) >= 0)  # sorted
    # surface at z = 0.4; most CDF samples should land within +-0.1
    frac_near = float(((z > 0.3) & (z < 0.5)).mean())
    assert frac_near > 0.45
    assert z_eik.shape == (4, 1)


def test_importance_sampler_shapes_and_grad_isolation(rng):
    """The prepass must be stop-gradiented: grads of z wrt a net param used
    only in sdf_fn must be zero (ray_sampler.py:101-102)."""
    cfg = SamplerConfig(N_samples=8, N_samples_eval=16, N_samples_extra=4)
    o = jnp.zeros((2, 3))
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (2, 1))

    def loss(w):
        def sdf_fn(pts):
            return jnp.linalg.norm(pts, axis=-1) - w

        def density_fn(sdf, pts):
            return dens.laplace_density(sdf, jnp.asarray(0.05))

        z, _ = importance_z_vals(cfg, o, d, sdf_fn, density_fn, rng,
                                 training=True)
        return z.sum()

    g = jax.grad(loss)(jnp.asarray(0.5))
    # sdf prepass is stop_gradiented, but density weights feed the CDF which
    # feeds z — the reference keeps that path non-differentiable too since
    # torch.searchsorted/gather of detached bins. Our CDF interpolation is
    # differentiable through the weights; the prepass sdf stop_gradient
    # removes the parameter dependence entirely here.
    assert float(jnp.abs(g)) < 1e-6
