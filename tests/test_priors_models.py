"""Shape tests for the DPT / GMFlow JAX architectures (numerical parity
pending converted weights — not fetchable in this offline environment)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.mark.slow
def test_dpt_shapes():
    from nicer_slam_tpu.models.dpt import dpt_forward, init_dpt

    p = init_dpt(out_channels=1)
    img = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (1, 128, 160, 3)).astype(np.float32))
    out = jax.jit(lambda pp, x: dpt_forward(pp, x))(p, img)
    assert out.shape == (1, 128, 160, 1)
    assert np.isfinite(np.asarray(out)).all()
    assert (np.asarray(out) >= 0).all()  # relu depth head

    p3 = init_dpt(out_channels=3)
    out3 = jax.jit(lambda pp, x: dpt_forward(pp, x, 3))(p3, img)
    assert out3.shape == (1, 128, 160, 3)
    assert (np.asarray(out3) >= 0).all() and (np.asarray(out3) <= 1).all()


@pytest.mark.slow
def test_gmflow_shapes():
    from nicer_slam_tpu.models.gmflow import gmflow_forward, init_gmflow

    p = init_gmflow()
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.uniform(0, 1, (1, 64, 96, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(0, 1, (1, 64, 96, 3)).astype(np.float32))
    flow = jax.jit(lambda pp, x, y: gmflow_forward(pp, x, y))(p, a, b)
    assert flow.shape == (1, 64, 96, 2)
    assert np.isfinite(np.asarray(flow)).all()


def test_checkpoint_flat_loader(tmp_path):
    from nicer_slam_tpu.models.dpt import _load_flat_into

    params = {"a": {"b": [jnp.zeros((2,)), jnp.zeros((3,))]},
              "c": jnp.zeros((4,))}
    np.savez(tmp_path / "w.npz", **{"a/b/0": np.ones(2), "c": np.full(4, 7.0)})
    data = np.load(tmp_path / "w.npz")
    out = _load_flat_into(params, data)
    np.testing.assert_array_equal(np.asarray(out["a"]["b"][0]), np.ones(2))
    np.testing.assert_array_equal(np.asarray(out["c"]), np.full(4, 7.0))
    np.testing.assert_array_equal(np.asarray(out["a"]["b"][1]), np.zeros(3))
