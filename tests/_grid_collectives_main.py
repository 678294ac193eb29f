"""Standalone equivalence check for the big-grid multi-chip collective
modes (hash_encoder GRID_COLLECTIVE_MODE): replicated vs bf16-psum vs
sharded-table, on the 8-device virtual CPU mesh.

Run as a SCRIPT in a fresh interpreter (the XLA:CPU collective rendezvous
is load-sensitive late in a pytest run — same isolation rationale as
_multichip_equiv_main.py). Any assertion failure exits nonzero.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _jax_cpu_env import setup_cpu_jax  # noqa: E402

setup_cpu_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from nicer_slam_tpu.ops import hash_encoder as he
    from nicer_slam_tpu.parallel.mesh import make_mesh

    # CPU-scale "big" grid: the top hashed levels cross the lowered
    # thresholds so the encode routes through _grid_corner_values and the
    # collective modes actually engage.
    he.SORTED_BWD_MIN_ENTRIES = 1 << 12
    he.GRID_SHARD_MIN_ENTRIES = 1 << 12
    spec = he.make_spec(3, num_levels=4, level_dim=2, base_resolution=8,
                        log2_hashmap_size=13, desired_resolution=64)
    n_dev = int(os.environ.get("NICER_EQUIV_DEVICES",
                               8 if (os.cpu_count() or 1) >= 4 else 2))
    N = 64 * n_dev
    assert spec.total_entries % n_dev == 0, (
        f"test spec T={spec.total_entries} must divide the mesh ({n_dev})")

    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.uniform(-1e-2, 1e-2,
                                  (spec.level_dim, spec.total_entries))
                      .astype(np.float32))
    x = jnp.asarray(rng.uniform(-0.9, 0.9, (N, 3)).astype(np.float32))
    w_out = jnp.asarray(rng.normal(size=(N, spec.output_dim))
                        .astype(np.float32))

    def loss_fn(e, x):
        return (he.hash_encode(spec, e, x) * w_out).sum()

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))

    # --- baseline: replicated, single logical device semantics -----------
    he.GRID_SHARD_MESH = None
    he.GRID_COLLECTIVE_MODE = "replicated"
    f0, g0 = grad_fn(emb, x)
    f0, g0 = float(f0), np.asarray(g0)
    assert np.isfinite(f0) and np.isfinite(g0).sum() == g0.size
    gscale = np.abs(g0).max()
    assert gscale > 0

    mesh = make_mesh(n_dev)

    def compiled_text(fn, *args):
        return fn.lower(*args).compile().as_text()

    # --- mode 1: bf16 gradient psum (table replicated) --------------------
    he.GRID_SHARD_MESH = mesh
    he.GRID_COLLECTIVE_MODE = "psum_bf16"
    assert he._collective_mode_applies(spec, "psum_bf16", N)
    grad_psum = jax.jit(jax.value_and_grad(loss_fn))
    f1, g1 = grad_psum(emb, x)
    f1, g1 = float(f1), np.asarray(g1)
    np.testing.assert_allclose(f1, f0, rtol=1e-5)   # forward untouched
    # bf16 all-reduce rounds each partial-table entry to 8 mantissa bits
    np.testing.assert_allclose(g1, g0, rtol=0, atol=4e-2 * gscale)
    hlo1 = compiled_text(grad_psum, emb, x)
    assert "all-reduce" in hlo1, "bf16 psum mode emitted no all-reduce"
    assert "bf16" in hlo1, "psum_bf16 mode runs no bf16 collective"

    # --- mode 2: sharded table, bf16 row all-gather + reduce-scatter ------
    he.GRID_COLLECTIVE_MODE = "sharded"
    assert he._collective_mode_applies(spec, "sharded", N)
    grad_shard = jax.jit(jax.value_and_grad(loss_fn))
    f2, g2 = grad_shard(emb, x)
    f2, g2 = float(f2), np.asarray(g2)
    # forward reads bf16 table rows (the reference's own half regime)
    np.testing.assert_allclose(f2, f0, rtol=0, atol=4e-3 * max(abs(f0), 1.0))
    np.testing.assert_allclose(g2, g0, rtol=0, atol=4e-2 * gscale)
    hlo2 = compiled_text(grad_shard, emb, x)
    assert "all-gather" in hlo2, "sharded mode emitted no row all-gather"
    assert ("reduce-scatter" in hlo2 or "all-reduce" in hlo2), \
        "sharded mode emitted no gradient reduction collective"

    # the table gradient arriving SHARDED is the HBM/ICI win — verify the
    # actual device layout, not just numerics
    g2_dev = jax.jit(lambda e, x: jax.grad(loss_fn)(e, x))(
        jax.device_put(emb, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(None, "rays"))), x)
    assert len(g2_dev.sharding.device_set) == n_dev

    he.GRID_SHARD_MESH = None
    he.GRID_COLLECTIVE_MODE = "replicated"
    print(f"GRID COLLECTIVES OK n_devices={n_dev} "
          f"T={spec.total_entries} f0={f0:.6f} "
          f"max|g_psum-g0|={np.abs(g1 - g0).max():.3e} "
          f"max|g_shard-g0|={np.abs(g2 - g0).max():.3e}")


if __name__ == "__main__":
    main()
