"""Standalone 1-vs-8-device map_step equivalence check (SURVEY.md §4 item 4).

Run as a SCRIPT in a fresh interpreter: `python tests/_multichip_equiv_main.py`.
test_multichip.py spawns it as a subprocess — this exact computation has
repeatedly aborted inside XLA:CPU (SIGABRT in jax Array._value) when executed
late in the full pytest suite, while passing deterministically in a fresh
process; process isolation makes the suite robust to that runtime state
sensitivity. Any np.testing assertion failure exits nonzero and the parent
test surfaces this script's stderr.
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
    from nicer_slam_tpu.models.losses import loss_config_from_conf
    from nicer_slam_tpu.parallel.mesh import make_mesh, ray_sharding
    from nicer_slam_tpu.slam.mapping import MapBatchRefs, MapConfig, map_step
    from nicer_slam_tpu.slam.state import OptimConfig, make_optimizer
    from nicer_slam_tpu.utils.camera import tensor_from_camera_np

    from nicer_slam_tpu import config as cm
    from nicer_slam_tpu.models import scene_model as sm

    conf = cm.parse_file(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "confs", "replica", "runconf_replica_2.conf"))
    model_conf = conf.get_config("model")
    biggrid = bool(os.environ.get("NICER_EQUIV_BIGGRID"))
    if biggrid:
        # Big-grid mode: keep the color hash grid ON but shrunk to CPU
        # scale, and lower the sorted-backward threshold so the encode
        # routes through _grid_corner_values — its custom_vjp (ONE sort +
        # indices_are_sorted scatter-add) is the one gradient path the
        # standard equivalence run never exercises under GSPMD
        # (hash_encoder.py sorted-backward block). color_stage="highfreq"
        # below means the grid is NOT detached, so the vjp runs.
        from nicer_slam_tpu.ops import hash_encoder as he
        he.SORTED_BWD_MIN_ENTRIES = 1 << 12
        model_conf.put("rendering_network.use_grid_feature", True)
        model_conf.put("rendering_network.color_num_levels", 4)
        model_conf.put("rendering_network.color_logmap", 13)
        model_conf.put("rendering_network.color_desired_res", 64)
    else:
        model_conf.put("rendering_network.use_grid_feature", False)
    # lighter sampling, same semantics: the virtual 8-device mesh runs its
    # partitions as threads on however few host cores exist; XLA:CPU's
    # collective rendezvous hard-aborts (rendezvous.cc, 40 s) if a partition
    # is still grinding through the 640-sample prepass when the all-gather
    # fires. Equivalence is about sharding+collective correctness, not
    # sample counts.
    model_conf.put("ray_sampler.N_samples_eval", 96)
    model_conf.put("ray_sampler.N_samples", 32)
    model_conf.put("ray_sampler.N_samples_extra", 16)
    H, W = 48, 64
    scene_cfg = sm.scene_config_from_conf(model_conf, (H, W), 8)
    params = sm.init_scene_params(np.random.default_rng(0), scene_cfg)
    voxels = sm.init_voxels(scene_cfg)
    loss_cfg = loss_config_from_conf(conf.get_config("loss"))
    optimizer = make_optimizer(OptimConfig(learning_rate=2e-3), params)
    opt_state = optimizer.init(params)

    HW = H * W
    Smax, Emax, R = 6, 4, 256
    map_cfg = MapConfig(num_pixels=R, max_slots=Smax, max_edges=Emax)

    rng = np.random.default_rng(1)
    store_rgb = jnp.asarray(rng.integers(0, 255, (Smax, HW, 3), np.uint8))
    store_depth = jnp.asarray(rng.uniform(0.1, 1, (Smax, HW)).astype(np.float16))
    store_normal = jnp.asarray(rng.normal(size=(Smax, HW, 3)).astype(np.float16))
    store_gt_depth = jnp.asarray(rng.uniform(0.1, 1, (Smax, HW)).astype(np.float16))
    store_mask = jnp.ones((Smax, HW), bool)

    poses_q = np.zeros((Smax, 7), np.float32)
    for s in range(Smax):
        pose = np.eye(4, dtype=np.float32)
        pose[2, 3] = -0.3 + 0.01 * s
        poses_q[s] = tensor_from_camera_np(pose)
    poses_q = jnp.asarray(poses_q)
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = 55.0
    K[0, 2], K[1, 2] = W / 2, H / 2

    refs = MapBatchRefs(
        slot_rows=jnp.arange(Smax, dtype=jnp.int32),
        frame_ids=jnp.arange(Smax, dtype=jnp.int32),
        n_valid=jnp.asarray(Smax, jnp.int32),
        intrinsics=jnp.tile(jnp.asarray(K)[None], (Smax, 1, 1)),
        edge_idii=jnp.asarray([0, 1, 2, 3], jnp.int32),
        edge_idjj=jnp.asarray([1, 2, 3, 0], jnp.int32),
        edge_valid=jnp.ones((Emax,), bool),
        flow_imgs=jnp.asarray(rng.normal(size=(Emax, HW, 2)).astype(np.float16)),
        flow_occ=jnp.ones((Emax, HW), bool),
    )

    key = jax.random.PRNGKey(7)

    def run(shard):
        # map_step donates params/opt_state/voxels — pass fresh copies
        p = jax.tree.map(jnp.copy, params)
        o = jax.tree.map(jnp.copy, opt_state)
        v = jnp.copy(voxels)
        return map_step(
            scene_cfg, map_cfg, loss_cfg, p, o, v, optimizer,
            poses_q, refs,
            store_rgb, store_depth, store_normal, store_gt_depth, store_mask,
            key, stage="fine", color_stage="highfreq", ba=True,
            is_first_frame=False, use_flow=True, shard_rays=shard)

    p1, _, v1, q1, t1 = run(None)
    # Mesh width: 8 where the host can run 8 partition threads without
    # starving XLA:CPU's collective rendezvous (each virtual device's
    # partition runs on its own thread; on a 1-core host 8 threads routinely
    # miss the rendezvous and the process hard-aborts in rendezvous.cc).
    # Narrow hosts fall back to 2 shards — identical GSPMD partitioning +
    # psum math, reduced width. NICER_EQUIV_DEVICES overrides. The width
    # that actually ran is recorded in the OK line the parent test checks.
    n_dev = int(os.environ.get("NICER_EQUIV_DEVICES",
                               8 if (os.cpu_count() or 1) >= 4 else 2))
    mesh = make_mesh(n_dev)
    with mesh:
        p8, _, v8, q8, t8 = run(ray_sharding(mesh))

    loss1, loss8 = float(t1["loss"]), float(t8["loss"])
    assert np.isfinite(loss1)
    np.testing.assert_allclose(loss8, loss1, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(q8), np.asarray(q1),
                               rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v8), np.asarray(v1))

    # parameter UPDATES must agree to fp tolerance (they're tiny relative to
    # the params, so compare update vectors, not the updated params)
    flat1 = jax.tree.leaves(jax.tree.map(lambda a, b: a - b, p1, params))
    flat8 = jax.tree.leaves(jax.tree.map(lambda a, b: a - b, p8, params))
    for a, b in zip(flat1, flat8):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-8)
        np.testing.assert_allclose(b, a, rtol=0, atol=5e-3 * scale)

    if biggrid:
        # prove the run actually took the sorted-backward route
        from nicer_slam_tpu.ops import hash_encoder as he
        spec = scene_cfg.render.hash_spec()
        assert he.SORTED_BWD and max(
            spec.offsets[l + 1] - spec.offsets[l]
            for l in range(spec.num_levels)) >= he.SORTED_BWD_MIN_ENTRIES, \
            "big-grid mode did not reach the sorted-backward threshold"
    print(f"EQUIVALENCE OK n_devices={n_dev} biggrid={int(biggrid)} "
          f"loss1={loss1:.6f} lossN={loss8:.6f}")


if __name__ == "__main__":
    main()
