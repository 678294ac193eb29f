"""Ablation timing for the flagship mapping step: where do the 5.8 s/iter go?

Times map_step variants on the real TPU (stage/color_stage combinations,
grad vs forward-only, warp on/off, eikonal on/off) and prints a table.
Usage: python tools/perf_ablation.py [--iters 8] [--rays 8192]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--rays", type=int, default=8192)
    p.add_argument("--only", type=str, default="",
                   help="comma-separated substrings filtering variant names")
    a = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/nicer_slam_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from __graft_entry__ import _flagship_setup
    from nicer_slam_tpu.models import scene_model as sm
    from nicer_slam_tpu.models.losses import compute_losses, loss_config_from_conf
    from nicer_slam_tpu.utils.camera import camera_from_tensor, tensor_from_camera_np

    conf, scene_cfg, params, voxels = _flagship_setup(tiny=False, n_images=64)
    loss_cfg = loss_config_from_conf(conf.get_config("loss"))

    H, W = scene_cfg.H, scene_cfg.W
    HW = H * W
    R = a.rays
    Smax = 16

    rng = np.random.default_rng(0)
    store_rgb = jnp.asarray(rng.integers(0, 255, (Smax, HW, 3), np.uint8))
    store_depth = jnp.asarray(rng.uniform(0.01, 0.06, (Smax, HW)).astype(np.float16))
    store_normal = jnp.asarray(rng.normal(size=(Smax, HW, 3)).astype(np.float16))
    store_gt_depth = jnp.asarray(rng.uniform(0.2, 1.2, (Smax, HW)).astype(np.float16))
    store_mask = jnp.ones((Smax, HW), bool)
    poses_q = np.zeros((Smax, 7), np.float32)
    for s in range(Smax):
        pose = np.eye(4, dtype=np.float32)
        pose[2, 3] = -0.3 + 0.005 * s
        poses_q[s] = tensor_from_camera_np(pose)
    poses_q = jnp.asarray(poses_q)
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = 600.0
    K[0, 2], K[1, 2] = W / 2, H / 2
    intr = jnp.tile(jnp.asarray(K)[None], (Smax, 1, 1))

    cache_fn = jax.jit(lambda p, v: sm.build_density_cache(scene_cfg, p, v))
    density_cache = cache_fn(params, voxels)

    pix = jax.random.randint(jax.random.PRNGKey(1), (R,), 0, HW)
    slot = (jnp.arange(R, dtype=jnp.int32) * Smax) // R
    uv = jnp.stack([(pix % W).astype(jnp.float32),
                    (pix // W).astype(jnp.float32)], -1)
    rows = slot
    gt = {
        "rgb": store_rgb[rows, pix].astype(jnp.float32) / 255.0,
        "depth": store_depth[rows, pix].astype(jnp.float32)[:, None],
        "normal": store_normal[rows, pix].astype(jnp.float32),
        "gt_depth": store_gt_depth[rows, pix].astype(jnp.float32)[:, None],
        "mask": store_mask[rows, pix].astype(jnp.float32)[:, None],
    }
    slot_valid = jnp.ones((Smax,), bool)
    ray_valid = jnp.ones((R,), bool)
    frame_ids = jnp.arange(Smax, dtype=jnp.int32)

    def make_fn(stage, color_stage, grad, warp, cfg=scene_cfg, lcfg=loss_cfg,
                cache=True):
        full_rgb = store_rgb if (cfg.use_warp_loss and warp) else None
        cfg2 = cfg if warp else cfg._replace(use_warp_loss=False)

        def loss_fn(p):
            batch = sm.RayBatch(uv=uv, kf_slot=slot, poses=camera_from_tensor(poses_q),
                                intrinsics=intr, frame_ids=frame_ids,
                                slot_valid=slot_valid, ray_valid=ray_valid)
            out = sm.render_rays(cfg2, p, voxels, batch, jax.random.PRNGKey(2),
                                 stage=stage, color_stage=color_stage,
                                 training=True, is_mapping=True,
                                 full_rgb=full_rgb,
                                 density_cache=density_cache if cache else None)
            terms = compute_losses(lcfg, out, gt, batch, stage=stage,
                                   is_first_frame=False, num_slots=Smax)
            return terms["loss"]

        if grad:
            return jax.jit(jax.grad(loss_fn))
        return jax.jit(loss_fn)

    def timeit(fn, *args):
        out = fn(*args)
        jax.tree.map(lambda x: np.asarray(x).ravel()[0] if hasattr(x, "ravel") else x,
                     jax.tree.leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(a.iters):
            out = fn(*args)
        leaf = jax.tree.leaves(out)[0]
        float(np.asarray(leaf).ravel()[0])
        return (time.perf_counter() - t0) / a.iters

    variants = [
        ("fine/highfreq grad (full, = bench)", dict(stage="fine", color_stage="highfreq", grad=True, warp=True)),
        ("fine/highfreq fwd-only", dict(stage="fine", color_stage="highfreq", grad=False, warp=True)),
        ("fine/base grad", dict(stage="fine", color_stage="base", grad=True, warp=True)),
        ("coarse/base grad", dict(stage="coarse", color_stage="base", grad=True, warp=True)),
        ("fine/highfreq grad no-warp", dict(stage="fine", color_stage="highfreq", grad=True, warp=False)),
        ("fine/highfreq grad no-eik", dict(stage="fine", color_stage="highfreq", grad=True, warp=True,
                                            lcfg=loss_cfg._replace(eikonal_weight=0.0, smooth_weight=0.0))),
        ("fine/highfreq grad exact-prepass", dict(stage="fine", color_stage="highfreq", grad=True, warp=True,
                                                   cache=False)),
    ]
    if a.only:
        keys = [k.strip() for k in a.only.split(",") if k.strip()]
        variants = [(n, kw) for n, kw in variants
                    if any(k in n for k in keys)]
    print(f"R={R} iters={a.iters}", flush=True)
    for name, kw in variants:
        try:
            fn = make_fn(**kw)
            dt = timeit(fn, params)
            print(f"{name:42s} {dt*1000:9.1f} ms/iter  {R/dt:8.0f} rays/s",
                  flush=True)
        except Exception as e:  # keep going; report the failure
            print(f"{name:42s} FAILED: {e}", flush=True)


if __name__ == "__main__":
    main()
