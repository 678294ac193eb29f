"""Per-frame tracking noise-floor measurement (round-4 drift diagnosis).

Finding that motivated this tool: on the 1000-frame slow-motion run
(LONG_SEQ_r04.json) the estimated trajectory moves ~0.020/frame while GT
moves 0.00115/frame — an ~18x per-frame jitter floor that dominates ATE at
Replica-matched motion. Hypothesis: Adam's step size (~cam_lr per iter,
regardless of gradient magnitude) sets that floor: the long-seq config
tracked at lr=0.01 with StepLR(50, 0.95), which decays the step to only
0.0095 by iter 60.

Protocol: resume a trained run's checkpoint (map frozen), then track ONE
frame repeatedly under different RNG seeds per tracker config. Metrics per
config:
  * spread  — std of the converged camera position across seeds (pure
              stochastic jitter; independent of map<->GT misalignment)
  * acc_t/acc_r — error vs the local-frame target pose
              c2w_299 @ (gt_299^-1 @ gt_300) (camera-frame relative GT
              motion, valid under world-frame drift)
  * wander  — distance moved when initialized AT the target (a perfect
              tracker stays put)

Reference behavior being diagnosed: volsdf_train.py:396-446 (Adam(lr) +
StepLR(50, 0.95) + min-loss candidate over resampled 1024-pixel batches).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--conf", required=True,
                   help="conf of the trained run to post-mortem")
    p.add_argument("--root", required=True,
                   help="run root containing exps/ (resumed is_continue)")
    p.add_argument("--frame", type=int, default=300)
    p.add_argument("--seeds", type=int, default=5)
    p.add_argument("--out", default="/tmp/track_noise.json")
    p.add_argument("--variants", default=None,
                   help="comma list of variant names to run (default all)")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/nicer_slam_tpu_jax_cache")
    import jax.numpy as jnp
    import numpy as np

    from nicer_slam_tpu.slam.runner import SLAMRunner
    from nicer_slam_tpu.slam.tracking import TrackConfig, track_frame
    from nicer_slam_tpu.utils.camera import (camera_from_tensor_np,
                                             tensor_from_camera_np)

    r = SLAMRunner(conf=args.conf, root_dir=args.root, is_continue=True,
                   quiet=True)
    f = args.frame
    assert f <= r.start_frame_idx, (
        f"checkpoint only reaches frame {r.start_frame_idx}")

    if r.density_cache is not None:
        r.density_cache = r._refresh_cache(r.params, r.voxels)
    r._stage_frame(f)
    row = r.store.row(f)
    K = jnp.asarray(r.dataset.intrinsics_all[f])

    prev = np.asarray(r.est_pose_all[f - 1], np.float64)
    gt_prev = np.asarray(r.dataset.gt_pose_all[f - 1], np.float64)
    gt_cur = np.asarray(r.dataset.gt_pose_all[f], np.float64)
    # camera-frame relative GT motion applied to the drifted previous pose
    target = prev @ (np.linalg.inv(gt_prev) @ gt_cur)
    init_prev_q = tensor_from_camera_np(prev.astype(np.float32))
    init_tgt_q = tensor_from_camera_np(target.astype(np.float32))

    base = r.track_cfg
    variants = {
        # the long-seq run's own config
        "base60_lr01": base._replace(num_iters=60, cam_lr=0.01),
        # exact reference replica tracking regime
        "ref100_lr005": base._replace(num_iters=100, cam_lr=0.005),
        # geometric lr anneal: same start, final lr ~8e-5
        "anneal60_lr01": base._replace(num_iters=60, cam_lr=0.01,
                                       lr_step_size=8, lr_gamma=0.5),
        "anneal100_lr005": base._replace(num_iters=100, cam_lr=0.005,
                                         lr_step_size=12, lr_gamma=0.5),
        # more pixels per iter (less minibatch noise, same lr)
        "pix4096_lr01": base._replace(num_iters=60, cam_lr=0.01,
                                      num_pixels=4096),
        # anneal + more pixels
        "anneal60_pix2048": base._replace(num_iters=60, cam_lr=0.01,
                                          num_pixels=2048,
                                          lr_step_size=8, lr_gamma=0.5),
        # rotation-dim lr scaling on top of the anneal: quaternion jitter
        # costs more error per unit than translation (rot noise floor)
        "anneal100_rot025": base._replace(num_iters=100, cam_lr=0.005,
                                          lr_step_size=12, lr_gamma=0.5,
                                          rot_lr_scale=0.25),
        "anneal100_rot01": base._replace(num_iters=100, cam_lr=0.005,
                                         lr_step_size=12, lr_gamma=0.5,
                                         rot_lr_scale=0.1),
        # constant-velocity motion prior on top of the anneal. Selection
        # criterion (honesty guard — the synthetic orbit IS constant
        # velocity, so a clamp-strength prior would trivially win here
        # but be benchmark-fitting): pick the largest weight whose
        # PREV-init acc_t/acc_r stays at the no-prior level (photometric
        # signal still overcomes the prior and moves the full GT step)
        # while TARGET-init wander drops (noise-floor walk is damped).
        "anneal100_mp300": base._replace(num_iters=100, cam_lr=0.005,
                                         lr_step_size=12, lr_gamma=0.5,
                                         motion_prior_w=300.0,
                                         motion_prior_rot_w=30.0),
        "anneal100_mp1000": base._replace(num_iters=100, cam_lr=0.005,
                                          lr_step_size=12, lr_gamma=0.5,
                                          motion_prior_w=1000.0,
                                          motion_prior_rot_w=100.0),
        # decoupled spring (AdamW-style): guaranteed fractional pullback
        # per iter — unlike the in-loss prior, Adam's per-dim gradient
        # normalization cannot neutralize it
        "anneal100_spring01": base._replace(num_iters=100, cam_lr=0.005,
                                            lr_step_size=12, lr_gamma=0.5,
                                            motion_prior_spring=0.1),
        "anneal100_spring03": base._replace(num_iters=100, cam_lr=0.005,
                                            lr_step_size=12, lr_gamma=0.5,
                                            motion_prior_spring=0.3),
    }
    if args.variants:
        sel = args.variants.split(",")
        unknown = [v for v in sel if v not in variants]
        assert not unknown, f"unknown variants: {unknown}"
        variants = {k: variants[k] for k in sel}

    def rot_angle_deg(Ra, Rb):
        tr = np.clip((np.trace(Ra.T @ Rb) - 1) / 2, -1, 1)
        return float(np.degrees(np.arccos(tr)))

    results = {"frame": f, "seeds": args.seeds,
               "gt_step": float(np.linalg.norm(gt_cur[:3, 3]
                                               - gt_prev[:3, 3])),
               "variants": {}}

    for name, cfg in variants.items():
        rec = {}
        for init_name, init_q in (("prev", init_prev_q),
                                  ("target", init_tgt_q)):
            t0 = time.time()
            qs = []
            for s in range(args.seeds):
                key = jax.random.PRNGKey(7919 * (s + 1))
                best_q, _, aux = track_frame(
                    r.scene_cfg, cfg, r.tracking_loss_cfg, r.params,
                    r.voxels, r.store.rgb[row], K,
                    jnp.asarray(init_q), key, r.density_cache)
                qs.append(np.asarray(best_q))
            poses = np.stack([camera_from_tensor_np(q) for q in qs])
            ts = poses[:, :3, 3]
            spread = float(np.linalg.norm(ts - ts.mean(0), axis=1).mean())
            acc_t = float(np.linalg.norm(ts - target[:3, 3], axis=1).mean())
            acc_r = float(np.mean([rot_angle_deg(P[:3, :3], target[:3, :3])
                                   for P in poses]))
            init_c2w = camera_from_tensor_np(np.asarray(init_q))
            wander = float(np.linalg.norm(
                ts - init_c2w[:3, 3], axis=1).mean())
            rec[init_name] = {
                "spread_t": spread, "acc_t": acc_t, "acc_r_deg": acc_r,
                "wander_t": wander,
                "wall_s": round(time.time() - t0, 1)}
            print(f"[{name}/{init_name}] spread={spread:.5f} "
                  f"acc_t={acc_t:.5f} acc_r={acc_r:.3f}deg "
                  f"wander={wander:.5f} ({rec[init_name]['wall_s']}s)",
                  flush=True)
        results["variants"][name] = rec
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=2)

    print(json.dumps(results, indent=2), flush=True)


if __name__ == "__main__":
    main()
