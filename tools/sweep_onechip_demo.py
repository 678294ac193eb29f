"""Single-chip scene-parallel demonstration (VERDICT r4 item 6).

The 10x v5e-8 claim is based on scene-parallel scaling (one scene per
chip, zero collectives — BASELINE.md projection). Its single-chip
premise is that one SLAM scene does NOT saturate a chip (tracking is
1024-ray latency-bound work), so time-sharing a chip between two scenes
recovers real aggregate throughput. This tool measures exactly that on
ONE device:

  1. run scene A alone (wall_1)
  2. run scenes A+B concurrently on the same chip
     (sweep(scenes_per_device=2) -> wall_2)
  3. report the aggregate-throughput ratio  2 * wall_1 / wall_2
     (1.0 = no benefit, 2.0 = the chip was fully idle during a single
     scene; the scene-parallel projection assumes ~1.0 per extra CHIP,
     so any ratio > 1 here is upside on top of it)

Usage: python tools/sweep_onechip_demo.py [--frames 12] [--iters 20]
           [--out /tmp/sweep_onechip.json]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from convergence_probe import CONF_TEMPLATE, build_argparser  # noqa: E402
from sweep import sweep  # noqa: E402


def main():
    p = build_argparser()
    p.add_argument("--out", default="/tmp/sweep_onechip.json")
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/nicer_slam_tpu_jax_cache")

    from nicer_slam_tpu.datasets.synthetic import generate

    work = tempfile.mkdtemp(prefix="sweep_onechip_")
    confs = []
    for name in ("A", "B"):
        data_dir = os.path.join(work, f"Synthetic_{name}")
        generate(data_dir, scan_id=1, n_frames=args.frames, H=args.H,
                 W=args.W, world_scale=3.0, with_flow=args.frames > 10,
                 rad_per_frame=args.rad_per_frame)
        conf = CONF_TEMPLATE.format(
            data_dir=data_dir, H=args.H, W=args.W, n_images=args.frames,
            map_iters=args.iters, track_iters=args.track_iters,
            rays=args.rays, track_rays=args.track_rays, lr=args.lr,
            track_lr=args.track_lr, grid_lr_factor=args.grid_lr_factor,
            ba="true" if args.ba else "false", mef=args.mef,
            window=args.window, ba_ratio=args.ba_ratio,
            ba_end_ratio=args.ba_end_ratio, ba_cam_lr=args.ba_cam_lr,
        ba_trust_radius=args.ba_trust_radius,
        ba_trust_rot=args.ba_trust_rot,
        cam_fs_w=args.cam_freespace_w,
        cam_fs_margin=args.cam_freespace_margin,
            pose_graph="true" if args.pose_graph else "false",
            gt_cam="true" if args.gt_cam else "false", warp_w=args.warp_w,
            track_lr_step=args.track_lr_step,
            track_lr_gamma=args.track_lr_gamma,
            rot_lr_scale=args.rot_lr_scale,
            motion_prior_w=args.motion_prior_w,
            motion_prior_rot_w=args.motion_prior_rot_w,
            motion_prior_spring=args.motion_prior_spring,
            gws=args.gws,
            conf_weight="true" if args.conf_weight else "false",
            conf_floor=args.conf_floor, conf_recency_kf=args.conf_recency_kf,
            conf_residual_beta=args.conf_residual_beta,
            density=args.density, beta_warmup=args.beta_warmup,
            beta_warmup_iters=max(int(args.iters * 0.8), 1),
            prepass=args.prepass, cache_res=args.cache_res,
            color_grid="true" if args.color_grid else "false",
            color_topk=args.color_topk,
            checkpoint_freq=args.checkpoint_freq)
        cpath = os.path.join(work, f"probe_{name}.conf")
        with open(cpath, "w") as f:
            f.write(conf)
        confs.append(cpath)

    # warm compile (scene A alone, also the single-scene baseline):
    # run twice, time the second so compile wall doesn't pollute the ratio
    print("[onechip] single-scene warmup/compile...", flush=True)
    sweep(confs[:1], root_dir=work, exps_folder="exps_warm", quiet=True)
    print("[onechip] single-scene timed run...", flush=True)
    t0 = time.time()
    r1 = sweep(confs[:1], root_dir=work, exps_folder="exps_single",
               quiet=True)
    wall_1 = time.time() - t0
    assert r1[0].get("ok"), r1[0].get("error", "")

    print("[onechip] two concurrent scenes on one chip...", flush=True)
    t0 = time.time()
    r2 = sweep(confs, root_dir=work, exps_folder="exps_pair", quiet=True,
               scenes_per_device=2)
    wall_2 = time.time() - t0
    for r in r2:
        assert r.get("ok"), r.get("error", "")

    ratio = 2.0 * wall_1 / wall_2
    out = {"frames": args.frames, "iters": args.iters,
           "track_iters": args.track_iters, "rays": args.rays,
           "wall_single_s": round(wall_1, 1),
           "wall_pair_s": round(wall_2, 1),
           "aggregate_throughput_ratio": round(ratio, 3),
           "devices": str(jax.devices())}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"[onechip] single={wall_1:.1f}s pair={wall_2:.1f}s "
          f"aggregate ratio={ratio:.2f}x (1.0 = no time-share benefit)",
          flush=True)


if __name__ == "__main__":
    main()
