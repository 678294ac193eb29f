"""Long-sequence realistic-motion evaluation (the reference demo recipe at
README.md:143-171 scale, on the slow-motion synthetic).

Replica sequences are ~2000 frames with ~10x smaller per-frame motion than
our 210-frame demo synthetic. This driver generates a >=1000-frame
slow-motion scan (``--rad_per_frame 0.003`` = the Replica-at-2000-frames
motion regime, closed-form GT), runs the COMPLETE pipeline —
SLAMRunner.run() (tracking + mapping + BA + checkpoints), then the full
eval battery the reference ships:

  * eval_cam      ATE/rot/trans on the estimated trajectory (sim3 prealign)
  * eval_rec      mesh accuracy/completion/Chamfer/F-score vs the analytic
                  GT mesh (marching cubes on the scene's closed-form SDF)
  * eval_rendering PSNR/SSIM/LPIPS, interpolate + extrapolate protocols

Usage:
  python tools/long_seq_eval.py --frames 1000 --iters 60 --track_iters 60 \
      --rays 4096 --track_rays 1024 --conf_weight --ba \
      [--out /tmp/long_seq_eval.json]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from convergence_probe import CONF_TEMPLATE, build_argparser  # noqa: E402


def main():
    p = build_argparser()
    p.add_argument("--out", default="/tmp/long_seq_eval.json")
    p.add_argument("--mesh_res", type=int, default=256)
    p.add_argument("--n_eval_views", type=int, default=8)
    # NOTE: --data_dir comes from build_argparser (convergence_probe)
    p.add_argument("--interim_every", type=int, default=100,
                   help="compute/record in-memory ATE every N frames so a "
                        "truncated run still yields a drift curve")
    p.add_argument("--mesh_eval_frame", type=int, default=0,
                   help="if >0, run the eval_rec mesh battery once mid-run "
                        "at this frame (serial with the SLAM loop; ~minutes) "
                        "so a session-boundary kill still leaves one "
                        "at-scale mesh number in the results JSON")
    p.add_argument("--resume_root", default=None,
                   help="existing run root (contains long_seq.conf, "
                        "Synthetic/, exps/) — resume its latest checkpoint "
                        "instead of starting fresh; all model/schedule flags "
                        "are then taken from its conf, not the CLI")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/nicer_slam_tpu_jax_cache")
    import numpy as np

    from nicer_slam_tpu.datasets.scene_dataset import SLAMDataset
    from nicer_slam_tpu.datasets.synthetic import (generate, generate_eval,
                                                   scene_sdf)
    from nicer_slam_tpu.evaluation.eval_cam import evaluate_run
    from nicer_slam_tpu.evaluation.eval_rec import calc_3d_metric
    from nicer_slam_tpu.evaluation.eval_rendering import evaluate_rendering
    from nicer_slam_tpu.ops.marching_cubes import extract_mesh
    from nicer_slam_tpu.slam.runner import SLAMRunner
    from nicer_slam_tpu.utils.plots import save_mesh
    from nicer_slam_tpu.utils.ply import write_ply

    if args.resume_root:
        tmp = args.resume_root
        args.data_dir = os.path.join(tmp, "Synthetic")
    else:
        tmp = tempfile.mkdtemp(prefix="long_seq_")
    if args.data_dir:
        data_dir = args.data_dir
    else:
        data_dir = os.path.join(tmp, "Synthetic")
        print(f"[long_seq] generating {args.frames} frames "
              f"(rad/frame {args.rad_per_frame}) -> {data_dir}", flush=True)
        generate(data_dir, scan_id=1, n_frames=args.frames, H=args.H,
                 W=args.W, world_scale=3.0, with_flow=True,
                 rad_per_frame=args.rad_per_frame)
        generate_eval(data_dir, scan_id=1, n_views=args.n_eval_views,
                      H=args.H, W=args.W, world_scale=3.0)

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
        gws=args.gws,
        pose_graph="true" if args.pose_graph else "false",
        gt_cam="true" if args.gt_cam else "false", warp_w=args.warp_w,
        track_lr_step=args.track_lr_step, track_lr_gamma=args.track_lr_gamma,
        rot_lr_scale=args.rot_lr_scale,
        motion_prior_w=args.motion_prior_w,
        motion_prior_rot_w=args.motion_prior_rot_w,
        motion_prior_spring=args.motion_prior_spring,
        conf_weight="true" if args.conf_weight else "false",
        conf_floor=args.conf_floor, conf_recency_kf=args.conf_recency_kf,
        conf_residual_beta=args.conf_residual_beta,
        density=args.density, beta_warmup=args.beta_warmup,
        beta_warmup_iters=max(int(args.iters * 0.8), 1),
        prepass=args.prepass, cache_res=args.cache_res,
        color_grid="true" if args.color_grid else "false",
        color_topk=args.color_topk,
        checkpoint_freq=args.checkpoint_freq)
    conf_path = os.path.join(tmp, "long_seq.conf")
    if not args.resume_root:
        with open(conf_path, "w") as f:
            f.write(conf)

    results = {"frames": args.frames, "rad_per_frame": args.rad_per_frame,
               "iters": args.iters, "track_iters": args.track_iters,
               "rays": args.rays, "track_rays": args.track_rays,
               "conf_weight": args.conf_weight, "ba": args.ba,
               "color_topk": args.color_topk, "mef": args.mef,
               "interim": []}

    from nicer_slam_tpu.evaluation import ate as ate_mod

    t0 = time.time()

    def _dump():
        # atomic: a kill mid-write must not truncate the sole results JSON
        tmp_out = args.out + ".tmp"
        with open(tmp_out, "w") as f:
            json.dump(results, f, indent=2)
        os.replace(tmp_out, args.out)

    # pose snapshots survive host recycling (checkpoints live on the run
    # host's /tmp and are GBs; the trajectory npz is KBs and enough for
    # every post-mortem in BASELINE.md)
    snap_path = os.path.splitext(args.out)[0] + "_poses.npz"

    def _run_eval_rec(runner, frame_idx, key):
        """Mesh battery vs the analytic GT surface; records under `key`."""
        est_ply = save_mesh(runner, frame_idx, resolution=args.mesh_res)
        gt_mesh = extract_mesh(scene_sdf, resolution=args.mesh_res,
                               grid_boundary=(-1.0, 1.0))
        if est_ply is None or gt_mesh is None:
            raise RuntimeError("mesh extraction failed")
        gv, gf, gn = gt_mesh
        gt_ply = os.path.join(tmp, "gt_mesh.ply")
        if not os.path.exists(gt_ply):
            write_ply(gt_ply, gv, gf, normals=gn)
        rec = calc_3d_metric(est_ply, gt_ply, n_points=200000, do_icp=True)
        results[key] = {k: float(v) for k, v in rec.items()}
        print(f"[long_seq] {key}: {rec}", flush=True)

    def interim_hook(runner, frame_idx):
        if args.mesh_eval_frame and frame_idx == args.mesh_eval_frame:
            t_mesh = time.time()
            try:
                _run_eval_rec(runner, frame_idx, f"eval_rec_at_{frame_idx}")
            except Exception as e:
                results[f"eval_rec_at_{frame_idx}"] = {"error": str(e)}
            results["mesh_eval_wall_s"] = round(time.time() - t_mesh, 1)
            _dump()
        if frame_idx == 0 or frame_idx % args.interim_every:
            return
        keys = sorted(runner.est_pose_all.keys())
        est = np.stack([runner.est_pose_all[k] for k in keys]).astype(np.float64)
        gt = np.stack([np.asarray(runner.dataset.gt_pose_all[k])
                       for k in keys]).astype(np.float64)
        try:
            m = ate_mod.evaluate_ate(gt, est, with_scale=True)
            a34, _ = ate_mod.prealign_cameras(est, gt)
            m.update(ate_mod.camera_alignment_errors(a34, gt[:, :3, :4]))
            m.update(ate_mod.rotation_drift(gt, est))
        except Exception as e:  # never let interim metrics kill the run
            m = {"error": str(e)}
        rec = {"frame": int(frame_idx),
               "wall_s": round(time.time() - t0, 1)}
        rec.update({k: float(v) for k, v in m.items()
                    if np.isscalar(v) and np.isfinite(v)})
        # map health (round-5 forensics: the spring run's SDF ended with NO
        # zero crossing — all-positive — and the anneal run's all-negative,
        # i.e. the map DIED mid-run and tracking coasted; record the death
        # frame). negfrac in (0,1) = a surface exists; 0.0 or 1.0 = dead.
        try:
            import jax as _jax
            import jax.numpy as _jnp
            from nicer_slam_tpu.models import fields as _fields
            if not hasattr(interim_hook, "_sdf_fn"):
                interim_hook._sdf_fn = _jax.jit(
                    lambda p, x: _fields.combine_sdf(
                        runner.scene_cfg.combine, p, x, "fine")[:, 0])
                xs = np.linspace(-0.98, 0.98, 32, dtype=np.float32)
                interim_hook._grid = _jnp.asarray(
                    np.stack(np.meshgrid(xs, xs, xs, indexing="ij"),
                             -1).reshape(-1, 3))
            sdf = np.asarray(interim_hook._sdf_fn(
                runner.params["implicit"], interim_hook._grid))
            rec["sdf_negfrac"] = float((sdf < 0).mean())
            out0 = runner.render_full_image(0)
            gt0 = runner.dataset.frame(0)["rgb"].reshape(out0["rgb"].shape)
            mse = float(np.mean((out0["rgb"] - gt0) ** 2))
            rec["psnr_frame0"] = float(-10.0 * np.log10(max(mse, 1e-12)))
        except Exception as e:
            rec["map_health_error"] = str(e)
        results["interim"].append(rec)
        _dump()
        try:
            np.savez(snap_path + ".tmp.npz", keys=np.asarray(keys),
                     est=est.astype(np.float32), gt=gt.astype(np.float32))
            os.replace(snap_path + ".tmp.npz", snap_path)
        except Exception:
            pass
        print(f"[long_seq] interim@{frame_idx}: "
              f"ate={rec.get('ate_rmse', float('nan')):.4f} "
              f"rot_drift={rec.get('rot_drift_deg', float('nan')):.1f}deg "
              f"({rec['wall_s'] / max(frame_idx, 1):.1f}s/frame)", flush=True)

    r = SLAMRunner(conf=conf_path, root_dir=tmp, quiet=False,
                   is_continue=bool(args.resume_root))
    if args.resume_root:
        results["resumed_from_frame"] = int(r.start_frame_idx)
    r.run(frame_hook=interim_hook)
    slam_wall = time.time() - t0
    print(f"[long_seq] SLAM done in {slam_wall:.0f}s "
          f"({slam_wall / args.frames:.2f}s/frame)", flush=True)

    results["slam_wall_s"] = round(slam_wall, 1)
    results["rundir"] = r.rundir

    _dump()

    def _attempt(name, fn, retries=2, backoff_s=90.0):
        """Run an eval phase with retries: a transient tunnel failure
        (e.g. the r4 round-boundary 'Broken pipe' on remote_compile) must
        not silently cost the round its evidence. The last error string is
        recorded only after every retry failed."""
        for i in range(retries + 1):
            try:
                fn()
                return
            except Exception as e:
                print(f"[long_seq] {name} attempt {i + 1} failed: {e}",
                      flush=True)
                results[name] = {"error": str(e), "attempts": i + 1}
                _dump()
                if i < retries:
                    time.sleep(backoff_s)

    # --- eval_cam: trajectory --------------------------------------------
    def _eval_cam():
        cam = evaluate_run(r.rundir, make_plot=True)
        results["eval_cam"] = {k: float(v) for k, v in cam.items()
                               if np.isscalar(v) and np.isfinite(v)}
        print(f"[long_seq] eval_cam: ate_rmse={cam['ate_rmse']:.4f}",
              flush=True)

    _attempt("eval_cam", _eval_cam)
    _dump()

    # --- eval_rec: mesh vs the analytic GT surface ------------------------
    _attempt("eval_rec",
             lambda: _run_eval_rec(r, args.frames - 1, "eval_rec"))
    _dump()

    # --- eval_rendering: interpolate + extrapolate -------------------------
    def _eval_rendering():
        interp = evaluate_rendering(r, eval_method="interpolate")
        results["eval_rendering_interpolate"] = {
            k: float(v) for k, v in interp.items() if np.isscalar(v)
            and not isinstance(v, str)}
        _dump()
        eval_ds = SLAMDataset(data_dir=data_dir + "_eval",
                              img_res=[args.H, args.W],
                              scan_id=1, n_images=args.n_eval_views)
        extrap = evaluate_rendering(r, eval_method="extrapolate",
                                    eval_dataset=eval_ds)
        results["eval_rendering_extrapolate"] = {
            k: float(v) for k, v in extrap.items() if np.isscalar(v)
            and not isinstance(v, str)}
        print(f"[long_seq] rendering: interp psnr={interp['psnr']:.2f} "
              f"extrap psnr={extrap['psnr']:.2f}", flush=True)

    _attempt("eval_rendering", _eval_rendering)
    _dump()
    print(json.dumps(results, indent=2), flush=True)


if __name__ == "__main__":
    main()
