"""Run the full eval battery (eval_cam / eval_rec / eval_rendering) off an
existing run directory's LATEST checkpoint — no SLAM loop.

Exists so a long run truncated by a wall-clock boundary still yields the
complete quality table: the SLAM loop checkpoints every checkpoint_freq
frames (slam/checkpoint.py), and everything the battery needs (params,
voxels, poses) restores from disk. The interpolate-rendering protocol and
the mesh frame index are clamped to the last *estimated* frame so a
truncated trajectory is never evaluated against views it was never shown.

Usage:
  python tools/eval_checkpoint.py --rundir <.../exps/<exp>_<scan>/<ts>/> \
      [--out OUT.json] [--mesh_res 256] [--eval_data_dir <dir>_eval] \
      [--synthetic_gt_mesh]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--rundir", required=True)
    ap.add_argument("--out", default="/tmp/eval_checkpoint.json")
    ap.add_argument("--mesh_res", type=int, default=256)
    ap.add_argument("--n_eval_views", type=int, default=8)
    ap.add_argument("--eval_data_dir", default=None,
                    help="held-out extrapolation scan dir (…_eval)")
    ap.add_argument("--synthetic_gt_mesh", action="store_true",
                    help="compare the mesh against the analytic synthetic "
                         "scene SDF (datasets/synthetic.py)")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/nicer_slam_tpu_jax_cache")
    import numpy as np

    from nicer_slam_tpu.evaluation.eval_cam import evaluate_run
    from nicer_slam_tpu.evaluation.eval_rendering import evaluate_rendering
    from nicer_slam_tpu.slam.runner import SLAMRunner

    rundir = os.path.abspath(args.rundir.rstrip("/"))
    timestamp = os.path.basename(rundir)
    root_dir = os.path.dirname(os.path.dirname(os.path.dirname(rundir)))
    conf_path = os.path.join(rundir, "runconf.conf")

    results = {"rundir": rundir}

    def dump():
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)

    t0 = time.time()
    try:
        cam = evaluate_run(rundir, make_plot=True)
        results["eval_cam"] = {k: float(v) for k, v in cam.items()
                               if np.isscalar(v) and np.isfinite(v)}
        print(f"[eval_ckpt] eval_cam: ate_rmse={cam['ate_rmse']:.4f} "
              f"n={cam['n_frames']}", flush=True)
    except Exception as e:
        results["eval_cam"] = {"error": str(e)}
    dump()

    r = SLAMRunner(conf=conf_path, root_dir=root_dir, is_continue=True,
                   timestamp=timestamp, quiet=True)
    last = max(r.est_pose_all.keys())
    results["last_est_frame"] = int(last)
    print(f"[eval_ckpt] restored through frame {last}", flush=True)

    # --- mesh --------------------------------------------------------------
    try:
        from nicer_slam_tpu.evaluation.eval_rec import calc_3d_metric
        from nicer_slam_tpu.utils.plots import save_mesh

        est_ply = save_mesh(r, int(last), resolution=args.mesh_res)
        if est_ply is not None and args.synthetic_gt_mesh:
            from nicer_slam_tpu.datasets.synthetic import scene_sdf
            from nicer_slam_tpu.ops.marching_cubes import extract_mesh
            from nicer_slam_tpu.utils.ply import write_ply

            gt_mesh = extract_mesh(scene_sdf, resolution=args.mesh_res,
                                   grid_boundary=(-1.0, 1.0))
            if gt_mesh is not None:
                gv, gf, gn = gt_mesh
                gt_ply = os.path.join(tempfile.mkdtemp(), "gt_mesh.ply")
                write_ply(gt_ply, gv, gf, normals=gn)
                rec = calc_3d_metric(est_ply, gt_ply, n_points=200000,
                                     do_icp=True)
                results["eval_rec"] = {k: float(v) for k, v in rec.items()}
                print(f"[eval_ckpt] eval_rec: {rec}", flush=True)
        results["est_mesh"] = est_ply
    except Exception as e:
        results["eval_rec"] = {"error": str(e)}
    dump()

    # --- rendered-depth scale bias ------------------------------------------
    # Drift post-mortem diagnostic (BASELINE.md round-5 "secular BA keyframe
    # drag"): if the map's rendered depth at a frame's estimated pose is a
    # multiplicative factor k of the true depth, the photometric tracking
    # translation that re-aligns pixels scales by ~k — a per-frame step
    # inflation that integrates into Horn-scale drift. Median ratio per
    # probe frame; requires the dataset to ship *_gt_depth.png.
    try:
        if getattr(r.dataset, "gt_depth_paths", None):
            rows = []
            for f in sorted({0, int(last) // 4, int(last) // 2,
                             3 * int(last) // 4, int(last)}):
                rendered = r.render_full_image(f)["depth"].reshape(-1)
                gt_d = r.dataset.frame(f)["gt_depth"]
                ok = (gt_d > 1e-4) & np.isfinite(rendered) & (rendered > 1e-4)
                ratio = rendered[ok] / gt_d[ok]
                rows.append({"frame": int(f),
                             "depth_ratio_median": float(np.median(ratio)),
                             "depth_ratio_p25": float(np.percentile(ratio, 25)),
                             "depth_ratio_p75": float(np.percentile(ratio, 75)),
                             "depth_mae": float(np.mean(np.abs(
                                 rendered[ok] - gt_d[ok])))})
                print(f"[eval_ckpt] depth bias f{f}: "
                      f"median ratio {rows[-1]['depth_ratio_median']:.3f}",
                      flush=True)
            results["depth_bias"] = rows
    except Exception as e:
        results["depth_bias"] = {"error": str(e)}
    dump()

    # --- rendering ---------------------------------------------------------
    try:
        # clamp the interpolate protocol to frames the run actually saw
        r.n_images = int(last) + 1
        interp = evaluate_rendering(r, eval_method="interpolate")
        results["eval_rendering_interpolate"] = {
            k: float(v) for k, v in interp.items() if np.isscalar(v)
            and not isinstance(v, str)}
        print(f"[eval_ckpt] interp psnr={interp['psnr']:.2f}", flush=True)
        dump()
        if args.eval_data_dir and os.path.exists(args.eval_data_dir):
            from nicer_slam_tpu.datasets.scene_dataset import SLAMDataset

            eval_ds = SLAMDataset(data_dir=args.eval_data_dir,
                                  img_res=[r.H, r.W], scan_id=1,
                                  n_images=args.n_eval_views)
            extrap = evaluate_rendering(r, eval_method="extrapolate",
                                        eval_dataset=eval_ds)
            results["eval_rendering_extrapolate"] = {
                k: float(v) for k, v in extrap.items() if np.isscalar(v)
                and not isinstance(v, str)}
            print(f"[eval_ckpt] extrap psnr={extrap['psnr']:.2f}", flush=True)
    except Exception as e:
        results["eval_rendering_error"] = str(e)
    results["wall_s"] = round(time.time() - t0, 1)
    dump()
    print(json.dumps(results, indent=2), flush=True)


if __name__ == "__main__":
    main()
