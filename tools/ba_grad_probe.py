"""Per-loss-term BA pose-gradient probe.

Round-5 drift post-mortem tool. The long-sequence pose curves show every
writable keyframe being dragged away from the locally-consistent trajectory
at near the BA sign-step capacity (~BA_cam_lr per iter per dim) in a
*coherent* direction for dozens of mapping calls (deviation-from-midpoint
0.06-0.25 at keyframes vs 0.01 elsewhere, LONG_SEQ_FINAL_r05_poses.npz).
A saturated fresh-Adam step (state.py:fresh_adam_single_step — a sign step,
volsdf_train.py:511-528) means *some* mapping-loss term has a persistent
nonzero pose gradient at the current pose. This probe restores a checkpoint,
rebuilds one BA-active mapping iteration exactly as slam/runner.py does, and
measures each weighted loss term's gradient w.r.t. the keyframe camera
tensors, averaged over pixel draws:

  * per-term: systematicity = |mean_g| / mean|g| over pixel seeds (1.0 =
    the same pull every draw — what a sign-step integrates into secular
    drag; ~0 = zero-mean noise the sign-step random-walks over),
  * per-term sign-step translation direction vs the keyframe's observed
    deviation-from-midpoint (cosine >0 = this term explains the drag),
  * the deviation expressed in the keyframe's camera frame (z = along the
    view axis, i.e. a depth/scale force).

Usage:
  python tools/ba_grad_probe.py --rundir <.../exps/<exp>/<ts>/> \
      [--frame N] [--seeds 8] [--out /tmp/ba_grad_probe.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--rundir", required=True)
    ap.add_argument("--frame", type=int, default=None,
                    help="frame to probe (default: last estimated frame)")
    ap.add_argument("--mapping_iter", type=int, default=None,
                    help="mapping iteration to reconstruct (default: first "
                         "BA-active one)")
    ap.add_argument("--seeds", type=int, default=8)
    ap.add_argument("--reset_kf", action="store_true",
                    help="probe at UNDRAGGED keyframe poses (translation "
                         "reset to the neighbours' midpoint) — measures the "
                         "force that created the drag, not the residual at "
                         "the dragged equilibrium")
    ap.add_argument("--out", default="/tmp/ba_grad_probe.json")
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/nicer_slam_tpu_jax_cache")
    import jax.numpy as jnp
    import numpy as np

    from nicer_slam_tpu.models import scene_model as sm
    from nicer_slam_tpu.models.losses import compute_losses
    from nicer_slam_tpu.slam.mapping import _ray_slots
    from nicer_slam_tpu.slam.runner import SLAMRunner
    from nicer_slam_tpu.utils.camera import camera_from_tensor, \
        tensor_from_camera_np

    rundir = os.path.abspath(args.rundir.rstrip("/"))
    timestamp = os.path.basename(rundir)
    root_dir = os.path.dirname(os.path.dirname(os.path.dirname(rundir)))
    conf_path = os.path.join(rundir, "runconf.conf")

    r = SLAMRunner(conf=conf_path, root_dir=root_dir, is_continue=True,
                   timestamp=timestamp, quiet=True)
    frame_idx = args.frame if args.frame is not None \
        else max(r.est_pose_all.keys())
    print(f"[ba_grad] probing frame {frame_idx}", flush=True)

    # --- reconstruct one BA-active mapping iteration (runner._map_impl) ----
    it = args.mapping_iter if args.mapping_iter is not None \
        else int(r.num_mapping_iters * r.BA_ratio) + 1
    win = r.kf_selector.window(frame_idx, 0)          # fixes _local_list
    if it >= r.num_mapping_iters // 2:
        win = r.kf_selector.window(frame_idx, r.num_mapping_iters // 2)
    kfs = win.keyframe_list[: r.map_cfg.max_slots]
    r._prepare_edge_refs(win.edges)
    refs = r._prepare_refs(kfs, frame_idx)
    r.density_cache = (r._refresh_cache(r.params, r.voxels)
                       if r.density_cache is not None else None)

    Smax = r.map_cfg.max_slots
    poses_q = np.zeros((Smax, 7), np.float32)
    poses_q[:, 0] = 1.0
    for s, kf in enumerate(kfs):
        src = np.asarray(r.est_pose_all.get(kf, r.dataset.gt_pose_all[kf]))
        if (args.reset_kf and kf > 0 and kf % r.keyframe_every == 0
                and kf - 1 in r.est_pose_all and kf + 1 in r.est_pose_all):
            src = src.copy()
            src[:3, 3] = (np.asarray(r.est_pose_all[kf - 1])[:3, 3]
                          + np.asarray(r.est_pose_all[kf + 1])[:3, 3]) / 2
        poses_q[s] = tensor_from_camera_np(src)
    poses_q = jnp.asarray(poses_q)

    stage = "coarse" if it < int(r.num_mapping_iters * 0.25) else "fine"
    color_stage = "base" if it < int(r.num_mapping_iters * 0.7) else "highfreq"
    scene_cfg, map_cfg, loss_cfg = r.scene_cfg, r.map_cfg, r.loss_cfg
    H, W = scene_cfg.H, scene_cfg.W
    HW = H * W
    R = map_cfg.num_pixels

    weights = {
        "rgb_loss": loss_cfg.rgb_loss_weight,
        "depth_loss": loss_cfg.depth_weight,
        "normal_l1": loss_cfg.normal_l1_weight,
        "normal_cos": loss_cfg.normal_cos_weight,
        "warp_loss": loss_cfg.warp_loss_weight,
        "eikonal_loss": loss_cfg.eikonal_weight,
        "smooth_loss": loss_cfg.smooth_weight,
        "flow_loss": loss_cfg.flow_weight,
    }
    term_names = [k for k, w in weights.items() if w > 0]
    use_flow = r._use_flow and refs.edge_valid is not None

    def make_losses_vec(term_list):
        """ONE jitted jacrev over a stacked term vector — a single XLA
        compile instead of one ~15-min compile per term (the per-term-jit
        version burned a whole chip window on compiles alone)."""
        def losses_vec(q, key):
            k_pix, k_render = jax.random.split(key)
            slot, ray_valid = _ray_slots(R, refs.n_valid)
            pix = jax.random.randint(k_pix, (R,), 0, HW)
            rows = refs.slot_rows[slot]
            uv = jnp.stack([(pix % W).astype(jnp.float32),
                            (pix // W).astype(jnp.float32)], axis=-1)
            gt = {
                "rgb": r.store.rgb[rows, pix].astype(jnp.float32) / 255.0,
                "depth": r.store.depth[rows, pix].astype(jnp.float32)[:, None],
                "normal": r.store.normal[rows, pix].astype(jnp.float32),
                "gt_depth": r.store.gt_depth[rows, pix].astype(
                    jnp.float32)[:, None],
                "mask": r.store.mask[rows, pix].astype(jnp.float32)[:, None],
            }
            if use_flow:
                flow_gt = refs.flow_imgs[:, pix, :].astype(jnp.float32)
                flow_mask = refs.flow_occ[:, pix]
                edges = sm.FlowEdges(idii=refs.edge_idii,
                                     idjj=refs.edge_idjj,
                                     valid=refs.edge_valid)
            else:
                flow_gt = flow_mask = edges = None
            full_rgb = (r.store.rgb[refs.slot_rows]
                        if scene_cfg.use_warp_loss else None)
            full_depth = (r.store.depth[refs.slot_rows]
                          if scene_cfg.use_warp_loss
                          and any(p > 1 for p in scene_cfg.patchsizes)
                          else None)
            slot_valid = jnp.arange(Smax) < refs.n_valid
            batch = sm.RayBatch(
                uv=uv, kf_slot=slot, poses=camera_from_tensor(q),
                intrinsics=refs.intrinsics, frame_ids=refs.frame_ids,
                slot_valid=slot_valid, ray_valid=ray_valid, ray_weight=None)
            out = sm.render_rays(
                scene_cfg, r.params, r.voxels, batch, k_render,
                stage=stage, color_stage=color_stage, training=True,
                is_mapping=True, edges=edges, full_rgb=full_rgb,
                full_depth=full_depth,
                density_cache=r.density_cache, beta_scale=None)
            terms = compute_losses(
                loss_cfg, out, gt, batch, stage=stage,
                is_first_frame=False, num_slots=Smax,
                flow_gt=flow_gt, flow_mask=flow_mask, edges=edges)
            return jnp.stack([
                (weights.get(t, 1.0) * terms[t]) if t != "loss"
                else terms["loss"]
                for t in term_list])
        return jax.jit(jax.jacrev(losses_vec))

    # observed keyframe drag: deviation of t[kf] from its neighbours'
    # midpoint, also expressed in the keyframe's own camera frame
    obs = {}
    for kf in kfs:
        if kf - 1 in r.est_pose_all and kf + 1 in r.est_pose_all \
                and kf in r.est_pose_all and kf % r.keyframe_every == 0 \
                and kf > 0:
            tkm = np.asarray(r.est_pose_all[kf - 1])[:3, 3]
            tk = np.asarray(r.est_pose_all[kf])[:3, 3]
            tkp = np.asarray(r.est_pose_all[kf + 1])[:3, 3]
            dev = tk - (tkm + tkp) / 2
            Rk = np.asarray(r.est_pose_all[kf])[:3, :3]
            obs[kf] = {"dev": dev, "dev_cam": Rk.T @ dev,
                       "norm": float(np.linalg.norm(dev))}

    results = {"rundir": rundir, "frame": int(frame_idx),
               "mapping_iter": it, "kfs": [int(k) for k in kfs],
               "ba_cam_lr": float(map_cfg.BA_cam_lr),
               "obs_dev": {str(k): {"norm": v["norm"],
                                    "dev": v["dev"].tolist(),
                                    "dev_cam": v["dev_cam"].tolist()}
                           for k, v in obs.items()},
               "terms": {}}

    keys = [jax.random.PRNGKey(1000 + i) for i in range(args.seeds)]
    all_terms = term_names + ["loss"]
    gfn = make_losses_vec(all_terms)           # ONE compile for every term
    jac = np.stack([np.asarray(gfn(poses_q, k)) for k in keys])
    # jac: [seeds, T, Smax, 7]
    for ti, term in enumerate(all_terms):
        gs = jac[:, ti]                                         # [S,Smax,7]
        mean_g = gs.mean(0)
        mean_abs = np.abs(gs).mean(0)
        sysm = np.abs(mean_g) / np.maximum(mean_abs, 1e-12)         # [Smax,7]
        # sign-step drag prediction for translation dims
        step_t = -float(map_cfg.BA_cam_lr) * np.sign(mean_g[:, 4:7])
        per_slot = []
        for s, kf in enumerate(kfs):
            e = {
                "kf": int(kf),
                "g_t_norm": float(np.linalg.norm(mean_g[s, 4:7])),
                "g_q_norm": float(np.linalg.norm(mean_g[s, :4])),
                "sys_t": float(sysm[s, 4:7].mean()),
                "sys_q": float(sysm[s, :4].mean()),
            }
            if kf in obs and obs[kf]["norm"] > 1e-6:
                d = obs[kf]["dev"] / obs[kf]["norm"]
                st = step_t[s] / max(np.linalg.norm(step_t[s]), 1e-12)
                e["cos_drag"] = float(st @ d)
            per_slot.append(e)
        results["terms"][term] = per_slot
        mean_sys_t = float(np.mean([e["sys_t"] for e in per_slot]))
        mean_cos = [e["cos_drag"] for e in per_slot if "cos_drag" in e]
        print(f"[ba_grad] {term:12s} sys_t={mean_sys_t:.2f} "
              f"|g_t|={np.mean([e['g_t_norm'] for e in per_slot]):.2e} "
              f"cos_drag={np.mean(mean_cos) if mean_cos else float('nan'):.2f}",
              flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"[ba_grad] wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
