"""SLAMRunner: the experiment shell around the jitted track/map steps.

Behavioral reference: cvg/nicer-slam ``code/training/volsdf_train.py``
(SLAMRunner): experiment-dir layout (exps/<expname>_<scan>/<timestamp>/
{vis/, checkpoints/{Model,Optimizer,Pose}Parameters/, runconf.conf}),
per-frame loop: tracking -> (every mapping_every_frame) mapping+BA ->
checkpoint -> vis/mesh.

The compute path is fully functional/jitted (tracking.track_frame,
mapping.map_step); this class is the thin imperative shell: keyframe
selection, device staging, pose bookkeeping, IO.
"""

from __future__ import annotations

import os
import time
from datetime import datetime
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as config_mod
from ..models import scene_model as sm
from ..models.losses import loss_config_from_conf
from ..utils.camera import (camera_from_tensor_np, clamp_pose_to_anchor_np,
                            tensor_from_camera_np)
from . import checkpoint as ckpt
from .frame_store import FrameStore
from .keyframes import KeyframeConfig, KeyframeSelector
from .mapping import MapBatchRefs, MapConfig, map_step, slot_confidence
from .state import OptimConfig, make_optimizer
from .tracking import TrackConfig, track_frame
from ..utils.profiling import PhaseTimer


def get_class(path: str):
    """Dynamic class loading by dotted string (utils/general.py:153-159),
    with reference-style names mapped onto this package."""
    aliases = {
        "datasets.scene_dataset.SLAMDataset":
            "nicer_slam_tpu.datasets.scene_dataset.SLAMDataset",
        "model.network.SLAMNetwork": None,   # functional here
        "model.loss.SLAMLoss": None,
    }
    path = aliases.get(path, path)
    if path is None:
        return None
    parts = path.split(".")
    mod = __import__(".".join(parts[:-1]), fromlist=[parts[-1]])
    return getattr(mod, parts[-1])


class SLAMRunner:
    def __init__(
        self,
        conf: str,
        expname: str = "",
        exps_folder_name: str = "exps",
        is_continue: bool = False,
        timestamp: str = "latest",
        new_expfolder: bool = False,
        checkpoint: str = "latest",
        scan_id: int = -1,
        root_dir: str = ".",
        seed: int = 0,
        quiet: bool = False,
    ):
        self.conf_path = conf
        self.conf = config_mod.parse_file(conf)
        c = self.conf
        self.quiet = quiet

        self.n_images = c.get_int("dataset.n_images")
        self.scan_id = scan_id if scan_id != -1 else c.get_int("dataset.scan_id", -1)
        self.mapping_window_size = c.get_int("SLAM.mapping.mapping_window_size")
        self.keyframe_every = c.get_int("SLAM.mapping.keyframe_every")
        self.mapping_every_frame = c.get_int("SLAM.mapping.mapping_every_frame")
        self.num_mapping_iters = c.get_int("SLAM.mapping.iters")
        self.num_cam_iters = c.get_int("SLAM.tracking.iters")
        self.enable_BA = c.get_bool("SLAM.mapping.BA")
        self.BA_ratio = c.get_float("SLAM.mapping.BA_ratio", 0.7)
        # Drift-loop mechanisms beyond the reference (defaults = reference
        # behavior). The reference's BA correction capacity per mapping call
        # is bounded by n_ba_iters x BA_cam_lr (each BA camera step is a
        # fresh-Adam SIGN step of magnitude ~BA_cam_lr,
        # volsdf_train.py:524-528,575-578): at its slow per-frame motion
        # that bound exceeds the per-window drift accrual, at 10x motion it
        # does not and drift compounds. BA_end_ratio < 1 ends BA before the
        # final iters so geometry re-fits the corrected poses ("re-map
        # after BA"); pose_graph_propagate rigidly attaches every
        # non-BA-corrected frame to its nearest preceding corrected
        # keyframe and applies that keyframe's world-frame correction.
        self.BA_end_ratio = c.get_float("SLAM.mapping.BA_end_ratio", 1.0)
        self.pose_graph_propagate = c.get_bool(
            "SLAM.mapping.pose_graph_propagate", False)
        # BA trust region (0 = off = reference behavior): bound each
        # keyframe's LIFETIME BA displacement from the pose it had at its
        # first BA touch (~its tracked pose). Motivation (ba_grad_probe /
        # LONG_SEQ_FINAL_r05 post-mortem): the fresh-Adam sign step means a
        # persistently-biased pose gradient drags a keyframe ~BA_cam_lr per
        # iteration for every call it stays in the window — at the
        # pre-global regime (frame < global_window_start the local list is
        # ALL keyframes, volsdf_train.py:476) that integrates to 0.06-0.25
        # displacements, 50-200x the per-frame motion, which then feed the
        # map as authoritative keyframe geometry. The trust region caps the
        # correction at the scale of the tracking noise BA exists to fix.
        self.BA_trust_radius = c.get_float("SLAM.mapping.BA_trust_radius",
                                           0.0)
        self.BA_trust_rot_deg = c.get_float("SLAM.mapping.BA_trust_rot_deg",
                                            0.0)
        self._ba_anchor: Dict[int, np.ndarray] = {}
        # confidence-weighted mapping (drift-loop damping, off = reference
        # behavior): rays from recently-tracked poses — which BA has not yet
        # refined — get loss weight conf_floor, ramping to 1.0 once the pose
        # is conf_recency_kf keyframe periods old; optionally scaled down for
        # frames whose final tracking residual was above the window median.
        self.conf_weight = c.get_bool("SLAM.mapping.conf_weight", False)
        self.conf_floor = c.get_float("SLAM.mapping.conf_floor", 0.3)
        self.conf_recency_kf = c.get_float("SLAM.mapping.conf_recency_kf", 2.0)
        self.conf_residual_beta = c.get_float(
            "SLAM.mapping.conf_residual_beta", 0.0)
        self.track_residual: Dict[int, float] = {}
        self.gt_cam = c.get_bool("SLAM.tracking.gt_cam", False)
        self.const_speed = c.get_bool("SLAM.tracking.const_speed_assumption", False)
        self.verbose = c.get_bool("SLAM.verbose", False)
        self.checkpoint_freq = c.get_int("train.checkpoint_freq", 100)
        self.plot_freq = c.get_int("train.plot_freq", 50)
        self.mapping_inner_freq = c.get_int("SLAM.mapping.inner_freq", 1000)
        self.split_n_pixels = c.get_int("train.split_n_pixels", 10000)

        # ---- experiment dir layout (volsdf_train.py:66-92)
        self.expname = c.get_string("train.expname") + expname
        if self.scan_id != -1:
            self.expname = f"{self.expname}_{self.scan_id}"
        exps_root = os.path.join(root_dir, exps_folder_name)
        os.makedirs(exps_root, exist_ok=True)
        self.expdir = os.path.join(exps_root, self.expname)
        os.makedirs(self.expdir, exist_ok=True)

        resolved_timestamp = None
        resumed = False
        if is_continue and timestamp == "latest":
            # newest run dir that actually has a checkpoint — an aborted run
            # leaves an empty timestamp dir that must not win "latest"
            stamps = sorted(os.listdir(self.expdir)) if os.path.isdir(self.expdir) else []
            for stamp in reversed(stamps):
                if os.path.exists(os.path.join(
                        self.expdir, stamp, "checkpoints", "ModelParameters",
                        "latest.npz")):
                    resolved_timestamp = stamp
                    resumed = True
                    break
        elif is_continue:
            resolved_timestamp = timestamp
            resumed = True

        self.timestamp = "{:%Y_%m_%d_%H_%M_%S}".format(datetime.now())
        self.timestamp += c.get_string("train.folder_suffix", "")
        if resumed and not new_expfolder:
            self.timestamp = resolved_timestamp
        self.rundir = os.path.join(self.expdir, self.timestamp)
        os.makedirs(self.rundir, exist_ok=True)
        self.plots_dir = os.path.join(self.rundir, "vis")
        os.makedirs(self.plots_dir, exist_ok=True)
        self.checkpoints_path = os.path.join(self.rundir, "checkpoints")
        for sub in ("ModelParameters", "OptimizerParameters", "PoseParameters"):
            os.makedirs(os.path.join(self.checkpoints_path, sub), exist_ok=True)
        # the conf is the reproducibility record (volsdf_train.py:90-92)
        with open(self.conf_path) as f:
            conf_text = f.read()
        with open(os.path.join(self.rundir, "runconf.conf"), "w") as f:
            f.write(conf_text)

        # ---- dataset
        ds_cls = get_class(c.get_string("train.dataset_class",
                                        "datasets.scene_dataset.SLAMDataset"))
        ds_conf = c.get_config("dataset").as_plain_dict()
        ds_conf["scan_id"] = self.scan_id
        self.dataset = ds_cls(keyframe_every=self.keyframe_every, **ds_conf)
        self.H, self.W = self.dataset.img_res
        self.total_pixels = self.H * self.W

        # ---- model config + params
        self.scene_cfg = sm.scene_config_from_conf(
            c.get_config("model"), self.dataset.img_res, self.n_images)
        rng = np.random.default_rng(seed)
        self.params = sm.init_scene_params(rng, self.scene_cfg)
        self.voxels = sm.init_voxels(self.scene_cfg)

        # pretrained fine-MLP weights (volsdf_train.py:140-147 analogue).
        # The reference HARD-requires pretrain.pth; without that geometric
        # prior the random fine MLP wrecks the coarse net's geometric-sphere
        # init and the map collapses into a billboard at the camera. Our
        # fallback: force geometric init on the fine MLP (see
        # tools/pretrain.py for producing a real pretrain.npz).
        pretrain = c.get_string("train.pretrain_path", "pretrain.npz")
        if not os.path.isabs(pretrain):
            _pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            for base in (root_dir, os.path.dirname(os.path.abspath(conf)),
                         _pkg, os.path.dirname(_pkg)):  # repo root ships it
                cand = os.path.join(base, pretrain)
                if os.path.exists(cand):
                    pretrain = cand
                    break
        loaded_pretrain = False
        if os.path.exists(pretrain):
            loaded_pretrain = self._load_pretrained_fine_mlp(pretrain)
            if loaded_pretrain:
                self.log(f"loaded pretrained fine MLP: {pretrain}")
        if not loaded_pretrain:
            # geometric init for the (frozen) fine decoder. CRITICAL detail:
            # plain geometric init zeroes the first layer's grid-feature
            # columns (base_networks.py:138) — with the fine MLP frozen
            # (volsdf_train.py:150-174 excludes it from the optimizer) the
            # fine grid would be permanently dead. A pretrained decoder has
            # live grid columns; the fallback re-initializes them small.
            from ..models.fields import init_implicit_net

            fine_cfg = self.scene_cfg.combine.fine._replace(geometric_init=True)
            rng_fb = np.random.default_rng(seed + 1)
            geo_params = init_implicit_net(rng_fb, fine_cfg)
            lin0 = geo_params["lins"][0]
            v = np.array(lin0["v"])  # writable copy
            n_pe = 3 * (1 + 2 * fine_cfg.multires)
            v[:, n_pe:] = rng_fb.normal(
                0.0, 0.05, v[:, n_pe:].shape).astype(np.float32)
            lin0["v"] = jnp.asarray(v)
            if "g" in lin0:
                lin0["g"] = jnp.asarray(
                    np.linalg.norm(v, axis=1, keepdims=True).astype(np.float32))
            self.params["implicit"]["fine"]["lins"] = geo_params["lins"]
            self.log("[warn] no pretrain.npz found — geometric fine-MLP "
                     "fallback (live grid columns)")

        # ---- losses (mapping + tracking instances, volsdf_train.py:117-130)
        full_depth_mask = ("Replica" in c.get_string("dataset.data_dir")
                           and self.scan_id == 4)
        self.loss_cfg = loss_config_from_conf(
            c.get_config("loss"), full_depth_mask=full_depth_mask)
        self.tracking_loss_cfg = loss_config_from_conf(
            c.get_config("tracking_loss"))

        # ---- optimizer
        self.optim_cfg = OptimConfig(
            learning_rate=c.get_float("train.learning_rate"),
            learning_rate_beta=c.get_float("train.learning_rate_beta", 2e-3),
            lr_factor_for_fine_grid=c.get_float("train.lr_factor_for_fine_grid", 1.0),
            lr_factor_for_coarse_grid=c.get_float("train.lr_factor_for_coarse_grid", 1.0),
            lr_factor_for_color_grid=c.get_float("train.lr_factor_for_color_grid", 1.0),
        )
        self.optimizer = make_optimizer(self.optim_cfg, self.params)
        self.opt_state = self.optimizer.init(self.params)

        # ---- step configs
        # lr_step_size/lr_gamma default to the reference's StepLR(50, 0.95)
        # (volsdf_train.py:398). That schedule decays Adam's step to only
        # 0.95^1 of cam_lr by iter 60 — and Adam moves ~lr per iter per dim
        # regardless of gradient magnitude, so cam_lr is the per-frame pose
        # noise floor. At slow (Replica-matched) motion the floor dwarfs the
        # true inter-frame motion; a geometric anneal (e.g. step 8, gamma
        # 0.5) keeps the first iters' capture range but converges the floor
        # (see tools/track_noise_floor.py + TRACK_NOISE_r04.json).
        self.track_cfg = TrackConfig(
            num_iters=self.num_cam_iters,
            num_pixels=c.get_int("train.tracking_num_pixels", 1024),
            cam_lr=c.get_float("SLAM.tracking.lr"),
            Hedge=c.get_int("SLAM.tracking.Hedge", 0),
            Wedge=c.get_int("SLAM.tracking.Wedge", 0),
            lr_step_size=c.get_int("SLAM.tracking.lr_step_size", 50),
            lr_gamma=c.get_float("SLAM.tracking.lr_gamma", 0.95),
            rot_lr_scale=c.get_float("SLAM.tracking.rot_lr_scale", 1.0),
            motion_prior_w=c.get_float("SLAM.tracking.motion_prior_w", 0.0),
            motion_prior_rot_w=c.get_float(
                "SLAM.tracking.motion_prior_rot_w", 0.0),
            motion_prior_spring=c.get_float(
                "SLAM.tracking.motion_prior_spring", 0.0),
        )
        gws = c.get_int("SLAM.mapping.global_window_start", 200)
        # local-list worst case: frame<gws gives gws//ke+1 entries; frame>=gws
        # gives 2*window//3+1 unique entries
        local_worst = max(gws // self.keyframe_every + 1,
                          2 * self.mapping_window_size // 3 + 1)
        max_slots = (self.mapping_window_size // 3  # global slots
                     + local_worst
                     + self.keyframe_every)          # added recent frames
        self.map_cfg = MapConfig(
            num_pixels=c.get_int("train.mapping_num_pixels", 8192),
            max_slots=max_slots,
            max_edges=96,
            BA_cam_lr=c.get_float("SLAM.mapping.BA_cam_lr", 1e-3),
        )
        self.kf_selector = KeyframeSelector(
            KeyframeConfig(self.mapping_window_size, self.keyframe_every,
                           self.num_mapping_iters,
                           global_window_start=c.get_int(
                               "SLAM.mapping.global_window_start", 200)),
            seed=seed)

        # ---- device frame store
        n_kf_rows = self.n_images // self.keyframe_every + 2
        self.store = FrameStore(self.H, self.W, n_kf_rows,
                                n_recent_rows=self.keyframe_every + 2)

        self.start_frame_idx = 0
        self.est_pose_all: Dict[int, np.ndarray] = self.dataset.est_pose_all
        # bounded host-side cache of loaded flow pairs (f16 ~6.5MB/pair at
        # Replica res -> <=64 pairs ~420MB host RAM)
        self._flow_cache: Dict = {}
        self._flow_cache_max = 64
        self._edge_refs = None
        # use_flow is a PER-RUN constant (a map_step compile variant):
        # flow participates whenever the loss wants it and the dataset ships
        # flow files; calls without live edges run the same graph with an
        # all-invalid edge mask instead of forking a second compile.
        self._use_flow = bool(
            self.loss_cfg.flow_weight > 0
            and os.path.isdir(getattr(self.dataset, "flow_dir", "")))
        self._key = jax.random.PRNGKey(seed)
        self.timer = PhaseTimer()
        # density (beta) warmup: soft -> sharp annealing during the first
        # mapping call only (a stabilizer against the anchor-overshoot /
        # density-saturation collapse; 0 disables = reference behavior)
        self.beta_warmup_scale = c.get_float("model.density.beta_warmup_scale", 0.0)
        self.beta_warmup_iters = c.get_int("model.density.beta_warmup_iters", 50)
        self.prepass_refresh = c.get_int("model.ray_sampler.prepass_cache_refresh", 10)
        self.density_cache = None
        if self.scene_cfg.sampler.prepass_mode == "cached":
            self._refresh_cache = jax.jit(
                lambda p, v: sm.build_density_cache(self.scene_cfg, p, v))
            self.density_cache = self._refresh_cache(self.params, self.voxels)

        if resumed:
            self._restore(checkpoint)

    # ------------------------------------------------------------------
    def _load_pretrained_fine_mlp(self, path: str):
        data = np.load(path)
        lins = self.params["implicit"]["fine"]["lins"]
        loaded = 0
        for i in range(len(lins)):
            for k in list(lins[i].keys()):
                key = f"fine_lin{i}_{k}"
                if key in data:
                    if data[key].shape != np.asarray(lins[i][k]).shape:
                        self.log(f"[warn] pretrain {key} shape "
                                 f"{data[key].shape} != model "
                                 f"{np.asarray(lins[i][k]).shape}; skipping "
                                 f"pretrain (keeping current init)")
                        return False
                    lins[i][k] = jnp.asarray(data[key])
                    loaded += 1
        return loaded > 0

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def log(self, *args):
        if not self.quiet:
            print(*args, flush=True)

    # ------------------------------------------------------------------
    def save_checkpoints(self, frame_idx: int):
        ckpt.save_model(os.path.join(self.checkpoints_path, "ModelParameters"),
                        self.params, self.voxels, frame_idx)
        ckpt.save_optimizer(
            os.path.join(self.checkpoints_path, "OptimizerParameters"),
            self.opt_state, frame_idx)
        ckpt.save_poses(os.path.join(self.checkpoints_path, "PoseParameters"),
                        self.est_pose_all, self.dataset.gt_pose_all, frame_idx)

    def _restore(self, checkpoint: str = "latest"):
        mp = os.path.join(self.checkpoints_path, "ModelParameters")
        if not os.path.exists(os.path.join(mp, f"{checkpoint}.npz")):
            return
        self.params, self.voxels, self.start_frame_idx = ckpt.load_model(
            mp, self.params, checkpoint)
        self.voxels = jnp.asarray(self.voxels)
        self.opt_state = ckpt.load_optimizer(
            os.path.join(self.checkpoints_path, "OptimizerParameters"),
            self.opt_state, checkpoint)
        est, gt, _ = ckpt.load_poses(
            os.path.join(self.checkpoints_path, "PoseParameters"), checkpoint)
        self.est_pose_all.update(est)
        self.log(f"Resuming from frame_idx: {self.start_frame_idx}")

    # ------------------------------------------------------------------
    def _stage_frame(self, frame_idx: int):
        if frame_idx in self.store:
            return
        data = self.dataset.frame(frame_idx)
        self.store.put(
            frame_idx,
            rgb=data["rgb"], depth=data["depth"], normal=data["normal"],
            gt_depth=data["gt_depth"], mask=data["mask"],
            is_keyframe=(frame_idx % self.keyframe_every == 0))
        self.dataset.clean(frame_idx)

    # ------------------------------------------------------------------
    def track(self, frame_idx: int) -> np.ndarray:
        """Track one frame; returns est c2w (4x4 numpy)."""
        gt_c2w = self.dataset.gt_pose_all[frame_idx]
        if frame_idx == 0 or self.gt_cam:
            self.est_pose_all[frame_idx] = np.asarray(gt_c2w)
            return np.asarray(gt_c2w)

        if self.const_speed and frame_idx - 2 >= 0:
            delta = (self.est_pose_all[frame_idx - 1]
                     @ np.linalg.inv(self.est_pose_all[frame_idx - 2]))
            init_c2w = delta @ self.est_pose_all[frame_idx - 1]
        else:
            init_c2w = self.est_pose_all[frame_idx - 1]

        init_q = jnp.asarray(tensor_from_camera_np(init_c2w))
        if self.density_cache is not None:
            # fresh sample-placement cache for tracking (the map just moved
            # during the previous mapping call)
            self.density_cache = self._refresh_cache(self.params, self.voxels)
        self._stage_frame(frame_idx)
        row = self.store.row(frame_idx)
        K = jnp.asarray(self.dataset.intrinsics_all[frame_idx])

        with self.timer.phase("tracking") as box:
            best_q, final_q, aux = track_frame(
                self.scene_cfg, self.track_cfg, self.tracking_loss_cfg,
                self.params, self.voxels, self.store.rgb[row], K, init_q,
                self._next_key(), self.density_cache)
            box["sync"] = aux["best_loss"]
        c2w = camera_from_tensor_np(np.asarray(best_q))
        self.est_pose_all[frame_idx] = c2w
        self.track_residual[frame_idx] = float(aux["best_loss"])
        if self.verbose:
            losses = np.asarray(aux["losses"])
            gt_q = tensor_from_camera_np(gt_c2w)
            bq = np.asarray(best_q)
            err_t = float(np.linalg.norm(gt_q[4:] - bq[4:]))
            self.log(f"[track {frame_idx}] loss {losses[0]:.4f}->"
                     f"{losses[-1]:.4f} trans err {err_t:.4f}")
        return c2w

    # ------------------------------------------------------------------
    def _load_flow_pair(self, i: int, j: int):
        """Flow+occ for edge i->j as [HW,2] f16 / [HW] bool, cached across
        mapping calls (the reference loads flow GT once per mapping call at
        mapping_iter==0, volsdf_train.py:326-346; keyframes recur across
        calls, so a bounded cross-call cache also kills repeat disk reads)."""
        key = (i, j)
        if key in self._flow_cache:
            return self._flow_cache[key]
        HW = self.total_pixels
        try:
            flow, ok = self.dataset.flow_pair(i, j)
        except (FileNotFoundError, AttributeError):
            return None
        # geometric GT flow is unbounded at unusable pixels (points near the
        # target camera's principal plane project to |flow| >> f16 max and
        # overflow the cast to inf); those pixels are masked, but keep the
        # stored values finite so no inf can ever be gathered.
        flow = flow.reshape(HW, 2)
        ok = ok.reshape(HW)
        flow = np.where(ok[:, None], np.clip(np.nan_to_num(flow),
                                             -6.0e4, 6.0e4), 0.0)
        entry = (flow.astype(np.float16), ok)
        if len(self._flow_cache) >= self._flow_cache_max:
            self._flow_cache.pop(next(iter(self._flow_cache)))
        self._flow_cache[key] = entry
        return entry

    def _prepare_edge_refs(self, edges):
        """Flow-edge device data, built ONCE per mapping call (the edge
        graph and its slot ids are fixed for the whole call: edges are built
        at mapping_iter==0 and the local list only *appends* at iters//2, so
        existing slot indices never move; keyframes.py).

        ALL edge arrays are padded to the same fixed Emax — flow_imgs /
        flow_occ included — so compute_losses' [E,R] broadcasts line up and
        map_step never recompiles on a different kept-edge count.
        """
        Emax = self.map_cfg.max_edges
        HW = self.total_pixels
        edge_idii = np.zeros((Emax,), np.int32)
        edge_idjj = np.zeros((Emax,), np.int32)
        edge_valid = np.zeros((Emax,), bool)
        kept = 0
        if self._use_flow:
            flow_imgs = np.zeros((Emax, HW, 2), np.float16)
            flow_occ = np.zeros((Emax, HW), bool)
            if edges is not None:
                idii, idjj, ii, jj = edges
                ne = min(len(idii), Emax)
                for e in range(ne):
                    pair = self._load_flow_pair(int(ii[e]), int(jj[e]))
                    if pair is None:
                        continue
                    flow_imgs[kept] = pair[0]
                    flow_occ[kept] = pair[1]
                    edge_idii[kept] = int(idii[e])
                    edge_idjj[kept] = int(idjj[e])
                    edge_valid[kept] = True
                    kept += 1
        else:
            # flow is off for the whole run: 1-row placeholders keep the
            # (single) use_flow=False graph's operands tiny
            flow_imgs = np.zeros((1, HW, 2), np.float16)
            flow_occ = np.zeros((1, HW), bool)
        self._edge_refs = (
            jnp.asarray(edge_idii), jnp.asarray(edge_idjj),
            jnp.asarray(edge_valid), jnp.asarray(flow_imgs),
            jnp.asarray(flow_occ))

    def _slot_confidence(self, kfs: List[int],
                         frame_idx: int) -> Optional[np.ndarray]:
        """[Smax] per-slot loss confidence (see mapping.slot_confidence for
        the policy). Always an array — all-ones when the feature is off —
        so conf on/off never forks a new map_step compile variant (the
        weighting is a runtime input, not a graph change)."""
        if not self.conf_weight:
            return np.ones((self.map_cfg.max_slots,), np.float32)
        return slot_confidence(
            kfs, frame_idx, self.map_cfg.max_slots, self.keyframe_every,
            self.track_residual, floor=self.conf_floor,
            recency_kf=self.conf_recency_kf,
            residual_beta=self.conf_residual_beta)

    def _prepare_refs(self, keyframe_list: List[int],
                      frame_idx: int) -> MapBatchRefs:
        """Per-iteration slot data (the global keyframe draw changes every
        iteration for frame>=global_window_start); edge/flow arrays come
        from the per-call _prepare_edge_refs."""
        Smax = self.map_cfg.max_slots
        n = min(len(keyframe_list), Smax)
        kfs = keyframe_list[:n]
        for kf in kfs:
            self._stage_frame(kf)
        slot_rows = np.zeros((Smax,), np.int32)
        frame_ids = np.zeros((Smax,), np.int32)
        intr = np.tile(np.eye(4, dtype=np.float32)[None], (Smax, 1, 1))
        for s, kf in enumerate(kfs):
            slot_rows[s] = self.store.row(kf)
            frame_ids[s] = kf
            intr[s] = self.dataset.intrinsics_all[kf]

        slot_conf = self._slot_confidence(kfs, frame_idx)
        idii, idjj, valid, flow_imgs, flow_occ = self._edge_refs
        return MapBatchRefs(
            slot_rows=jnp.asarray(slot_rows),
            frame_ids=jnp.asarray(frame_ids),
            n_valid=jnp.asarray(n, jnp.int32),
            intrinsics=jnp.asarray(intr),
            edge_idii=idii,
            edge_idjj=idjj,
            edge_valid=valid,
            flow_imgs=flow_imgs,
            flow_occ=flow_occ,
            slot_conf=jnp.asarray(slot_conf),
        )

    def map(self, frame_idx: int, vis_hook=None):
        """One full mapping call (num_mapping_iters iterations)."""
        with self.timer.phase("mapping") as box:
            terms = self._map_impl(frame_idx, vis_hook)
            box["sync"] = terms["loss"]
        return terms

    def _map_impl(self, frame_idx: int, vis_hook=None):
        Smax = self.map_cfg.max_slots
        ba_snapshot: Dict[int, np.ndarray] = {}  # pose before 1st BA write
        for mapping_iter in range(self.num_mapping_iters):
            # mid-mapping visual observability (volsdf_train.py:531-536):
            # with the default inner_freq=1000 > iters this fires once, at
            # mapping_iter==0, for plot_freq-aligned frames
            if (vis_hook is not None and frame_idx > 1
                    and mapping_iter % self.mapping_inner_freq == 0
                    and frame_idx % self.plot_freq == 0):
                vis_hook(self, frame_idx, inner_iter=mapping_iter)
            win = self.kf_selector.window(frame_idx, mapping_iter)
            kfs = win.keyframe_list[:Smax]
            ba = (self.enable_BA and frame_idx > 0
                  and mapping_iter > int(self.num_mapping_iters * self.BA_ratio)
                  and mapping_iter <= int(self.num_mapping_iters
                                          * self.BA_end_ratio))

            if mapping_iter == 0:
                # the edge graph + flow GT are fixed for the whole call
                # (volsdf_train.py:326-346 loads flow once at iter 0)
                self._prepare_edge_refs(win.edges)
            # slot refs change when the keyframe set changes (every iter for
            # frame>=global_window_start: the global draw is fresh each time)
            refs = self._prepare_refs(kfs, frame_idx)

            poses_q = np.zeros((Smax, 7), np.float32)
            poses_q[:, 0] = 1.0
            for s, kf in enumerate(kfs):
                if ba and kf == 0:
                    src = self.dataset.gt_pose_all[kf]
                else:
                    src = self.est_pose_all.get(kf, self.dataset.gt_pose_all[kf])
                poses_q[s] = tensor_from_camera_np(src)
            poses_q = jnp.asarray(poses_q)

            if frame_idx > 1:
                stage = ("coarse" if mapping_iter < int(self.num_mapping_iters * 0.25)
                         else "fine")
                color_stage = ("base" if mapping_iter < int(self.num_mapping_iters * 0.7)
                               else "highfreq")
            else:
                stage, color_stage = "fine", "highfreq"

            beta_scale = None
            if self.beta_warmup_scale > 0 and frame_idx == 0:
                frac = min(mapping_iter / max(self.beta_warmup_iters, 1), 1.0)
                beta_scale = jnp.asarray(
                    self.beta_warmup_scale ** (1.0 - frac), jnp.float32)
            if (self.density_cache is not None
                    and mapping_iter % self.prepass_refresh == 0):
                self.density_cache = self._refresh_cache(self.params,
                                                         self.voxels)
            (self.params, self.opt_state, self.voxels, new_poses_q,
             terms) = map_step(
                self.scene_cfg, self.map_cfg, self.loss_cfg,
                self.params, self.opt_state, self.voxels, self.optimizer,
                poses_q, refs,
                self.store.rgb, self.store.depth, self.store.normal,
                self.store.gt_depth, self.store.mask,
                self._next_key(), self.density_cache, beta_scale,
                stage=stage, color_stage=color_stage, ba=ba,
                is_first_frame=(frame_idx == 0), use_flow=self._use_flow)

            if ba:
                new_q = np.asarray(new_poses_q)
                for s, kf in enumerate(kfs):
                    if kf == 0:
                        self.est_pose_all[kf] = np.asarray(
                            self.dataset.gt_pose_all[kf])
                    elif win.writeback_eligible[s]:
                        if kf not in ba_snapshot and kf in self.est_pose_all:
                            ba_snapshot[kf] = np.asarray(
                                self.est_pose_all[kf]).copy()
                        new_c2w = camera_from_tensor_np(new_q[s])
                        if (self.BA_trust_radius > 0
                                or self.BA_trust_rot_deg > 0):
                            if kf not in self._ba_anchor:
                                self._ba_anchor[kf] = np.asarray(
                                    self.est_pose_all.get(kf, new_c2w)).copy()
                            new_c2w = clamp_pose_to_anchor_np(
                                new_c2w, self._ba_anchor[kf],
                                self.BA_trust_radius, self.BA_trust_rot_deg)
                        self.est_pose_all[kf] = new_c2w

            if self.verbose and mapping_iter % 20 == 0:
                self.log(f"[map {frame_idx}:{mapping_iter}] "
                         f"loss {float(terms['loss']):.4f} "
                         f"rgb {float(terms['rgb_loss']):.4f} "
                         f"eik {float(terms['eikonal_loss']):.4f}")
        if self.pose_graph_propagate and ba_snapshot:
            self._propagate_ba_corrections(ba_snapshot)
        return terms

    def _propagate_ba_corrections(self, ba_snapshot: Dict[int, np.ndarray]):
        """Lightweight pose graph: frames BA never touched (non-keyframes
        between keyframes, and keyframes outside this call's window) are
        rigidly attached to their nearest preceding BA-corrected keyframe
        and receive its world-frame correction
        ``delta = est_new[k] @ inv(est_old[k])``. The reference leaves those
        poses stale (volsdf_train.py:584-592 only writes window keyframes),
        which at high per-frame motion is a standing inconsistency between
        the corrected window and the rest of the trajectory."""
        corrected = sorted(ba_snapshot.keys())
        deltas = {}
        for kf in corrected:
            new = np.asarray(self.est_pose_all[kf])
            old = ba_snapshot[kf]
            deltas[kf] = new @ np.linalg.inv(old)
        corrected_set = set(corrected)
        for j in sorted(self.est_pose_all.keys()):
            if j in corrected_set or j == 0:
                continue
            # nearest corrected keyframe at or below j
            k0 = None
            for kf in corrected:
                if kf <= j:
                    k0 = kf
                else:
                    break
            if k0 is None:
                continue
            self.est_pose_all[j] = deltas[k0] @ np.asarray(self.est_pose_all[j])

    # ------------------------------------------------------------------
    def run(self, vis_hook=None, frame_hook=None):
        """Main SLAM loop (volsdf_train.py:363-619). ``frame_hook(runner,
        frame_idx)`` fires after each frame's track(+map) — used by long-run
        drivers for interim trajectory metrics without touching the loop."""
        self.log("running...")
        t0 = time.time()
        frame_idx = self.start_frame_idx
        for frame_idx in range(self.start_frame_idx, self.n_images):
            if frame_idx % self.checkpoint_freq == 0 and frame_idx != 0:
                self.save_checkpoints(frame_idx)

            self.track(frame_idx)

            if frame_idx % self.mapping_every_frame == 0:
                self.map(frame_idx, vis_hook=vis_hook)

            if frame_hook is not None:
                frame_hook(self, frame_idx)

            if not self.quiet and frame_idx % 10 == 0:
                dt = time.time() - t0
                self.log(f"frame {frame_idx}/{self.n_images} "
                         f"({dt:.1f}s, {dt / max(frame_idx - self.start_frame_idx + 1, 1):.2f}s/frame)")

        self.save_checkpoints(frame_idx)
        if vis_hook is not None:
            with self.timer.phase("vis"):
                vis_hook(self, frame_idx)
        self.log("phase timings: " + self.timer.report())

    # ------------------------------------------------------------------
    def render_full_image(self, frame_idx: int, pose: Optional[np.ndarray] = None,
                          chunk: Optional[int] = None) -> Dict[str, np.ndarray]:
        """Render a full frame in fixed-size ray chunks (split_n_pixels
        equivalent, utils/general.py:169-185)."""
        from .render import render_image

        c2w = pose if pose is not None else self.est_pose_all.get(
            frame_idx, self.dataset.gt_pose_all[frame_idx])
        return render_image(
            self.scene_cfg, self.params, self.voxels,
            np.asarray(c2w), np.asarray(self.dataset.intrinsics_all[frame_idx]),
            frame_idx=frame_idx, chunk=chunk or self.split_n_pixels,
            key=self._next_key())
