"""Mapping: one jitted map-optimization step over a padded keyframe window.

Reference (volsdf_train.py:449-613): each mapping call runs 100 iterations;
every iteration re-samples mapping_num_pixels // len(keyframes) pixels per
keyframe, renders, evaluates the 9-term loss, steps the 6-group Adam, and —
when bundle adjustment is active (iter > 0.7*iters, frame>0) — steps a fresh
per-iteration Adam on the keyframe camera tensors.

TPU-native: rays live in ONE flat [R] array; ray r belongs to keyframe slot
r // (R // n_valid) (equal allocation like the reference's integer split,
remainder rays masked). n_valid is a traced scalar so keyframe-window size
changes never recompile. Pixel gathers read the device FrameStore.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..models import scene_model as sm
from ..models.losses import LossConfig, compute_losses
from ..utils.camera import camera_from_tensor
from .state import fresh_adam_single_step


class MapConfig(NamedTuple):
    num_pixels: int = 8192       # total rays per iteration
    max_slots: int = 32          # padded keyframe-window capacity
    max_edges: int = 96          # padded flow-edge capacity
    BA_cam_lr: float = 0.001


class MapBatchRefs(NamedTuple):
    """Per-mapping-call device data (constant across the 100 iters)."""

    slot_rows: jnp.ndarray     # [Smax] int32 row in FrameStore per slot
    frame_ids: jnp.ndarray     # [Smax] int32 global frame id per slot
    n_valid: jnp.ndarray       # [] int32 number of valid slots
    intrinsics: jnp.ndarray    # [Smax,4,4]
    # flow edges (padded)
    edge_idii: jnp.ndarray     # [E] int32 slot index
    edge_idjj: jnp.ndarray     # [E] int32 slot index
    edge_valid: jnp.ndarray    # [E] bool
    flow_imgs: jnp.ndarray     # [E, HW, 2] float16
    flow_occ: jnp.ndarray      # [E, HW] bool (True = usable)
    # optional [Smax] per-slot loss confidence (None = reference behavior);
    # rays inherit their slot's weight — see RayBatch.ray_weight
    slot_conf: Optional[jnp.ndarray] = None


def slot_confidence(kfs, frame_idx: int, max_slots: int,
                    keyframe_every: int, track_residual,
                    floor: float = 0.3, recency_kf: float = 2.0,
                    residual_beta: float = 0.0):
    """Host-side per-slot loss confidence (drift-loop damping).

    The drift feedback loop: tracking drifts a little -> mapping ingests the
    freshly-tracked pose at full weight and writes drifted geometry -> the
    corrupted map degrades subsequent tracking, compounding. BA only refines
    a pose on later mapping calls, so the youngest poses are the least
    reliable ones yet the reference weights them equally. This downweights a
    slot's rays by pose age — floor at age 0 ramping linearly to 1.0 over
    recency_kf keyframe periods — and (residual_beta > 0) divides by
    1 + beta*max(residual/median - 1, 0) for frames whose final tracking
    residual was above the window median. Frame 0 (GT-pinned) stays 1.
    """
    import numpy as np  # host-side

    conf = np.ones((max_slots,), np.float32)
    res = [track_residual[kf] for kf in kfs if kf in track_residual]
    med = float(np.median(res)) if res else 0.0
    ramp_span = max(keyframe_every * recency_kf, 1.0)
    for s, kf in enumerate(kfs[:max_slots]):
        if kf == 0:
            continue
        age = frame_idx - kf
        w = floor + (1.0 - floor) * min(age / ramp_span, 1.0)
        r = track_residual.get(kf)
        if residual_beta > 0 and r is not None and med > 0:
            w /= 1.0 + residual_beta * max(r / med - 1.0, 0.0)
        conf[s] = w
    return conf


def _ray_slots(R: int, n_valid: jnp.ndarray):
    """Equal per-slot allocation with remainder masked
    (volsdf_train.py:507's mapping_num_pixels // len(keyframe_list))."""
    per = R // jnp.maximum(n_valid, 1)
    r = jnp.arange(R, dtype=jnp.int32)
    slot = jnp.minimum(r // jnp.maximum(per, 1), n_valid - 1)
    valid = r < per * n_valid
    return slot.astype(jnp.int32), valid


@functools.partial(
    jax.jit,
    static_argnames=("scene_cfg", "map_cfg", "loss_cfg", "optimizer", "stage",
                     "color_stage", "ba", "use_flow", "shard_rays"),
    donate_argnames=("params", "opt_state", "voxels"),
)
def map_step(
    scene_cfg: sm.SceneConfig,
    map_cfg: MapConfig,
    loss_cfg: LossConfig,
    params: Dict[str, Any],
    opt_state,
    voxels: jnp.ndarray,
    optimizer: optax.GradientTransformation,
    poses_q: jnp.ndarray,        # [Smax, 7] per-slot camera tensors
    refs: MapBatchRefs,
    store_rgb: jnp.ndarray,      # [C, HW, 3] uint8
    store_depth: jnp.ndarray,    # [C, HW] f16
    store_normal: jnp.ndarray,   # [C, HW, 3] f16
    store_gt_depth: jnp.ndarray, # [C, HW] f16
    store_mask: jnp.ndarray,     # [C, HW] bool
    key: jax.Array,
    density_cache: Optional[jnp.ndarray] = None,
    beta_scale: Optional[jnp.ndarray] = None,
    *,
    stage: str,
    color_stage: str,
    ba: bool,
    is_first_frame=False,   # traced (bool or scalar) — no compile variant
    use_flow: bool,
    shard_rays=None,
):
    """One mapping iteration. Returns (params, opt_state, voxels, poses_q,
    terms dict)."""
    H, W = scene_cfg.H, scene_cfg.W
    HW = H * W
    R = map_cfg.num_pixels
    Smax = map_cfg.max_slots

    k_pix, k_render = jax.random.split(key)
    slot, ray_valid = _ray_slots(R, refs.n_valid)
    pix = jax.random.randint(k_pix, (R,), 0, HW)
    if shard_rays is not None:
        # data-parallel rays across chips: GSPMD propagates this sharding
        # through the whole render and all-reduces parameter gradients
        # (the psum over ICI, SURVEY.md §2.3) — params stay replicated.
        pix = jax.lax.with_sharding_constraint(pix, shard_rays)
        slot = jax.lax.with_sharding_constraint(slot, shard_rays)
        ray_valid = jax.lax.with_sharding_constraint(ray_valid, shard_rays)
    rows = refs.slot_rows[slot]                      # [R]

    uv = jnp.stack([(pix % W).astype(jnp.float32),
                    (pix // W).astype(jnp.float32)], axis=-1)

    gt = {
        "rgb": store_rgb[rows, pix].astype(jnp.float32) / 255.0,
        "depth": store_depth[rows, pix].astype(jnp.float32)[:, None],
        "normal": store_normal[rows, pix].astype(jnp.float32),
        "gt_depth": store_gt_depth[rows, pix].astype(jnp.float32)[:, None],
        "mask": store_mask[rows, pix].astype(jnp.float32)[:, None],
    }

    if use_flow:
        flow_gt = refs.flow_imgs[:, pix, :].astype(jnp.float32)   # [E,R,2]
        flow_mask = refs.flow_occ[:, pix]                         # [E,R]
        edges = sm.FlowEdges(idii=refs.edge_idii, idjj=refs.edge_idjj,
                             valid=refs.edge_valid)
    else:
        flow_gt = flow_mask = edges = None

    # warp machinery samples the slot images; map slots -> store rows once
    full_rgb_u8 = store_rgb[refs.slot_rows] if scene_cfg.use_warp_loss else None
    # mono-depth images feed the ps>1 patch depth-variance mask
    full_depth_img = (store_depth[refs.slot_rows]
                      if scene_cfg.use_warp_loss
                      and any(p > 1 for p in scene_cfg.patchsizes) else None)

    slot_valid = jnp.arange(Smax) < refs.n_valid

    ray_weight = (refs.slot_conf[slot] if refs.slot_conf is not None
                  else None)

    def loss_fn(p, q):
        poses = camera_from_tensor(q)                 # [Smax,4,4]
        batch = sm.RayBatch(
            uv=uv, kf_slot=slot, poses=poses, intrinsics=refs.intrinsics,
            frame_ids=refs.frame_ids, slot_valid=slot_valid,
            ray_valid=ray_valid, ray_weight=ray_weight)
        out = sm.render_rays(
            scene_cfg, p, voxels, batch, k_render,
            stage=stage, color_stage=color_stage, training=True,
            is_mapping=True, edges=edges, full_rgb=full_rgb_u8,
            full_depth=full_depth_img,
            density_cache=density_cache, beta_scale=beta_scale)
        terms = compute_losses(
            loss_cfg, out, gt, batch, stage=stage,
            is_first_frame=is_first_frame, num_slots=Smax,
            flow_gt=flow_gt, flow_mask=flow_mask, edges=edges)
        return terms["loss"], (terms, out["voxels"])

    if ba:
        (loss, (terms, new_voxels)), (g_params, g_poses) = (
            jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
                params, poses_q))
        # fresh-Adam single step on cameras (volsdf_train.py:527,577-578)
        poses_q = poses_q + fresh_adam_single_step(g_poses, map_cfg.BA_cam_lr)
    else:
        (loss, (terms, new_voxels)), g_params = (
            jax.value_and_grad(loss_fn, has_aux=True)(params, poses_q))

    updates, opt_state = optimizer.update(g_params, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, new_voxels, poses_q, terms
