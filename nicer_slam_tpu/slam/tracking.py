"""Camera tracking: the per-frame pose optimization as ONE jitted lax.scan.

Reference (volsdf_train.py:363-446): per frame, 100 Adam iterations over a
7-dof quaternion+translation camera tensor, re-sampling 1024 pixels per iter,
rendering, RGB-L1 loss (tracking_loss weights), StepLR(50, 0.95), keeping the
post-step camera with minimal pre-step loss.

TPU-native: the reference round-trips pixels host<->device every iteration
(scene_dataset.py:227-232); here the frame's RGB lives on device once and
the entire 100-iteration loop — pixel sampling, rendering, backward, Adam,
best-candidate tracking — is a single lax.scan inside one jit. No host sync
until the frame is done.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..models import scene_model as sm
from ..models.losses import LossConfig, compute_losses
from ..utils.camera import camera_from_tensor
from .state import adam_init, adam_update


class TrackConfig(NamedTuple):
    num_iters: int = 100
    num_pixels: int = 1024
    cam_lr: float = 0.005
    Hedge: int = 0
    Wedge: int = 0
    # StepLR(step_size=50, gamma=0.95) (volsdf_train.py:398)
    lr_step_size: int = 50
    lr_gamma: float = 0.95
    # Per-dim lr scale on the quaternion dims (beyond-reference, 1.0 =
    # reference behavior). The tracker's Adam step is ~lr per dim per iter
    # regardless of gradient, so rotation jitter has the SAME noise floor
    # as translation — but a quaternion unit of jitter is worth far more
    # error (0.005 in quat space ~ 0.57 deg/iter wander). Shrinking only
    # the rotation dims attacks the raw rotation drift
    # (ate.rotation_drift) without touching translation capture range.
    rot_lr_scale: float = 1.0
    # Constant-velocity motion prior (beyond-reference, 0.0 = reference
    # behavior): quadratic pull toward the init pose (the runner's
    # constant-velocity extrapolation). Rationale (TRACK_NOISE_r04): the
    # photometric tracking gradient is noise once the pose is within the
    # render's resolving power, but Adam keeps taking ~lr-sized steps on
    # that noise — an unanchored random walk ~10x the true inter-frame
    # motion. A MAP-style prior g = 2*w*(q - q_init) gives the walk a
    # restoring force: it is negligible while the photometric gradient is
    # informative (large residual) and dominant once tracking is inside
    # its noise floor, capping per-frame wander at ~sqrt(photo_grad/(2w)).
    # Separate weights because one quaternion unit ~ 114 deg while one
    # translation unit is a scene unit.
    motion_prior_w: float = 0.0       # translation dims (tx ty tz)
    motion_prior_rot_w: float = 0.0   # quaternion dims (qw qx qy qz)
    # Decoupled spring toward the init pose (beyond-reference, 0.0 =
    # reference behavior), applied OUTSIDE the optimizer like AdamW's
    # decoupled weight decay: q <- q - s*(q - q_init) after each Adam
    # step. Rationale: Adam normalizes gradients per-dim, so an in-LOSS
    # prior's restoring force is capped at ~lr/iter no matter its weight
    # — it competes with the noise walk instead of damping it. The
    # decoupled spring pulls back a guaranteed fraction s per iter,
    # turning the unanchored ~lr random walk (TRACK_NOISE_r04) into a
    # mean-reverting one with stationary std ~ lr/sqrt(2s), while real
    # photometric signal can still displace the pose by ~(adam step)/s
    # per equilibrium — scale-free across quat and translation dims.
    motion_prior_spring: float = 0.0


def _sample_uv(key, n, H, W, Hedge, Wedge):
    """Random pixels within the (optionally cropped) image; returns
    (uv [n,2] float, flat_idx [n] int into the full H*W image)."""
    Hc, Wc = H - 2 * Hedge, W - 2 * Wedge
    idx = jax.random.randint(key, (n,), 0, Hc * Wc)
    y = idx // Wc + Hedge
    x = idx % Wc + Wedge
    uv = jnp.stack([x, y], axis=-1).astype(jnp.float32)
    return uv, y * W + x


@functools.partial(
    jax.jit,
    static_argnames=("scene_cfg", "track_cfg", "loss_cfg"),
)
def track_frame(
    scene_cfg: sm.SceneConfig,
    track_cfg: TrackConfig,
    loss_cfg: LossConfig,
    params: Dict[str, Any],
    voxels: jnp.ndarray,
    full_rgb_u8: jnp.ndarray,     # [H*W, 3] uint8
    intrinsics: jnp.ndarray,      # [4,4]
    init_q: jnp.ndarray,          # [7] qw qx qy qz tx ty tz
    key: jax.Array,
    density_cache=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Returns (best_q, final_q, aux) — aux has per-iter losses."""
    H, W = scene_cfg.H, scene_cfg.W
    R = track_cfg.num_pixels

    def step(carry, it):
        q, opt, best_loss, best_q = carry
        k = jax.random.fold_in(key, it)
        k_pix, k_render = jax.random.split(k)

        uv, flat_idx = _sample_uv(k_pix, R, H, W, track_cfg.Hedge,
                                  track_cfg.Wedge)
        gt_rgb = full_rgb_u8[flat_idx].astype(jnp.float32) / 255.0

        def loss_fn(q7):
            c2w = camera_from_tensor(q7)
            batch = sm.RayBatch(
                uv=uv,
                kf_slot=jnp.zeros((R,), jnp.int32),
                poses=c2w[None],
                intrinsics=intrinsics[None],
                frame_ids=jnp.zeros((1,), jnp.int32),
                slot_valid=jnp.ones((1,), bool),
                ray_valid=jnp.ones((R,), bool),
            )
            out = sm.render_rays(
                scene_cfg, params, voxels, batch, k_render,
                stage="fine", color_stage="highfreq", training=True,
                is_mapping=False, density_cache=density_cache)
            gt = {
                "rgb": gt_rgb,
                "depth": jnp.zeros((R, 1)),
                "normal": jnp.zeros((R, 3)),
                "gt_depth": jnp.zeros((R, 1)),
                "mask": jnp.ones((R, 1)),
            }
            terms = compute_losses(loss_cfg, out, gt, batch, stage="fine",
                                   num_slots=1)
            total = terms["loss"]
            if track_cfg.motion_prior_w or track_cfg.motion_prior_rot_w:
                dq = q7 - init_q
                total = total + (
                    track_cfg.motion_prior_rot_w * jnp.sum(dq[:4] ** 2)
                    + track_cfg.motion_prior_w * jnp.sum(dq[4:] ** 2))
            return total

        loss, grad = jax.value_and_grad(loss_fn)(q)
        # StepLR schedule
        decay = track_cfg.lr_gamma ** (opt.step // track_cfg.lr_step_size)
        lr = track_cfg.cam_lr * decay.astype(jnp.float32)
        update, opt = adam_update(opt, grad, lr)
        if track_cfg.rot_lr_scale != 1.0:
            dim_scale = jnp.where(jnp.arange(q.shape[0]) < 4,
                                  track_cfg.rot_lr_scale, 1.0)
            update = update * dim_scale
        q_new = q + update
        if track_cfg.motion_prior_spring:
            q_new = q_new - track_cfg.motion_prior_spring * (q_new - init_q)
        # keep the post-step camera associated with the min pre-step loss
        # (volsdf_train.py:441-443)
        better = loss < best_loss
        best_loss = jnp.where(better, loss, best_loss)
        best_q = jnp.where(better, q_new, best_q)
        return (q_new, opt, best_loss, best_q), loss

    init = (init_q, adam_init(init_q), jnp.asarray(1e10), init_q)
    (final_q, _, best_loss, best_q), losses = jax.lax.scan(
        step, init, jnp.arange(track_cfg.num_iters))
    return best_q, final_q, {"losses": losses, "best_loss": best_loss}
