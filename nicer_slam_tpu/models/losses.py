"""The SLAM loss stack (reference: code/model/loss.py + code/utils/MiDaS.py).

Nine weighted terms: RGB L1, scale/shift-invariant monocular depth (MiDaS),
normal L1+cos, eikonal, smoothness, optical flow, warp (photometric
reprojection), and GT-depth (used at frame 0 to pin metric scale when
``assign_scale_shift_init`` is on, loss.py:179-184).

Adapted to the flat-ray layout: the reference's per-keyframe image dimension
becomes per-ray keyframe-slot ids with segment reductions; the MiDaS
gradient regularizer's "neighboring pixel" pairs (which in the reference are
consecutive *randomly sampled* pixels of one keyframe, MiDaS.py:61-78)
become consecutive rays within the same slot — identical distribution.

Quirk preserved deliberately: the reference's normal cosine loss averages
over ALL rays with masked rays contributing the constant 1.0
(loss.py:93-98, masked entries are zero vectors) — we reproduce this so loss
magnitudes are comparable.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import Config
from ..ops.safe_math import safe_norm, safe_normalize
from .scene_model import RayBatch, FlowEdges


class LossConfig(NamedTuple):
    rgb_loss_weight: float = 1.0
    eikonal_weight: float = 0.0
    smooth_weight: float = 0.0
    depth_weight: float = 0.0
    normal_l1_weight: float = 0.0
    normal_cos_weight: float = 0.0
    gt_depth_weight: float = 0.0
    flow_weight: float = 0.0
    warp_loss_weight: float = 0.0
    warp_loss_type: str = "l1"
    assign_scale_shift_init: bool = False
    assign_scale: float = 20.0
    # dataset special case: Replica scan 4 uses a full depth mask
    # (loss.py:170-173)
    full_depth_mask: bool = False
    # Collapse guard (beyond-reference, 0 = off = reference behavior):
    # hinge relu(margin - sdf(camera_origin)) over the window's cameras.
    # Cameras are in free space by construction; at scale the objective has
    # a degenerate attractor where the SDF drifts all-negative and the idr
    # color net fits the views as a light field at the camera (round-5
    # forensics, BASELINE.md) — this pins the level where it is cheapest.
    cam_freespace_w: float = 0.0
    cam_freespace_margin: float = 0.05


def loss_config_from_conf(conf: Config, full_depth_mask: bool = False) -> LossConfig:
    return LossConfig(
        rgb_loss_weight=conf.get_float("rgb_loss_weight", 1.0),
        eikonal_weight=conf.get_float("eikonal_weight", 0.0),
        smooth_weight=conf.get_float("smooth_weight", 0.005)
        if "smooth_weight" in conf else 0.0,
        depth_weight=conf.get_float("depth_weight", 0.0),
        normal_l1_weight=conf.get_float("normal_l1_weight", 0.0),
        normal_cos_weight=conf.get_float("normal_cos_weight", 0.0),
        gt_depth_weight=conf.get_float("gt_depth_weight", 0.0),
        flow_weight=conf.get_float("flow_weight", 0.0),
        warp_loss_weight=conf.get_float("warp_loss_weight", 0.0),
        warp_loss_type=conf.get_string("warp_loss_type", "l1"),
        assign_scale_shift_init=conf.get_bool("assign_scale_shift_init", False),
        assign_scale=conf.get_float("assign_scale", 20.0),
        full_depth_mask=full_depth_mask,
        cam_freespace_w=conf.get_float("cam_freespace_w", 0.0),
        cam_freespace_margin=conf.get_float("cam_freespace_margin", 0.05),
    )


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    # select-before-reduce (the reference's boolean indexing, loss.py:100-111,
    # never touches masked entries): x*m would turn a masked inf/NaN — e.g.
    # an f16-overflowed flow value at an occluded pixel — into NaN (inf*0)
    # and poison the whole gradient.
    m = jnp.broadcast_to(mask, x.shape)
    mf = m.astype(x.dtype)
    return jnp.where(m, x, 0).sum() / jnp.maximum(mf.sum(), 1.0)


# ---------------------------------------------------------------------------
# MiDaS scale/shift-invariant depth loss (utils/MiDaS.py)
# ---------------------------------------------------------------------------

def compute_scale_and_shift_segments(pred, target, mask, seg_ids, num_segments):
    """Closed-form per-segment least squares (MiDaS.py:6-26) via segment sums.

    pred/target/mask: [R]; seg_ids: [R] int. Returns (scale[Ns], shift[Ns]).
    """
    seg = lambda v: jax.ops.segment_sum(v, seg_ids, num_segments=num_segments)
    a00 = seg(mask * pred * pred)
    a01 = seg(mask * pred)
    a11 = seg(mask)
    b0 = seg(mask * pred * target)
    b1 = seg(mask * target)
    det = a00 * a11 - a01 * a01
    valid = det != 0
    safe_det = jnp.where(valid, det, 1.0)
    x0 = jnp.where(valid, (a11 * b0 - a01 * b1) / safe_det, 0.0)
    x1 = jnp.where(valid, (-a01 * b0 + a00 * b1) / safe_det, 0.0)
    return x0, x1


def ssi_depth_loss(pred, target, mask, seg_ids, num_segments, alpha: float = 0.5):
    """ScaleAndShiftInvariantLoss(alpha=0.5, scales=1) on the flat layout
    (MiDaS.py:121-140, loss.py:49).

    pred/target/mask: [R] flat rays; segments = keyframe slots.
    """
    scale, shift = compute_scale_and_shift_segments(pred, target, mask,
                                                    seg_ids, num_segments)
    scale = jax.lax.stop_gradient(scale)
    shift = jax.lax.stop_gradient(shift)
    pred_ssi = scale[seg_ids] * pred + shift[seg_ids]

    # data term: sum(mask*res^2) / (2*sum(mask)) (MiDaS.py:52-58).
    # NOTE the divisor must be made safe BEFORE dividing — a bare
    # where(msum>0, x/msum, 0) still differentiates the untaken branch and
    # produces 0*inf = NaN gradients when the mask is empty.
    res = pred_ssi - target
    msum = mask.sum()
    msum_safe = jnp.maximum(msum, 1.0)
    data = jnp.where(msum > 0, (mask * res * res).sum() / (2.0 * msum_safe), 0.0)

    # gradient term, one scale: pairs of consecutive rays in the same slot
    diff = mask * (pred_ssi - target)
    pair = (seg_ids[1:] == seg_ids[:-1]).astype(pred.dtype)
    grad = jnp.abs(diff[1:] - diff[:-1]) * mask[1:] * mask[:-1] * pair
    reg = jnp.where(msum > 0, grad.sum() / msum_safe, 0.0)
    return data + alpha * reg


# ---------------------------------------------------------------------------
# Individual terms
# ---------------------------------------------------------------------------

def rgb_l1(pred, gt, ray_valid):
    return _masked_mean(jnp.abs(pred - gt), ray_valid[:, None])


def eikonal_loss(grad_theta):
    return ((safe_norm(grad_theta, axis=1) - 1.0) ** 2).mean()


def smooth_loss(g1, g2):
    n1 = g1 / (safe_norm(g1, axis=1, keepdims=True) + 1e-5)
    n2 = g2 / (safe_norm(g2, axis=1, keepdims=True) + 1e-5)
    return safe_norm(n1 - n2, axis=-1).mean()


def normal_losses(normal_pred, normal_gt, mask):
    """loss.py:93-98 with the pre-masking convention of loss.py:193."""
    ng = safe_normalize(normal_gt, axis=-1)
    np_ = safe_normalize(normal_pred, axis=-1)
    m = mask.astype(normal_pred.dtype)
    ng = ng * m
    np_ = np_ * m
    l1 = jnp.abs(np_ - ng).sum(axis=-1).mean()
    cos = (1.0 - (np_ * ng).sum(axis=-1)).mean()
    return l1, cos


def gt_depth_l1(depth_pred, depth_gt, mask):
    return _masked_mean(jnp.abs(depth_pred - depth_gt), mask)


def flow_l1(flow_pred, flow_gt, mask):
    """[E,R,2] masked mean (loss.py:100-111)."""
    return _masked_mean(jnp.abs(flow_pred - flow_gt), mask[..., None])


def warp_l1(sampled_rgb, gt_rgb, mask):
    """[S,R,pp,3] sampled vs per-ray-patch gt (broadcast over targets),
    masked mean (loss.py:136-155, l1 path)."""
    diff = jnp.abs(sampled_rgb - gt_rgb[None])
    return _masked_mean(diff, mask[..., None])


def _gaussian_window(ps: int, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(ps, dtype=jnp.float32) - ps // 2
    g = jnp.exp(-(x ** 2) / (2.0 * sigma ** 2))
    g = g / g.sum()
    return (g[:, None] * g[None, :]).reshape(-1)       # [ps*ps], sums to 1


def warp_ssim(sampled_rgb, gt_rgb, mask, ps: int, patch_w=None):
    """Per-patch gaussian SSIM warp loss (loss.py:139-149 "ssim" path:
    pytorch_msssim SSIM with win_size=patchsize -> one valid position per
    patch). Masked elements are zeroed first, exactly like the reference;
    fully-masked patches yield SSIM 1 and contribute zero loss. Returns
    (1 - mean ssim) — the caller applies the reference's 0.05 factor.

    patch_w: optional [S,R] per-patch weight (confidence-weighted mapping);
    the mean becomes weight-normalized, exactly the plain mean at all-ones."""
    m = mask[..., None].astype(sampled_rgb.dtype)
    x = (sampled_rgb * m).reshape(-1, ps * ps, 3)
    y = (jnp.broadcast_to(gt_rgb[None], sampled_rgb.shape) * m
         ).reshape(-1, ps * ps, 3)
    w = _gaussian_window(ps)
    mu1 = jnp.einsum("p,npc->nc", w, x)
    mu2 = jnp.einsum("p,npc->nc", w, y)
    s1 = jnp.einsum("p,npc->nc", w, x * x) - mu1 * mu1
    s2 = jnp.einsum("p,npc->nc", w, y * y) - mu2 * mu2
    s12 = jnp.einsum("p,npc->nc", w, x * y) - mu1 * mu2
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    ssim = (((2 * mu1 * mu2 + C1) * (2 * s12 + C2))
            / ((mu1 * mu1 + mu2 * mu2 + C1) * (s1 + s2 + C2)))
    if patch_w is None:
        return 1.0 - ssim.mean()
    w = jnp.broadcast_to(patch_w.reshape(-1)[:, None], ssim.shape)
    return 1.0 - (ssim * w).sum() / jnp.maximum(w.sum(), 1.0)


# ---------------------------------------------------------------------------
# Full stack (loss.py:113-233)
# ---------------------------------------------------------------------------

def compute_losses(
    cfg: LossConfig,
    outputs: Dict[str, jnp.ndarray],
    gt: Dict[str, jnp.ndarray],
    batch: RayBatch,
    *,
    stage: str = "fine",
    is_first_frame: bool = False,
    num_slots: int = 1,
    flow_gt: Optional[jnp.ndarray] = None,     # [E,R,2]
    flow_mask: Optional[jnp.ndarray] = None,   # [E,R] bool
    edges: Optional[FlowEdges] = None,
) -> Dict[str, jnp.ndarray]:
    rgb_pred = outputs["rgb_values"]
    depth_pred = outputs["depth_values"][:, 0]
    normal_pred = outputs["normal_map"]
    ray_valid = batch.ray_valid

    # per-ray loss weight = validity x optional confidence (RayBatch.
    # ray_weight); every per-ray masked mean below normalizes by the weight
    # sum, so all-ones/None reproduces the reference's plain masked means.
    rw = ray_valid.astype(jnp.float32)
    if batch.ray_weight is not None:
        rw = rw * batch.ray_weight

    # is_first_frame is TRACED (bool or scalar array): the frame-0 anchor
    # regime shares the compiled graph with regular frames (map_step compile
    # variants are expensive; a where-select is free).
    ff = jnp.asarray(is_first_frame, jnp.float32)

    terms: Dict[str, jnp.ndarray] = {}
    terms["rgb_loss"] = rgb_l1(rgb_pred, gt["rgb"], rw)

    # foreground mask: SDF sign change along the ray & dataset mask
    sdf = outputs["sdf"]
    sign_change = jnp.any(sdf > 0.0, axis=-1) & jnp.any(sdf < 0.0, axis=-1)
    mask = (sign_change & (gt["mask"][:, 0] > 0.5)).astype(jnp.float32) * rw

    # warp: sum over configured patchsizes (loss.py:132-155); ps==1 always
    # uses l1, ps>1 uses l1 or gaussian-window SSIM x0.05 per warp_loss_type
    warp_keys = sorted(k for k in outputs if k.startswith("warp_sampled_rgb_"))
    if cfg.warp_loss_weight > 0 and stage == "fine" and warp_keys:
        warp_total = jnp.asarray(0.0)
        for key in warp_keys:
            ps = int(key.rsplit("_", 1)[1])
            sampled = outputs[key]
            gt_patch = outputs[f"warp_gt_rgb_{ps}"]
            wmask = outputs[f"warp_mask_{ps}"]            # [S,R,pp] bool
            if batch.ray_weight is not None:
                wmask_w = wmask.astype(jnp.float32) * rw[None, :, None]
                patch_w = jnp.broadcast_to(rw[None, :],
                                           wmask.shape[:2])
            else:
                wmask_w, patch_w = wmask, None
            if ps == 1 or cfg.warp_loss_type == "l1":
                warp_total = warp_total + warp_l1(sampled, gt_patch, wmask_w)
            elif cfg.warp_loss_type == "ssim":
                warp_total = warp_total + 0.05 * warp_ssim(
                    sampled, gt_patch, wmask, ps, patch_w=patch_w)
            else:
                raise ValueError(
                    f"unknown warp_loss_type {cfg.warp_loss_type}")
        # the reference skips warp at frame 0 (no other keyframes to warp
        # into); traced gate instead of a compile variant
        terms["warp_loss"] = warp_total * (1.0 - ff)
    else:
        terms["warp_loss"] = jnp.asarray(0.0)

    # eikonal + smooth
    if cfg.eikonal_weight > 0 and "grad_theta" in outputs:
        terms["eikonal_loss"] = eikonal_loss(outputs["grad_theta"])
    else:
        terms["eikonal_loss"] = jnp.asarray(0.0)
    if cfg.smooth_weight > 0 and "grad_theta" in outputs:
        terms["smooth_loss"] = smooth_loss(outputs["grad_theta"],
                                           outputs["grad_theta_nei"])
    else:
        terms["smooth_loss"] = jnp.asarray(0.0)

    # monocular (scale/shift-invariant) depth
    if cfg.depth_weight > 0:
        depth_mask = rw if cfg.full_depth_mask else mask
        terms["depth_loss"] = ssi_depth_loss(
            depth_pred, gt["depth"][:, 0] * 50.0 + 0.5,
            depth_mask.astype(depth_pred.dtype), batch.kf_slot, num_slots)
    else:
        terms["depth_loss"] = jnp.asarray(0.0)

    # gt depth (metric anchor); at frame 0 assign_scale_shift_init rebinds it
    gt_depth_weight = cfg.gt_depth_weight
    depth_real_gt = gt["gt_depth"][:, 0]
    if cfg.assign_scale_shift_init:
        # frame 0 rebinds the term to mono_depth * assign_scale at weight 10
        # (loss.py:179-184); afterwards the term is off. Traced select so
        # the anchor regime doesn't fork the compiled graph.
        depth_real_gt = jnp.where(ff > 0,
                                  gt["depth"][:, 0] * cfg.assign_scale,
                                  depth_real_gt)
        gt_depth_weight = ff * 10.0
        gt_depth_static_on = True
    else:
        gt_depth_static_on = cfg.gt_depth_weight > 0
    if gt_depth_static_on:
        # mask is (gt_depth > 0) even for frame 0's mono-rebased target
        # (loss.py:186-187)
        gt_depth_mask = (gt["gt_depth"][:, 0] > 0).astype(jnp.float32) * rw
        terms["gt_depth_loss"] = gt_depth_l1(depth_pred, depth_real_gt,
                                             gt_depth_mask)
    else:
        terms["gt_depth_loss"] = jnp.asarray(0.0)

    # normals
    if cfg.normal_l1_weight > 0 or cfg.normal_cos_weight > 0:
        l1, cos = normal_losses(normal_pred, gt["normal"], mask[:, None])
        terms["normal_l1"] = l1
        terms["normal_cos"] = cos
    else:
        terms["normal_l1"] = jnp.asarray(0.0)
        terms["normal_cos"] = jnp.asarray(0.0)

    # flow
    if cfg.flow_weight > 0 and "flow" in outputs and flow_gt is not None:
        e_mask = (
            (batch.kf_slot[None, :] == edges.idii[:, None])
            & edges.valid[:, None]
            & flow_mask
        ).astype(jnp.float32) * rw[None, :]
        terms["flow_loss"] = flow_l1(outputs["flow"], flow_gt, e_mask)
    else:
        terms["flow_loss"] = jnp.asarray(0.0)

    # collapse guard (beyond-reference; see LossConfig.cam_freespace_w)
    if cfg.cam_freespace_w > 0 and "cam_sdf" in outputs:
        sv = batch.slot_valid.astype(jnp.float32)
        hinge = jnp.maximum(
            cfg.cam_freespace_margin - outputs["cam_sdf"], 0.0)
        terms["cam_freespace_loss"] = ((hinge * sv).sum()
                                       / jnp.maximum(sv.sum(), 1.0))
    else:
        terms["cam_freespace_loss"] = jnp.asarray(0.0)

    total = (
        cfg.flow_weight * terms["flow_loss"]
        + cfg.depth_weight * terms["depth_loss"]
        + cfg.rgb_loss_weight * terms["rgb_loss"]
        + cfg.smooth_weight * terms["smooth_loss"]
        + cfg.normal_l1_weight * terms["normal_l1"]
        + cfg.warp_loss_weight * terms["warp_loss"]
        + cfg.eikonal_weight * terms["eikonal_loss"]
        + cfg.normal_cos_weight * terms["normal_cos"]
        + gt_depth_weight * terms["gt_depth_loss"]
        + cfg.cam_freespace_w * terms["cam_freespace_loss"]
    )
    terms["loss"] = total
    return terms
