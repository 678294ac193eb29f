"""Camera math: projection decomposition, quaternion SE(3), ray generation.

Behavioral reference (cvg/nicer-slam):
  * ``code/utils/rend_util.py:44-65``  load_K_Rt_from_P via
    cv2.decomposeProjectionMatrix
  * ``code/utils/rend_util.py:68-93``  get_camera_params — note the ray
    directions are divided by the SQUARED norm (rend_util.py:92); this sets
    the z_vals/depth scale convention of the whole system and is reproduced
    deliberately here.
  * ``code/utils/general.py:52-126``   quaternion<->matrix pose
    parameterization used by tracking/BA ([qw qx qy qz tx ty tz]).
  * ``code/utils/cam_util.py``         Procrustes sim(3) alignment.

Two flavors live here: numpy host-side helpers (dataset loading, eval) and
jax differentiable versions (inside jitted render/track/map steps).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# numpy host-side
# ---------------------------------------------------------------------------

def load_K_Rt_from_P(P: np.ndarray):
    """Decompose a 3x4 projection into intrinsics K (4x4) and c2w pose (4x4).

    Matches the reference's cv2.decomposeProjectionMatrix path
    (rend_util.py:44-65): K normalized by K[2,2]; pose is camera-to-world
    with R transposed and camera center from the homogeneous part.
    """
    import cv2

    out = cv2.decomposeProjectionMatrix(np.asarray(P, dtype=np.float64))
    K = out[0]
    R = out[1]
    t = out[2]

    K = K / K[2, 2]
    intrinsics = np.eye(4, dtype=np.float32)
    intrinsics[:3, :3] = K.astype(np.float32)

    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = R.transpose().astype(np.float32)
    pose[:3, 3] = (t[:3] / t[3])[:, 0].astype(np.float32)
    return intrinsics, pose


def rot_to_quat_np(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> unit quaternion [w x y z], robust (Shepperd)."""
    R = np.asarray(R, dtype=np.float64)
    m00, m01, m02 = R[0]
    m10, m11, m12 = R[1]
    m20, m21, m22 = R[2]
    tr = m00 + m11 + m22
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2.0
        w = 0.25 * s
        x = (m21 - m12) / s
        y = (m02 - m20) / s
        z = (m10 - m01) / s
    elif m00 > m11 and m00 > m22:
        s = np.sqrt(1.0 + m00 - m11 - m22) * 2.0
        w = (m21 - m12) / s
        x = 0.25 * s
        y = (m01 + m10) / s
        z = (m02 + m20) / s
    elif m11 > m22:
        s = np.sqrt(1.0 + m11 - m00 - m22) * 2.0
        w = (m02 - m20) / s
        x = (m01 + m10) / s
        y = 0.25 * s
        z = (m12 + m21) / s
    else:
        s = np.sqrt(1.0 + m22 - m00 - m11) * 2.0
        w = (m10 - m01) / s
        x = (m02 + m20) / s
        y = (m12 + m21) / s
        z = 0.25 * s
    q = np.array([w, x, y, z], dtype=np.float64)
    if q[0] < 0:
        q = -q
    return (q / np.linalg.norm(q)).astype(np.float32)


def tensor_from_camera_np(c2w: np.ndarray) -> np.ndarray:
    """4x4 (or 3x4) c2w -> 7-vector [qw qx qy qz tx ty tz].

    Replaces the reference's mathutils-based get_tensor_from_camera
    (general.py:103-126).
    """
    c2w = np.asarray(c2w)
    R, T = c2w[:3, :3], c2w[:3, 3]
    quad = rot_to_quat_np(R)
    return np.concatenate([quad, np.asarray(T, dtype=np.float32)], 0)


def camera_from_tensor_np(t7: np.ndarray) -> np.ndarray:
    return np.asarray(camera_from_tensor(jnp.asarray(t7)))


# ---------------------------------------------------------------------------
# jax differentiable pose parameterization (general.py:52-100 semantics)
# ---------------------------------------------------------------------------

def quad2rotation(quad: jnp.ndarray) -> jnp.ndarray:
    """Batch quaternion [.,4] (w x y z, NOT necessarily unit) -> [.,3,3].

    Uses the 2/(q.q) scaling of the reference (general.py:52-76) so the pose
    stays differentiable without explicit normalization.
    """
    single = quad.ndim == 1
    if single:
        quad = quad[None]
    qr, qi, qj, qk = quad[:, 0], quad[:, 1], quad[:, 2], quad[:, 3]
    two_s = 2.0 / (quad * quad).sum(-1)
    r00 = 1 - two_s * (qj * qj + qk * qk)
    r01 = two_s * (qi * qj - qk * qr)
    r02 = two_s * (qi * qk + qj * qr)
    r10 = two_s * (qi * qj + qk * qr)
    r11 = 1 - two_s * (qi * qi + qk * qk)
    r12 = two_s * (qj * qk - qi * qr)
    r20 = two_s * (qi * qk - qj * qr)
    r21 = two_s * (qj * qk + qi * qr)
    r22 = 1 - two_s * (qi * qi + qj * qj)
    R = jnp.stack(
        [
            jnp.stack([r00, r01, r02], -1),
            jnp.stack([r10, r11, r12], -1),
            jnp.stack([r20, r21, r22], -1),
        ],
        -2,
    )
    return R[0] if single else R


def camera_from_tensor(t7: jnp.ndarray) -> jnp.ndarray:
    """[.,7] ([qw qx qy qz tx ty tz]) -> [.,4,4] c2w, differentiable."""
    single = t7.ndim == 1
    if single:
        t7 = t7[None]
    quad, T = t7[:, :4], t7[:, 4:]
    R = quad2rotation(quad)
    RT = jnp.concatenate([R, T[:, :, None]], axis=2)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=RT.dtype).reshape(1, 1, 4),
        (RT.shape[0], 1, 4),
    )
    RT = jnp.concatenate([RT, bottom], axis=1)
    return RT[0] if single else RT


def quat_rotation_error_degrees(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Angle (deg) between two quaternions (general.py:9-28)."""
    q1 = q1 / (jnp.linalg.norm(q1) + 1e-12)
    q2 = q2 / (jnp.linalg.norm(q2) + 1e-12)
    dot = jnp.clip(jnp.abs(jnp.dot(q1, q2)), 0.0, 1.0)
    return jnp.arccos(dot) * (180.0 / jnp.pi)


# ---------------------------------------------------------------------------
# ray generation (rend_util.py:68-129 semantics, per-ray flat layout)
# ---------------------------------------------------------------------------

def lift_pixels(uv: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Lift pixel coords [R,2] at depth 1 into camera space homog [R,4].

    K is per-ray [R,4,4] (or broadcastable). Supports the skew term the
    reference carries (rend_util.py:107-129).
    """
    x, y = uv[..., 0], uv[..., 1]
    fx = K[..., 0, 0]
    fy = K[..., 1, 1]
    cx = K[..., 0, 2]
    cy = K[..., 1, 2]
    sk = K[..., 0, 1]
    z = jnp.ones_like(x)
    x_lift = (x - cx + cy * sk / fy - sk * y / fy) / fx * z
    y_lift = (y - cy) / fy * z
    return jnp.stack([x_lift, y_lift, z, jnp.ones_like(z)], axis=-1)


def rays_from_uv(uv: jnp.ndarray, c2w: jnp.ndarray, K: jnp.ndarray):
    """Per-ray world ray dirs + cam origins, reproducing the reference's
    squared-norm convention (rend_util.py:92).

    Args:
      uv:  [R,2] pixel coords
      c2w: [R,4,4] per-ray camera-to-world
      K:   [R,4,4] per-ray intrinsics
    Returns:
      ray_dirs [R,3] (divided by squared norm!), cam_loc [R,3],
      depth_scale [R,1] (z-component of the identity-pose ray — converts
      rendered z-distances to pinhole depth; network.py:99-102).
    """
    p_cam = lift_pixels(uv, K)  # [R,4]
    world = jnp.einsum("rij,rj->ri", c2w, p_cam)[..., :3]
    cam_loc = c2w[..., :3, 3]
    dirs = world - cam_loc
    sq = (dirs * dirs).sum(-1, keepdims=True)
    ray_dirs = dirs / sq
    # identity-pose trick: with pose=I the ray is p_cam[:3] itself
    dirs_tmp = p_cam[..., :3]
    sq_tmp = (dirs_tmp * dirs_tmp).sum(-1, keepdims=True)
    depth_scale = (dirs_tmp / sq_tmp)[..., 2:3]
    return ray_dirs, cam_loc, depth_scale


def near_far_from_cube(rays_o: jnp.ndarray, rays_d: jnp.ndarray, bound: float,
                       near_min: float, far_max: float):
    """Axis-aligned cube intersection (ray_sampler.py:23-35)."""
    tmin = (-bound - rays_o) / (rays_d + 1e-15)
    tmax = (bound - rays_o) / (rays_d + 1e-15)
    near = jnp.minimum(tmin, tmax).max(axis=-1, keepdims=True)
    far = jnp.maximum(tmin, tmax).min(axis=-1, keepdims=True)
    miss = far < near
    near = jnp.where(miss, 1e9, near)
    far = jnp.where(miss, 1e9, far)
    near = jnp.maximum(near, near_min)
    far = jnp.minimum(far, far_max)
    return near, far


# ---------------------------------------------------------------------------
# Procrustes sim(3) alignment (cam_util.py:73-115)
# ---------------------------------------------------------------------------

def procrustes_analysis_np(X0: np.ndarray, X1: np.ndarray):
    """Similarity transform aligning X1 to X0 (both [N,3])."""
    t0 = X0.mean(axis=0, keepdims=True)
    t1 = X1.mean(axis=0, keepdims=True)
    X0c, X1c = X0 - t0, X1 - t1
    s0 = np.sqrt((X0c ** 2).sum(axis=-1).mean())
    s1 = np.sqrt((X1c ** 2).sum(axis=-1).mean())
    U, S, Vt = np.linalg.svd((X0c / s0).T @ (X1c / s1))
    R = (U @ Vt).astype(np.float64)
    if np.linalg.det(R) < 0:
        R[2] *= -1
    return dict(t0=t0[0], t1=t1[0], s0=s0, s1=s1, R=R.astype(np.float32))


def invert_pose_np(pose: np.ndarray) -> np.ndarray:
    """Invert [...,3,4] rigid pose(s)."""
    R, t = pose[..., :3], pose[..., 3:]
    R_inv = np.swapaxes(R, -1, -2)
    t_inv = -(R_inv @ t)
    return np.concatenate([R_inv, t_inv], axis=-1)


def clamp_pose_to_anchor_np(pose: np.ndarray, anchor: np.ndarray,
                            trans_radius: float = 0.0,
                            rot_deg: float = 0.0) -> np.ndarray:
    """Clamp a 4x4 c2w pose into a trust region around an anchor pose.

    Beyond-reference BA safety rail (radius 0 = untouched = reference
    behavior). Motivation (LONG_SEQ_FINAL_r05 post-mortem): the reference's
    per-iteration fresh-Adam BA step (volsdf_train.py:511-528,575-578) is a
    sign step of magnitude BA_cam_lr, so any persistently-biased mapping-loss
    pose gradient drags a keyframe ~BA_cam_lr per iteration for as long as it
    stays in the window — observed as 0.06-0.25 keyframe displacements at a
    0.0012 per-frame motion scale. A trust region bounds the lifetime BA
    correction to the scale of the tracking noise it exists to fix.

    trans_radius: max ||t - t_anchor|| (scene units); rot_deg: max geodesic
    rotation from the anchor orientation. Either 0 disables that clamp.
    """
    out = np.asarray(pose, np.float64).copy()
    anchor = np.asarray(anchor, np.float64)
    if trans_radius > 0:
        d = out[:3, 3] - anchor[:3, 3]
        n = float(np.linalg.norm(d))
        if n > trans_radius:
            out[:3, 3] = anchor[:3, 3] + d * (trans_radius / n)
    if rot_deg > 0:
        R_delta = out[:3, :3] @ anchor[:3, :3].T
        cos = np.clip((np.trace(R_delta) - 1.0) / 2.0, -1.0, 1.0)
        theta = float(np.arccos(cos))
        theta_max = np.radians(rot_deg)
        if theta > theta_max and theta > 1e-9:
            # axis of R_delta, rescaled to theta_max (Rodrigues)
            ax = np.array([R_delta[2, 1] - R_delta[1, 2],
                           R_delta[0, 2] - R_delta[2, 0],
                           R_delta[1, 0] - R_delta[0, 1]])
            ax = ax / max(np.linalg.norm(ax), 1e-12)
            K = np.array([[0, -ax[2], ax[1]],
                          [ax[2], 0, -ax[0]],
                          [-ax[1], ax[0], 0]])
            R_clamped = (np.eye(3) + np.sin(theta_max) * K
                         + (1 - np.cos(theta_max)) * (K @ K))
            out[:3, :3] = R_clamped @ anchor[:3, :3]
    return out.astype(np.asarray(pose).dtype)


def prealign_cameras_apply_another_np(pose: np.ndarray, pose_GT: np.ndarray,
                                      apply_pose: np.ndarray):
    """sim(3)-align ``pose`` onto ``pose_GT`` and apply it to ``apply_pose``.

    All inputs are c2w [N,3,4] (the reference feeds c2w and immediately
    inverts, cam_util.py:94-115). Returns (aligned c2w [N,3,4], sim3 dict).
    """
    pose_w2c = invert_pose_np(pose)
    pose_GT_w2c = invert_pose_np(pose_GT)
    apply_w2c = invert_pose_np(apply_pose)

    def centers(p_w2c):
        # camera center in world coords: invert again and take translation
        inv = invert_pose_np(p_w2c)
        return inv[..., :3, 3]

    center_pred = centers(pose_w2c)
    center_GT = centers(pose_GT_w2c)
    center_apply = centers(apply_w2c)
    try:
        sim3 = procrustes_analysis_np(center_GT, center_pred)
    except np.linalg.LinAlgError:
        sim3 = dict(t0=np.zeros(3), t1=np.zeros(3), s0=1.0, s1=1.0,
                    R=np.eye(3, dtype=np.float32))
    center_aligned = (center_apply - sim3["t1"]) / sim3["s1"] @ sim3["R"].T * sim3["s0"] + sim3["t0"]
    R_aligned = apply_w2c[..., :3] @ sim3["R"].T
    t_aligned = (-R_aligned @ center_aligned[..., None])[..., 0]
    aligned_w2c = np.concatenate([R_aligned, t_aligned[..., None]], axis=-1)
    return invert_pose_np(aligned_w2c), sim3


def from_euler_np(angles: np.ndarray) -> np.ndarray:
    """Euler XYZ -> rotation matrices (rend_util.py:191-211)."""
    sx, sy, sz = np.sin(angles).T
    cx, cy, cz = np.cos(angles).T
    m = np.stack([
        np.stack([cy * cz, sx * sy * cz - cx * sz, cx * sy * cz + sx * sz], -1),
        np.stack([cy * sz, sx * sy * sz + cx * cz, cx * sy * sz - sx * cz], -1),
        np.stack([-sy, sx * cy, cx * cy], -1),
    ], -2)
    return m
