import jax.numpy as jnp
import numpy as np
import pytest

from nicer_slam_tpu.utils import camera as cam


def random_pose(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    R = np.asarray(cam.quad2rotation(jnp.asarray(q, dtype=jnp.float32)))
    t = rng.normal(size=3)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = R
    pose[:3, 3] = t
    return pose


def test_quat_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(20):
        pose = random_pose(rng)
        t7 = cam.tensor_from_camera_np(pose)
        pose2 = cam.camera_from_tensor_np(t7)
        np.testing.assert_allclose(pose2, pose, atol=1e-5)


def test_quad2rotation_is_rotation():
    rng = np.random.default_rng(1)
    q = rng.normal(size=(8, 4)).astype(np.float32) * 2.0  # non-unit on purpose
    R = np.asarray(cam.quad2rotation(jnp.asarray(q)))
    for r in R:
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
        assert np.linalg.det(r) > 0.9


def test_load_K_Rt_from_P_roundtrip():
    rng = np.random.default_rng(2)
    K = np.array([[600.0, 0, 320, 0], [0, 600, 240, 0], [0, 0, 1, 0],
                  [0, 0, 0, 1]], dtype=np.float64)
    pose = random_pose(rng).astype(np.float64)
    w2c = np.linalg.inv(pose)
    P = (K @ w2c)[:3, :4]
    K_out, pose_out = cam.load_K_Rt_from_P(P)
    np.testing.assert_allclose(K_out[:3, :3], K[:3, :3], rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(pose_out[:3], pose[:3], rtol=1e-4, atol=1e-4)


def test_rays_squared_norm_convention():
    """ray_dirs are divided by squared norm (rend_util.py:92): therefore
    dot(ray_dir_cam, z_hat) * ||lift||^2 == 1, i.e. z-comp of returned dir
    in camera frame times squared norm is the depth conversion."""
    K = jnp.array([[[600.0, 0, 320, 0], [0, 600, 240, 0], [0, 0, 1, 0],
                    [0, 0, 0, 1]]])
    c2w = jnp.eye(4)[None]
    uv = jnp.array([[100.0, 50.0]])
    dirs, loc, depth_scale = cam.rays_from_uv(uv, c2w, K)
    lift = np.array([(100 - 320) / 600, (50 - 240) / 600, 1.0])
    sq = (lift ** 2).sum()
    np.testing.assert_allclose(np.asarray(dirs[0]), lift / sq, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(depth_scale[0, 0]), 1.0 / sq, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(loc[0]), 0.0, atol=1e-6)


def test_near_far_from_cube():
    o = jnp.array([[0.0, 0.0, -3.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    near, far = cam.near_far_from_cube(o, d, bound=1.0, near_min=0.0, far_max=3.5)
    np.testing.assert_allclose(np.asarray(near[0, 0]), 2.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(far[0, 0]), 3.5, atol=1e-5)
    # miss case
    o2 = jnp.array([[0.0, 5.0, -3.0]])
    near2, far2 = cam.near_far_from_cube(o2, d, 1.0, 0.0, 3.5)
    assert float(near2[0, 0]) >= 1e8


def test_procrustes_alignment_recovers_sim3():
    rng = np.random.default_rng(3)
    X0 = rng.normal(size=(50, 3))
    s, t = 2.5, np.array([1.0, -2.0, 0.5])
    q = rng.normal(size=4)
    R = np.asarray(cam.quad2rotation(jnp.asarray(q / np.linalg.norm(q),
                                                 dtype=jnp.float32)))
    X1 = (X0 @ R.T) * s + t
    sim3 = cam.procrustes_analysis_np(X0, X1)
    X1to0 = (X1 - sim3["t1"]) / sim3["s1"] @ sim3["R"].T * sim3["s0"] + sim3["t0"]
    np.testing.assert_allclose(X1to0, X0, atol=1e-4)


def test_clamp_pose_to_anchor():
    rng = np.random.default_rng(7)
    anchor = np.eye(4)
    # within-region pose untouched (both clamps active)
    p = np.eye(4)
    p[:3, 3] = [0.005, 0.0, 0.0]
    out = cam.clamp_pose_to_anchor_np(p, anchor, trans_radius=0.01,
                                      rot_deg=5.0)
    np.testing.assert_allclose(out, p, atol=1e-12)
    # zero radii = reference behavior: nothing clamped even far away
    p2 = np.eye(4)
    p2[:3, 3] = [10.0, 0.0, 0.0]
    out2 = cam.clamp_pose_to_anchor_np(p2, anchor, 0.0, 0.0)
    np.testing.assert_allclose(out2, p2, atol=1e-12)
    # translation clamped onto the radius sphere, direction preserved
    d = rng.normal(size=3)
    p3 = np.eye(4)
    p3[:3, 3] = d
    out3 = cam.clamp_pose_to_anchor_np(p3, anchor, trans_radius=0.02,
                                       rot_deg=0.0)
    np.testing.assert_allclose(np.linalg.norm(out3[:3, 3]), 0.02, atol=1e-9)
    np.testing.assert_allclose(out3[:3, 3] / 0.02, d / np.linalg.norm(d),
                               atol=1e-9)
    # rotation clamped to rot_deg about the same axis
    q = rng.normal(size=4)
    R = np.asarray(cam.quad2rotation(jnp.asarray(q / np.linalg.norm(q),
                                                 dtype=jnp.float32)),
                   dtype=np.float64)
    p4 = np.eye(4)
    p4[:3, :3] = R
    out4 = cam.clamp_pose_to_anchor_np(p4, anchor, 0.0, rot_deg=3.0)
    Rd = out4[:3, :3] @ anchor[:3, :3].T
    ang = np.degrees(np.arccos(np.clip((np.trace(Rd) - 1) / 2, -1, 1)))
    np.testing.assert_allclose(ang, 3.0, atol=1e-6)
    # clamped rotation is still orthonormal
    np.testing.assert_allclose(out4[:3, :3] @ out4[:3, :3].T, np.eye(3),
                               atol=1e-9)
    # axis preserved: composing the clamp direction further should reach R
    # (clamped delta is exp(theta_max * axis) for the delta's own axis)
    w, v = np.linalg.eig(Rd)
    ax_c = np.real(v[:, np.argmin(np.abs(w - 1))])
    w2, v2 = np.linalg.eig(p4[:3, :3])
    ax_f = np.real(v2[:, np.argmin(np.abs(w2 - 1))])
    assert abs(abs(ax_c @ ax_f)) > 0.999
