import os

import numpy as np
import pytest

from nicer_slam_tpu.ops.marching_cubes import extract_mesh, marching_tetrahedra
from nicer_slam_tpu.utils.ply import read_ply, write_ply
from nicer_slam_tpu.utils import metrics as M
from nicer_slam_tpu.evaluation import ate
from nicer_slam_tpu.evaluation.eval_rec import (eval_pointcloud, icp_align,
                                                sample_mesh_points)


def sphere_sdf_grid(res=48, r=0.6):
    xs = np.linspace(-1, 1, res)
    g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1)
    return r - np.linalg.norm(g, axis=-1), xs[1] - xs[0]


def test_marching_tetrahedra_sphere():
    vol, step = sphere_sdf_grid()
    verts, faces, normals = marching_tetrahedra(
        vol, spacing=(step,) * 3, origin=(-1, -1, -1))
    assert verts.shape[0] > 500
    # vertices must be genuinely distinct (guards the dedup logic)
    assert np.unique(np.round(verts, 5), axis=0).shape[0] > 500
    radii = np.linalg.norm(verts, axis=-1)
    np.testing.assert_allclose(radii.mean(), 0.6, atol=0.02)
    assert 0 < radii.std() < 0.02
    # faces index valid vertices
    assert faces.max() < verts.shape[0]
    # normals approximately unit + radial (vol positive inside ->
    # -gradient points outward)
    nn = np.linalg.norm(normals, axis=-1)
    np.testing.assert_allclose(nn, 1.0, atol=1e-3)
    radial = verts / (radii[:, None] + 1e-9)
    cos = (normals * radial).sum(-1)
    assert np.abs(cos).mean() > 0.97


def test_extract_mesh_from_sdf_fn():
    def sdf(pts):
        return 0.5 - np.linalg.norm(pts, axis=-1)

    mesh = extract_mesh(sdf, resolution=40, grid_boundary=(-1, 1))
    assert mesh is not None
    verts, faces, normals = mesh
    np.testing.assert_allclose(
        np.linalg.norm(verts, axis=-1).mean(), 0.5, atol=0.03)
    # empty level set
    assert extract_mesh(lambda p: np.full(p.shape[0], 5.0), 16) is None


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    verts = rng.normal(size=(50, 3)).astype(np.float32)
    faces = rng.integers(0, 50, (30, 3)).astype(np.int64)
    normals = rng.normal(size=(50, 3)).astype(np.float32)
    colors = rng.uniform(0, 1, (50, 3)).astype(np.float32)
    p = str(tmp_path / "m.ply")
    write_ply(p, verts, faces, normals=normals, colors=colors)
    m = read_ply(p)
    np.testing.assert_allclose(m["verts"], verts, atol=1e-6)
    np.testing.assert_array_equal(m["faces"], faces)
    np.testing.assert_allclose(m["normals"], normals, atol=1e-6)
    assert m["colors"].dtype == np.uint8


def test_psnr_ssim():
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (64, 64, 3))
    assert M.psnr(img, img) == float("inf")
    assert M.ssim(img, img) > 0.999
    noisy = np.clip(img + rng.normal(0, 0.1, img.shape), 0, 1)
    p = M.psnr(img, noisy)
    assert 15 < p < 25
    assert M.ssim(img, noisy) < 0.99
    # LPIPS is real now (models/lpips.py): 0 for identical images, positive
    # for perturbed ones
    d_noisy = M.lpips(img, noisy)
    assert d_noisy is not None and d_noisy > 0
    assert abs(M.lpips(img, img)) < 1e-6


def make_traj(n=60, noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    ts = np.linspace(0, 2 * np.pi, n)
    poses = np.tile(np.eye(4)[None], (n, 1, 1))
    poses[:, 0, 3] = np.cos(ts)
    poses[:, 1, 3] = 0.2 * ts
    poses[:, 2, 3] = np.sin(ts)
    poses[:, :3, 3] += rng.normal(0, noise, (n, 3))
    return poses


def test_ate_zero_for_sim3_transformed():
    gt = make_traj()
    # apply a sim3 to create the "estimate"
    from nicer_slam_tpu.utils.camera import quad2rotation
    import jax.numpy as jnp

    q = np.array([0.9, 0.1, -0.2, 0.3])
    R = np.asarray(quad2rotation(jnp.asarray(q / np.linalg.norm(q),
                                             dtype=jnp.float32)))
    est = gt.copy()
    est[:, :3, :3] = R @ gt[:, :3, :3]
    est[:, :3, 3] = 1.7 * gt[:, :3, 3] @ R.T + np.array([3.0, -1.0, 2.0])
    m = ate.evaluate_ate(gt, est)
    assert m["ate_rmse"] < 1e-5
    np.testing.assert_allclose(m["scale"], 1 / 1.7, rtol=1e-4)


def test_ate_detects_noise():
    gt = make_traj()
    est = make_traj(noise=0.05, seed=3)
    m = ate.evaluate_ate(gt, est)
    assert 0.02 < m["ate_rmse"] < 0.2


def test_tum_roundtrip(tmp_path):
    gt = make_traj(10)
    p = str(tmp_path / "traj.txt")
    ate.write_tum_trajectory(p, gt)
    back = ate.read_tum_trajectory(p)
    np.testing.assert_allclose(back[:, :3, 3], gt[:, :3, 3], atol=1e-5)


def test_prealign_and_errors():
    gt = make_traj()
    aligned34, sim3 = ate.prealign_cameras(gt, gt)
    errs = ate.camera_alignment_errors(aligned34, gt[:, :3, :4])
    assert errs["rot_error_deg"] < 0.1
    assert errs["trans_error"] < 1e-4


def test_eval_pointcloud_identical_and_offset():
    rng = np.random.default_rng(2)
    pts = rng.uniform(-1, 1, (5000, 3)).astype(np.float32)
    nrm = np.tile(np.array([[0, 0, 1.0]], np.float32), (5000, 1))
    m = eval_pointcloud(pts, pts, nrm, nrm)
    assert m["accuracy"] < 1e-6
    assert m["fscore@0.01"] == 1.0
    assert m["normal_consistency"] > 0.999
    m2 = eval_pointcloud(pts + np.array([0.02, 0, 0], np.float32), pts)
    np.testing.assert_allclose(m2["accuracy"], 0.02, atol=0.005)
    assert m2["fscore@0.01"] < 0.5


def test_icp_recovers_small_transform():
    rng = np.random.default_rng(3)
    pts = rng.uniform(-1, 1, (4000, 3)).astype(np.float32)
    # small rotation + translation
    th = 0.05
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1]])
    moved = pts @ R.T + np.array([0.03, -0.02, 0.01])
    T = icp_align(moved.astype(np.float32), pts)
    back = moved @ T[:3, :3].T + T[:3, 3]
    assert np.abs(back - pts).mean() < 0.01


def test_sample_mesh_points_on_surface():
    # unit right triangle in z=0 plane
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2]])
    pts, nrm = sample_mesh_points(verts, faces, 1000)
    assert np.abs(pts[:, 2]).max() < 1e-6
    assert (pts[:, 0] >= -1e-6).all() and (pts[:, 1] >= -1e-6).all()
    assert ((pts[:, 0] + pts[:, 1]) <= 1 + 1e-5).all()
    np.testing.assert_allclose(np.abs(nrm[:, 2]), 1.0, atol=1e-6)
