import lzma
import os

import numpy as np
import pytest

from nicer_slam_tpu.utils import fastio


@pytest.fixture
def npy_files(tmp_path):
    rng = np.random.default_rng(0)
    arrays, paths = [], []
    for i in range(4):
        arr = rng.normal(size=(37, 53)).astype(np.float32)
        p = str(tmp_path / f"a{i}.npy")
        if i % 2 == 0:
            with lzma.open(p, "wb") as f:
                np.save(f, arr)
        else:
            np.save(p, arr)
        arrays.append(arr)
        paths.append(p)
    return arrays, paths


def test_native_lib_builds_and_loads():
    if not fastio.available():
        # the .so is intentionally not committed; build it from source
        import subprocess

        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        subprocess.run(["sh", os.path.join(root, "native", "build.sh")],
                       check=True, capture_output=True)
        fastio.reload()
    assert fastio.available(), "native/libfastio.so missing — run native/build.sh"


def test_load_npy_xz_and_raw(npy_files):
    arrays, paths = npy_files
    for arr, p in zip(arrays, paths):
        got = fastio.load_npy(p)
        np.testing.assert_array_equal(got, arr)


def test_prefetch_pool(npy_files):
    arrays, paths = npy_files
    pool = fastio.PrefetchPool(threads=4)
    jobs = [pool.submit(p) for p in paths]
    for arr, jid in zip(arrays, jobs):
        np.testing.assert_array_equal(pool.collect_npy(jid), arr)
    pool.close()


def test_rgb_only_mono_prior_pipeline(tmp_path):
    """VERDICT item 4: extract_monocular_cues must run WITHOUT
    *_gt_depth.png — train a tiny mono prior (few steps, pipeline proof)
    and extract cues from a directory containing only RGB."""
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.train_mono_prior import train

    ckpt = str(tmp_path / "mp.npz")
    train(steps=5, n_scenes=1, frames_per_scene=2, H=32, W=48, batch=2,
          out=ckpt)
    assert os.path.exists(ckpt)

    # rgb-only scan dir (no gt_depth, no cameras needed for this path)
    import imageio.v2 as imageio

    scan = tmp_path / "scan"
    scan.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        imageio.imwrite(str(scan / f"{i:06d}_rgb.png"),
                        rng.integers(0, 255, (32, 48, 3), np.uint8))

    from nicer_slam_tpu.preprocess.extract_monocular_cues import extract_cues

    extract_cues(str(scan), str(scan), mono_prior_ckpt=ckpt)
    from nicer_slam_tpu.utils.fastio import load_npy

    d = load_npy(str(scan / "000000_depth.npy"))
    n = load_npy(str(scan / "000000_normal.npy"))
    assert d.shape == (32, 48) and np.isfinite(d).all()
    assert 0 <= d.min() and d.max() <= 1
    assert n.shape == (3, 32, 48) and np.isfinite(n).all()

    # without the prior AND without gt depth, the gt fallback must raise a
    # clear error rather than silently reading depth that isn't there
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        extract_cues(str(scan), str(scan), mono_prior_ckpt=str(tmp_path / "x.npz"),
                     from_gt_depth=False)


def test_classical_flow_known_shift(tmp_path):
    """The RGB-only classical flow recovers a known integer translation."""
    from nicer_slam_tpu.preprocess.extract_flows import classical_flow

    rng = np.random.default_rng(1)
    base = rng.uniform(0, 1, (80, 104))
    # smooth the pattern so the variational solver has gradients to follow
    for _ in range(3):
        base = (np.roll(base, 1, 0) + np.roll(base, -1, 0)
                + np.roll(base, 1, 1) + np.roll(base, -1, 1) + base) / 5.0
    img0 = np.stack([base] * 3, -1)
    # roll content right by 3: pixel x in img0 appears at x+3 in img1
    img1 = np.stack([np.roll(base, (0, 3), (0, 1))] * 3, -1)
    flow = classical_flow(img0, img1)
    inner = flow[16:-16, 16:-16]
    assert abs(np.median(inner[..., 0]) - 3.0) < 1.0
    assert abs(np.median(inner[..., 1])) < 1.0


def test_extract_flows_rgb_only(tmp_path):
    """extract_flows runs with neither a checkpoint nor gt_depth pngs."""
    import imageio.v2 as imageio

    from nicer_slam_tpu.preprocess.extract_flows import extract_flows

    scan = tmp_path / "scan"
    scan.mkdir()
    rng = np.random.default_rng(2)
    base = rng.uniform(0, 1, (40, 56))
    for _ in range(3):
        base = (np.roll(base, 1, 0) + np.roll(base, -1, 0)
                + np.roll(base, 1, 1) + np.roll(base, -1, 1) + base) / 5.0
    for i, sh in enumerate((0, 2)):
        img = np.stack([np.roll(base, (0, sh), (0, 1))] * 3, -1)
        imageio.imwrite(str(scan / f"{i:06d}_rgb.png"),
                        (img * 255).astype(np.uint8))
    out = tmp_path / "pair"
    extract_flows(str(scan), str(out), keyframe_every=1, thresh=30)
    assert os.path.exists(str(out / "0000_0001_flow.npy"))
    assert os.path.exists(str(out / "0001_0000_occ.png"))


def test_tsdf_fusion_sphere():
    """Fuse synthetic depth renders of a sphere -> mesh near radius."""
    from nicer_slam_tpu.datasets.synthetic import camera_trajectory
    from nicer_slam_tpu.preprocess.tsdf_fusion import fuse_depths

    H, W = 60, 80
    f = 0.9 * W
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]])
    r = 0.4
    depths, poses = [], []
    for i, c2w in enumerate(camera_trajectory(8)):
        # render depth of sphere radius r centered at origin, cam outside? cam
        # inside orbit 0.35 -> place sphere surface around the cameras: use a
        # ROOM (inverted sphere): depth = distance to sphere of radius 0.9
        ys, xs = np.mgrid[0:H, 0:W]
        d_cam = np.stack([(xs - W / 2) / f, (ys - H / 2) / f,
                          np.ones_like(xs, float)], -1)
        d_cam /= np.linalg.norm(d_cam, axis=-1, keepdims=True)
        dirs = d_cam @ c2w[:3, :3].T
        o = c2w[:3, 3]
        # |o + t d| = 0.9 solve for t (inverted sphere: camera inside)
        b = 2 * (dirs @ o)
        c = (o @ o) - 0.81
        t = (-b + np.sqrt(b * b - 4 * c)) / 2
        z = t.reshape(H, W) * d_cam[..., 2]
        depths.append(z.astype(np.float32))
        poses.append(c2w)
    verts, faces, normals = fuse_depths(
        depths, np.stack(poses), K, res=64,
        bounds=(np.array([-1.0] * 3), np.array([1.0] * 3)), depth_max=3.0)
    assert verts.shape[0] > 100
    radii = np.linalg.norm(verts, axis=-1)
    # observed shell should sit near radius 0.9
    assert abs(np.median(radii) - 0.9) < 0.06


def test_colmap_txt_roundtrip(tmp_path):
    from nicer_slam_tpu.preprocess import colmap

    (tmp_path / "sparse" / "0").mkdir(parents=True)
    with open(tmp_path / "sparse" / "0" / "cameras.txt", "w") as fh:
        fh.write("# comment\n1 PINHOLE 640 480 500.0 510.0 320.0 240.0\n")
    with open(tmp_path / "sparse" / "0" / "images.txt", "w") as fh:
        fh.write("# c\n1 1 0 0 0 0.1 0.2 0.3 1 img001.png\n\n"
                 "2 0.9238795 0 0.3826834 0 0.5 0 0 1 img000.png\n\n")
    c2ws, intr = colmap.load_colmap_poses(str(tmp_path))
    assert c2ws.shape == (2, 4, 4)
    np.testing.assert_allclose(intr, [500, 510, 320, 240])
    # images sorted by name: img000 first; its rotation is 45deg about y
    R = c2ws[0, :3, :3]
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-6)
    # identity-rotation image: c2w translation = -tvec
    np.testing.assert_allclose(c2ws[1, :3, 3], [-0.1, -0.2, -0.3], atol=1e-6)


def test_normals_from_depth_plane():
    from nicer_slam_tpu.preprocess.extract_monocular_cues import normals_from_depth

    H, W = 40, 50
    depth = np.full((H, W), 2.0, np.float32)  # frontoparallel plane
    n = normals_from_depth(depth, fx=50.0, fy=50.0)
    inner = n[5:-5, 5:-5]
    np.testing.assert_allclose(np.abs(inner[..., 2]), 1.0, atol=1e-3)


def test_flow_from_depth_zero_for_same_pose():
    from nicer_slam_tpu.preprocess.extract_flows import flow_from_depth

    H, W = 20, 30
    K = np.array([[30.0, 0, 15], [0, 30, 10], [0, 0, 1]])
    depth = np.full((H, W), 1.5)
    c2w = np.eye(4)
    flow, z, tgt = flow_from_depth(depth, c2w, c2w, K)
    np.testing.assert_allclose(flow, 0.0, atol=1e-9)
    np.testing.assert_allclose(z, 1.5)
