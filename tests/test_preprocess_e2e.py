"""End-to-end preprocess proof (VERDICT r3 item 6): synthesize a RAW
Replica-layout capture (traj.txt + results/frame*.jpg + depth*.png +
<scene>_mesh.ply), run it through the real converter
(preprocess/replica_2_volsdf.convert_scene) -> exp_runner-level SLAM ->
eval_cam / eval_rec — asserting the on-disk contract matches the
reference's converter output (reference preprocess/replica_2_volsdf.py:
40-102): cameras.npz world_mat_%d/scale_mat_%d keys, %06d_rgb.png /
%06d_gt_depth.png images, lzma-compressed *_depth.npy / *_normal.npy
cues, and *_occ.png / *_flow.npy flow pairs.

No hand-built scan dir anywhere: the SLAM run consumes exactly what the
converter wrote.
"""

import glob
import lzma
import os

import numpy as np
import pytest

from test_slam_e2e import TINY_CONF

WORLD_SCALE = 3.0
H, W = 60, 80
N_FRAMES = 12  # >= 2 keyframes at keyframe_every=10 so flow pairs exist


@pytest.fixture(scope="module")
def raw_capture(tmp_path_factory):
    """A raw Replica-layout capture of the synthetic room, in WORLD units
    (cube coords * WORLD_SCALE), exactly the tree the reference converter
    reads: <root>/synthroom/{traj.txt, results/{frame%06d.jpg,
    depth%06d.png}} + <root>/synthroom_mesh.ply."""
    import imageio.v2 as imageio

    from nicer_slam_tpu.datasets.synthetic import (camera_trajectory,
                                                   render_frame, scene_sdf)
    from nicer_slam_tpu.ops.marching_cubes import extract_mesh
    from nicer_slam_tpu.utils.ply import write_ply

    root = tmp_path_factory.mktemp("raw_replica")
    scene_dir = root / "synthroom"
    results = scene_dir / "results"
    results.mkdir(parents=True)

    K = np.eye(4, dtype=np.float64)
    K[0, 0] = K[1, 1] = 55.0
    K[0, 2], K[1, 2] = (W - 1) / 2.0, (H - 1) / 2.0

    poses_world = []
    lines = []
    for i, c2w in enumerate(camera_trajectory(N_FRAMES)):
        rgb, z_cube, _, _ = render_frame(H, W, K, c2w)
        imageio.imwrite(str(results / f"frame{i:06d}.jpg"),
                        (rgb * 255).astype(np.uint8), quality=95)
        z_world = z_cube * WORLD_SCALE
        imageio.imwrite(str(results / f"depth{i:06d}.png"),
                        np.round(z_world * 6553.5).astype(np.uint16))
        cw = c2w.copy()
        cw[:3, 3] *= WORLD_SCALE
        poses_world.append(cw)
        lines.append(" ".join(f"{v:.9f}" for v in cw.reshape(-1)))
    (scene_dir / "traj.txt").write_text("\n".join(lines) + "\n")

    mesh = extract_mesh(scene_sdf, resolution=48, grid_boundary=(-1.0, 1.0))
    assert mesh is not None
    mv, mf, mn = mesh
    write_ply(str(root / "synthroom_mesh.ply"),
              (mv * WORLD_SCALE).astype(np.float32), mf, normals=mn)
    return str(scene_dir), np.stack(poses_world), (K[0, 0], K[1, 1],
                                                   K[0, 2], K[1, 2])


@pytest.fixture(scope="module")
def converted(raw_capture, tmp_path_factory):
    from nicer_slam_tpu.preprocess.replica_2_volsdf import convert_scene

    scene_dir, _, intr = raw_capture
    out_root = tmp_path_factory.mktemp("processed")
    scan_dir = str(out_root / "scan1")
    convert_scene(scene_dir, scan_dir, scan_id=1, with_cues=True,
                  with_flow=True, intrinsics=intr)
    return str(out_root), scan_dir


def test_converted_on_disk_contract(raw_capture, converted):
    """The converter output must match the reference's on-disk contract
    (reference replica_2_volsdf.py:75-102)."""
    _, poses_world, intr = raw_capture
    out_root, scan_dir = converted

    # cameras.npz: world_mat_%d = K @ w2c, shared scale_mat_%d
    cams = np.load(os.path.join(scan_dir, "cameras.npz"))
    for i in range(N_FRAMES):
        assert f"world_mat_{i}" in cams and f"scale_mat_{i}" in cams
    K4 = np.eye(4)
    K4[0, 0], K4[1, 1], K4[0, 2], K4[1, 2] = intr
    np.testing.assert_allclose(
        cams["world_mat_3"],
        (K4 @ np.linalg.inv(poses_world[3])).astype(np.float32), rtol=1e-5)
    # scale_mat: normalized->original (diag scale + bbox center translation,
    # reference :52-61); our room mesh spans ~[-3,3] with enlarge 1.5
    sm = cams["scale_mat_0"]
    assert sm[0, 0] == sm[1, 1] == sm[2, 2] and sm[0, 0] > 1.0
    np.testing.assert_allclose(sm[3], [0, 0, 0, 1], atol=1e-6)

    # images: %06d_rgb.png + %06d_gt_depth.png for every frame
    for i in range(N_FRAMES):
        assert os.path.exists(os.path.join(scan_dir, f"{i:06d}_rgb.png"))
        assert os.path.exists(os.path.join(scan_dir, f"{i:06d}_gt_depth.png"))

    # cues: lzma-compressed content under plain .npy names — the exact
    # reference contract (extract_monocular_cues.py:146-187 writes
    # np.save into lzma.open("<stem>_depth.npy")); byte-level check via
    # the xz magic prefix
    XZ_MAGIC = b"\xfd7zXZ\x00"
    for i in range(N_FRAMES):
        dp = os.path.join(scan_dir, f"{i:06d}_depth.npy")
        np_ = os.path.join(scan_dir, f"{i:06d}_normal.npy")
        assert os.path.exists(dp) and os.path.exists(np_)
        with open(dp, "rb") as f:
            assert f.read(6) == XZ_MAGIC
        with lzma.open(dp) as f:
            d = np.load(f)
        assert d.shape == (H, W) and np.isfinite(d).all()
        with lzma.open(np_) as f:
            n = np.load(f)
        assert n.shape == (3, H, W)

    # flow pairs: kf 0 <-> 10 within thresh 30 (extract_flows.py contract)
    pair_dir = scan_dir + "_pair"
    occ = sorted(glob.glob(os.path.join(pair_dir, "*_occ.png")))
    flows = sorted(glob.glob(os.path.join(pair_dir, "*_flow.npy")))
    assert occ and flows
    assert os.path.exists(os.path.join(pair_dir, "0000_0010_flow.npy"))
    assert os.path.exists(os.path.join(pair_dir, "0000_0010_occ.png"))

    # normalized GT mesh exported next to the scan (eval_rec input)
    assert os.path.exists(os.path.join(out_root, "synthroom_mesh_01.ply"))


def test_converter_to_runner_to_eval(converted, tmp_path_factory):
    """SLAM + eval battery on the CONVERTER's output: the full
    raw-capture -> converter -> exp_runner -> eval_cam/eval_rec pipeline
    (mechanics + interface proof; tiny iteration budget)."""
    from nicer_slam_tpu.evaluation.eval_cam import evaluate_run
    from nicer_slam_tpu.evaluation.eval_rec import calc_3d_metric
    from nicer_slam_tpu.slam.runner import SLAMRunner
    from nicer_slam_tpu.utils.plots import save_mesh

    out_root, scan_dir = converted
    work = tmp_path_factory.mktemp("exp_conv")
    conf = TINY_CONF.format(data_dir=out_root, H=H, W=W,
                            n_images=N_FRAMES, map_iters=8, track_iters=6)
    conf_path = str(work / "conv.conf")
    with open(conf_path, "w") as f:
        f.write(conf)

    r = SLAMRunner(conf=conf_path, root_dir=str(work), quiet=True)
    r.run()
    assert len(r.est_pose_all) == N_FRAMES

    cam = evaluate_run(r.rundir, make_plot=False)
    assert np.isfinite(cam["ate_rmse"])

    est_ply = save_mesh(r, N_FRAMES - 1, resolution=48)
    if est_ply is not None:  # tiny budget may not cross zero yet
        rec = calc_3d_metric(
            est_ply, os.path.join(out_root, "synthroom_mesh_01.ply"),
            n_points=20000, do_icp=True)
        assert np.isfinite(rec["accuracy"]) and np.isfinite(rec["completion"])
