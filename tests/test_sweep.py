"""Scene-parallel sweep runner (SURVEY.md §2.3(b) / BASELINE.json stretch):
two tiny synthetic scenes must complete concurrently, one per device of the
virtual CPU mesh, each producing its own checkpointed run dir."""

import os

import numpy as np


def test_sweep_two_scenes_two_devices(tmp_path_factory):
    import jax

    from nicer_slam_tpu.datasets.synthetic import generate
    from tests.test_slam_e2e import TINY_CONF
    from tools.sweep import sweep

    assert len(jax.local_devices()) >= 2  # conftest forces the 8-CPU mesh

    root = tmp_path_factory.mktemp("sweeproot")
    confs = []
    for k in (1, 2):
        data_dir = str(root / f"Synthetic{k}")
        generate(data_dir, scan_id=k, n_frames=2, H=48, W=64,
                 world_scale=3.0, with_flow=False)
        conf_path = str(root / f"scene{k}.conf")
        conf = TINY_CONF.format(data_dir=data_dir, H=48, W=64, n_images=2,
                                map_iters=2, track_iters=2)
        conf = conf.replace('scan_id = 1', f'scan_id = {k}')
        conf = conf.replace('expname = "tiny"', f'expname = "sweep{k}"')
        with open(conf_path, "w") as f:
            f.write(conf)
        confs.append(conf_path)

    results = sweep(confs, root_dir=str(root), exps_folder="exps_sweep",
                    max_devices=2, quiet=True)

    assert len(results) == 2
    devices_used = set()
    for r in results:
        assert r["ok"], r.get("error")
        devices_used.add(r["device"])
        pose_ckpt = os.path.join(r["run_dir"], "checkpoints",
                                 "PoseParameters", "latest.npz")
        assert os.path.exists(pose_ckpt)
        with np.load(pose_ckpt, allow_pickle=True) as z:
            assert z["est_poses"].shape[0] == 2
    assert len(devices_used) == 2, devices_used
