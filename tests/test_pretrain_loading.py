import os

import numpy as np
import pytest


def test_pretrain_npz_loading(tmp_path):
    """The runner must load fine-MLP weights from pretrain.npz (the
    volsdf_train.py:140-147 analogue) and leave other params alone."""
    from nicer_slam_tpu.datasets.synthetic import generate
    from nicer_slam_tpu.slam.runner import SLAMRunner
    from tests.test_slam_e2e import TINY_CONF

    data_dir = str(tmp_path / "Synthetic")
    generate(data_dir, scan_id=1, n_frames=2, H=48, W=64, world_scale=3.0,
             with_flow=False)
    conf_path = str(tmp_path / "c.conf")
    conf = TINY_CONF.format(data_dir=data_dir, H=48, W=64, n_images=2,
                            map_iters=1, track_iters=1)
    with open(conf_path, "w") as f:
        f.write(conf)

    # build once to learn the fine-MLP shapes
    probe = SLAMRunner(conf=conf_path, root_dir=str(tmp_path / "a"),
                       quiet=True)
    flat = {}
    for i, lp in enumerate(probe.params["implicit"]["fine"]["lins"]):
        for k, v in lp.items():
            flat[f"fine_lin{i}_{k}"] = np.full(np.asarray(v).shape, 0.123,
                                               np.float32)
    np.savez(tmp_path / "pretrain.npz", **flat)

    r = SLAMRunner(conf=conf_path, root_dir=str(tmp_path), quiet=True)
    for lp in r.params["implicit"]["fine"]["lins"]:
        for k, v in lp.items():
            np.testing.assert_allclose(np.asarray(v), 0.123)
    # coarse untouched (not all-0.123)
    cv = np.asarray(r.params["implicit"]["coarse"]["lins"][0]["v"])
    assert not np.allclose(cv, 0.123)
