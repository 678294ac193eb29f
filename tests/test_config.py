import os

import pytest

from nicer_slam_tpu import config as cfg_mod

SAMPLE = """
SLAM {
    mapping {
        mapping_window_size = 15
        BA = true
        BA_cam_lr = 0.001
    }
    tracking {
        gt_cam = false
        lr = 0.005
        iters = 100
    }
}
train {
    expname = "replica"
    lr_factor_for_coarse_grid = 20.0
}
plot {
    grid_boundary = [
        -1.0
        1.0
    ]
}
loss {
    rgb_loss = "torch.nn.L1Loss"
    eikonal_weight = 0.1
}
model.density { params_init { beta = 0.1 } beta_min = 0.0001 }
"""


def test_parse_basics():
    c = cfg_mod.parse_string(SAMPLE)
    assert c.get_int("SLAM.mapping.mapping_window_size") == 15
    assert c.get_bool("SLAM.mapping.BA") is True
    assert c.get_float("SLAM.mapping.BA_cam_lr") == 0.001
    assert c.get_bool("SLAM.tracking.gt_cam") is False
    assert c.get_string("train.expname") == "replica"
    assert c.get_float("train.lr_factor_for_coarse_grid") == 20.0
    assert c.get_list("plot.grid_boundary") == [-1.0, 1.0]
    assert c.get_string("loss.rgb_loss") == "torch.nn.L1Loss"
    assert c.get_float("model.density.params_init.beta") == 0.1


def test_defaults_and_missing():
    c = cfg_mod.parse_string(SAMPLE)
    assert c.get_int("SLAM.mapping.inner_freq", 1000) == 1000
    with pytest.raises(cfg_mod.ConfigMissingError):
        c.get_int("nope.nope")


def test_roundtrip_dump(tmp_path):
    c = cfg_mod.parse_string(SAMPLE)
    p = tmp_path / "out.conf"
    c.dump(str(p))
    c2 = cfg_mod.parse_file(str(p))
    assert c2.as_dict() == c.as_dict()


def test_parse_all_reference_confs():
    """Every shipped reference conf must parse and expose the key schema."""
    ref = "/root/reference/code/confs"
    if not os.path.isdir(ref):
        pytest.skip("reference not mounted")
    n = 0
    for root, _, files in os.walk(ref):
        for f in files:
            if not f.endswith(".conf"):
                continue
            c = cfg_mod.parse_file(os.path.join(root, f))
            assert c.get_int("SLAM.mapping.iters") > 0
            assert c.get_config("model.implicit_network.coarse") is not None
            assert isinstance(c.get_list("dataset.img_res"), list)
            n += 1
    assert n >= 20
