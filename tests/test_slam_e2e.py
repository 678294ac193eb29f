"""End-to-end SLAM integration test on a tiny synthetic scene.

SURVEY.md §4 level (3): a short synthetic sequence with exact poses + cues;
tracking must converge near GT and the full pipeline (tracking, mapping,
flow staging, BA, checkpointing, full-image render, mesh) must run.
"""

import os

import numpy as np
import pytest

TINY_CONF = """
SLAM {{
    mapping {{
        mapping_window_size = 6
        BA = true
        BA_ratio = 0.7
        BA_cam_lr = 0.001
        keyframe_every = 10
        mapping_every_frame = 4
        iters = {map_iters}
    }}
    tracking {{ gt_cam = false  lr = 0.01  iters = {track_iters}  Hedge = 0  Wedge = 0
                lr_step_size = 4  lr_gamma = 0.5 }}
}}
train {{
    expname = "tiny"
    folder_suffix = "test"
    dataset_class = "nicer_slam_tpu.datasets.scene_dataset.SLAMDataset"
    lr_factor_for_coarse_grid = 20.0
    lr_factor_for_fine_grid = 20.0
    lr_factor_for_color_grid = 5.0
    tracking_num_pixels = 192
    checkpoint_freq = 8
    plot_freq = 1000
    learning_rate = 0.002
    mapping_num_pixels = 512
    split_n_pixels = 2048
}}
plot {{ plot_nimgs = 1  resolution = 64  grid_boundary = [ -1.0 1.0 ] }}
loss {{
    assign_scale_shift_init = true
    assign_scale = 20.0
    warp_loss_weight = 0.5
    warp_loss_type = "l1"
    rgb_loss = "torch.nn.L1Loss"
    eikonal_weight = 0.1
    smooth_weight = 0.005
    depth_weight = 0.1
    normal_l1_weight = 0.05
    normal_cos_weight = 0.05
    flow_weight = 0.001
}}
tracking_loss {{
    rgb_loss = "torch.nn.L1Loss"
    eikonal_weight = 0  smooth_weight = 0  depth_weight = 0
    normal_l1_weight = 0  normal_cos_weight = 0
}}
dataset {{
    data_dir = "{data_dir}"
    img_res = [ {H} {W} ]
    scan_id = 1
    use_mask = false
    use_gt_depth = true
    n_images = {n_images}
}}
model {{
    feature_vector_size = 16
    scene_bounding_sphere = 1.0
    use_warp_loss = true
    mapping_patchsizes = [ 1 ]
    tracking_patchsizes = [ 1 ]
    sampling_method = "important"
    density_method = "volsdf_gridpredefined"
    implicit_network {{
        coarse {{
            d_in = 3  d_out = 1  dims = [ 32 ]
            geometric_init = true  bias = 0.9  skip_in = []
            weight_norm = true  multires = 6  inside_outside = true
            use_grid_feature = true
            base_size = 16  end_size = 16  logmap = 15
            num_levels = 2  level_dim = 4  divide_factor = 1.0
            embedding_method = "nerf"
        }}
        fine {{
            d_in = 3  d_out = 1  dims = [ 32 32 ]
            geometric_init = false  bias = 0.9  skip_in = []
            weight_norm = true  multires = 6  inside_outside = true
            use_grid_feature = true
            base_size = 16  end_size = 64  logmap = 17
            num_levels = 4  level_dim = 2  divide_factor = 1.0
            embedding_method = "nerf"
        }}
    }}
    rendering_network {{
        mode = "idr"  d_in = 9  d_out = 3  dims = [ 32 32 ]
        weight_norm = true  multires_view = 4
        per_image_code = false  use_grid_feature = false
    }}
    density {{ params_init {{ beta = 0.1 }}  beta_min = 0.0001 }}
    gridpredefinedensity {{}}
    ray_sampler {{ near = 0.0  N_samples = 24  N_samples_eval = 96  N_samples_extra = 8 }}
}}
"""


@pytest.fixture(scope="module")
def tiny_scene(tmp_path_factory):
    from nicer_slam_tpu.datasets.synthetic import generate

    root = tmp_path_factory.mktemp("tinyscene")
    data_dir = str(root / "Synthetic")
    generate(data_dir, scan_id=1, n_frames=9, H=60, W=80, world_scale=3.0,
             keyframe_every=10, with_flow=True)
    return data_dir


@pytest.fixture(scope="module")
def runner(tiny_scene, tmp_path_factory):
    work = tmp_path_factory.mktemp("exp")
    conf_path = str(work / "tiny.conf")
    with open(conf_path, "w") as f:
        f.write(TINY_CONF.format(data_dir=tiny_scene, H=60, W=80, n_images=9,
                                 map_iters=12, track_iters=12))
    from nicer_slam_tpu.slam.runner import SLAMRunner

    r = SLAMRunner(conf=conf_path, root_dir=str(work), quiet=True)
    hook_frames = []
    r.run(frame_hook=lambda rr, f: hook_frames.append(f))
    r._test_hook_frames = hook_frames
    return r


def test_dataset_loads_synthetic(tiny_scene):
    from nicer_slam_tpu.datasets.scene_dataset import SLAMDataset

    ds = SLAMDataset(data_dir=tiny_scene, img_res=[60, 80], scan_id=1,
                     use_gt_depth=True, n_images=9)
    f0 = ds.frame(0)
    assert f0["rgb"].shape == (4800, 3)
    assert f0["normal"].shape == (4800, 3)
    assert np.isfinite(f0["gt_depth"]).all()
    # gt poses must be recovered exactly from cameras.npz decomposition
    from nicer_slam_tpu.datasets.synthetic import camera_trajectory

    gt = camera_trajectory(9)
    for i in (0, 4, 8):
        np.testing.assert_allclose(ds.gt_pose_all[i], gt[i], atol=1e-3)
    # mono depth * assign_scale == cube-frame gt depth (anchor consistency)
    np.testing.assert_allclose(f0["depth"] * 20.0, f0["gt_depth"], rtol=1e-2,
                               atol=1e-2)
    flow, ok = ds.flow_pair(0, 10) if os.path.exists(
        os.path.join(ds.flow_dir, "0000_0010_flow.npy")) else (None, None)


def test_runner_completes_and_checkpoints(runner):
    assert len(runner.est_pose_all) == 9
    # run(frame_hook=...) fires once per frame, in order (long-run drivers
    # rely on it for interim trajectory metrics)
    assert runner._test_hook_frames == list(range(9))
    ck = runner.checkpoints_path
    for sub in ("ModelParameters", "OptimizerParameters", "PoseParameters"):
        assert os.path.exists(os.path.join(ck, sub, "latest.npz")), sub
    assert os.path.exists(os.path.join(runner.rundir, "runconf.conf"))


def test_tracking_lr_schedule_from_conf(runner):
    # SLAM.tracking.lr_step_size / lr_gamma flow into TrackConfig (defaults
    # are the reference's StepLR(50, 0.95), volsdf_train.py:398; the anneal
    # is the round-4 slow-motion jitter-floor fix, TRACK_NOISE_r04.json)
    assert runner.track_cfg.lr_step_size == 4
    assert runner.track_cfg.lr_gamma == 0.5


def test_tracking_stays_near_gt(runner):
    """Regime-appropriate quality gate at CPU-affordable budgets (12 iters,
    192 rays): measured mean translation error is ~0.11 (max ~0.14); the
    bound is 3x that margin so real regressions trip it. True convergence
    (ATE 0.007-0.03) is validated by tools/convergence_probe.py at realistic
    iteration/ray budgets on TPU (BASELINE.md)."""
    errs = []
    for i in range(1, 9):
        est = runner.est_pose_all[i]
        gt = runner.dataset.gt_pose_all[i]
        assert np.isfinite(est).all()
        errs.append(np.linalg.norm(est[:3, 3] - gt[:3, 3]))
    assert np.mean(errs) < 0.30, errs
    assert np.max(errs) < 0.45, errs


def test_full_image_render(runner):
    out = runner.render_full_image(0)
    assert out["rgb"].shape == (60, 80, 3)
    assert np.isfinite(out["rgb"]).all()
    assert np.isfinite(out["depth"]).all()


def test_mesh_extraction(runner, tiny_scene, tmp_path_factory):
    from nicer_slam_tpu.slam.runner import SLAMRunner
    from nicer_slam_tpu.utils.plots import save_mesh
    from nicer_slam_tpu.utils.ply import read_ply

    # a fresh (geometric-init) runner has a guaranteed zero crossing at
    # |x| ~ bias — exercises the full mesh path deterministically
    work = tmp_path_factory.mktemp("mesh")
    fresh = SLAMRunner(conf=runner.conf_path, root_dir=str(work), quiet=True)
    path = save_mesh(fresh, 0, resolution=48)
    assert path is not None and os.path.exists(path)
    mesh = read_ply(path)
    assert mesh["verts"].shape[0] > 100
    assert mesh["faces"].shape[0] > 100
    assert "colors" in mesh


@pytest.mark.parametrize("feature", ["per_image_code", "model_exposure"])
def test_rendering_net_extras_train(tiny_scene, tmp_path_factory, feature):
    """Conf-driven per_image_code / model_exposure runs (VERDICT item 6):
    both rendering-net extras must train end-to-end — exposure returns
    (rgb, rgb_un) through volume rendering (base_networks.py:369-392,
    network.py:308-311) and the embeddings exist per image."""
    work = tmp_path_factory.mktemp(feature)
    conf = TINY_CONF.format(data_dir=tiny_scene, H=60, W=80, n_images=3,
                            map_iters=3, track_iters=3)
    if feature == "per_image_code":
        conf = conf.replace("per_image_code = false",
                            "per_image_code = true")
    else:
        conf = conf.replace("per_image_code = false",
                            "per_image_code = false  model_exposure = true")
    conf_path = str(work / "c.conf")
    with open(conf_path, "w") as f:
        f.write(conf)
    from nicer_slam_tpu.slam.runner import SLAMRunner

    r = SLAMRunner(conf=conf_path, root_dir=str(work), quiet=True)
    assert "embeddings" in r.params["render"]
    r.run()
    assert len(r.est_pose_all) == 3
    for i in range(3):
        assert np.isfinite(r.est_pose_all[i]).all()
    out = r.render_full_image(1)
    assert np.isfinite(out["rgb"]).all()
    if feature == "model_exposure":
        import jax

        from nicer_slam_tpu.models import scene_model as sm
        from tests.test_scene_model import make_batch

        batch = make_batch(r.scene_cfg, R=8, S=1)
        o = jax.jit(lambda p, v, b, k: sm.render_rays(
            r.scene_cfg, p, v, b, k, stage="fine", is_mapping=True))(
            r.params, r.voxels, batch, jax.random.PRNGKey(0))
        assert "rgb_un_values" in o and o["rgb_un_values"].shape == (8, 3)
        assert np.isfinite(np.asarray(o["rgb_un_values"])).all()


FLOW_REGIME_EXTRA = """
SLAM {{
    mapping {{
        mapping_window_size = 6
        BA = true
        BA_ratio = 0.7
        BA_cam_lr = 0.001
        keyframe_every = 2
        mapping_every_frame = 4
        global_window_start = 8
        iters = {map_iters}
    }}
    tracking {{ gt_cam = true  lr = 0.01  iters = 4  Hedge = 0  Wedge = 0 }}
}}
"""


def test_global_window_flow_regime(tiny_scene_flow, tmp_path_factory):
    """The frame>=global_window_start regime: global keyframe draw + flow
    edges loaded from disk actually execute inside map_step (the reference's
    volsdf_train.py:449-613,312-361 path at frame>=200). Verifies the
    Emax-padded flow shapes ([E,R] broadcasts in compute_losses) with a
    kept-edge count strictly between 0 and Emax — the exact case that used
    to shape-crash — and that map_step does not recompile across iterations."""
    import jax

    work = tmp_path_factory.mktemp("flowexp")
    body = TINY_CONF.format(data_dir=tiny_scene_flow, H=48, W=64,
                            n_images=10, map_iters=6, track_iters=4)
    # swap in the flow-regime SLAM block (keyframe stride 2, global window
    # from frame 8)
    head = FLOW_REGIME_EXTRA.format(map_iters=6)
    body = head + body[body.index("\ntrain {"):]
    conf_path = str(work / "flow.conf")
    with open(conf_path, "w") as f:
        f.write(body)

    from nicer_slam_tpu.slam.runner import SLAMRunner
    from nicer_slam_tpu.slam import mapping as mapping_mod

    compiles_before = mapping_mod.map_step._cache_size()
    r = SLAMRunner(conf=conf_path, root_dir=str(work), quiet=True)
    terms_by_frame = {}
    for frame_idx in range(r.n_images):
        r.track(frame_idx)
        if frame_idx % r.mapping_every_frame == 0:
            terms_by_frame[frame_idx] = r._map_impl(frame_idx)

    # frame 8 is in the global-window regime: flow edges must have fired
    assert r._use_flow, "flow edges never activated in the global regime"
    n_edges = int(np.asarray(r._edge_refs[2]).sum())
    assert 0 < n_edges < r.map_cfg.max_edges, n_edges
    fl = float(terms_by_frame[8]["flow_loss"])
    assert np.isfinite(fl) and fl > 0.0, fl
    assert np.isfinite(float(terms_by_frame[8]["loss"]))
    # the flow pairs were served from the cross-iteration cache, not re-read
    assert len(r._flow_cache) > 0
    # shape-stable design: compiles are bounded by the static-flag combos
    # (stage x color_stage x ba x use_flow x is_first_frame — ~10 reachable
    # here), NEVER one per mapping iteration (36) or per kept-edge count
    compiles = mapping_mod.map_step._cache_size() - compiles_before
    assert compiles <= 12, f"map_step recompiled: {compiles} new entries"


@pytest.fixture(scope="module")
def tiny_scene_flow(tmp_path_factory):
    from nicer_slam_tpu.datasets.synthetic import generate

    root = tmp_path_factory.mktemp("flowscene")
    data_dir = str(root / "Synthetic")
    generate(data_dir, scan_id=1, n_frames=10, H=48, W=64, world_scale=3.0,
             keyframe_every=2, flow_thresh=6, with_flow=True)
    return data_dir


def test_optimizer_checkpoint_structure_guard(tmp_path):
    """Resume must refuse a checkpoint whose optimizer tree no longer
    matches (leaf-index-only restore would silently corrupt Adam moments)."""
    import jax
    import jax.numpy as jnp
    import optax
    import pytest as _pytest

    from nicer_slam_tpu.slam import checkpoint as ckpt

    params_a = {"w": jnp.ones((3,)), "b": jnp.zeros((2,))}
    opt = optax.adam(1e-3)
    state_a = opt.init(params_a)
    d = str(tmp_path / "OptimizerParameters")
    ckpt.save_optimizer(d, state_a, 5)

    # same structure round-trips
    restored = ckpt.load_optimizer(d, state_a)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(restored)[0]),
        np.asarray(jax.tree.leaves(state_a)[0]))

    # different param tree -> hard error, not silent mis-load
    params_b = {"w2": jnp.ones((3,)), "b": jnp.zeros((2,))}
    state_b = opt.init(params_b)
    with _pytest.raises(ValueError, match="structure mismatch"):
        ckpt.load_optimizer(d, state_b)

    # same keys, different shape -> hard error
    params_c = {"w": jnp.ones((4,)), "b": jnp.zeros((2,))}
    state_c = opt.init(params_c)
    with _pytest.raises(ValueError, match="shape"):
        ckpt.load_optimizer(d, state_c)


def test_resume_from_checkpoint(runner, tiny_scene, tmp_path_factory):
    from nicer_slam_tpu.slam.runner import SLAMRunner

    root = os.path.dirname(os.path.dirname(runner.expdir))
    r2 = SLAMRunner(conf=runner.conf_path, root_dir=root, is_continue=True,
                    quiet=True)
    assert r2.start_frame_idx == 8
    np.testing.assert_allclose(
        np.asarray(r2.est_pose_all[4]), np.asarray(runner.est_pose_all[4]),
        atol=1e-5)


def test_keyframes_global_draw_small_range():
    """Documented divergence (keyframes.py): when the global regime starts
    with frame_idx // ke <= 4 (reachable only with a test-sized
    global_window_start), the reference's torch.randint(0, frame//ke - 4)
    would raise on the empty range; we clamp and draw keyframe 0."""
    from nicer_slam_tpu.slam.keyframes import KeyframeConfig, KeyframeSelector

    # frame == global_window_start with frame//ke - 4 <= 0
    cfg = KeyframeConfig(mapping_window_size=6, keyframe_every=10,
                         num_mapping_iters=10, global_window_start=30)
    sel = KeyframeSelector(cfg, seed=0)
    win = sel.window(frame_idx=30, mapping_iter=0)   # 30//10 - 4 = -1 -> clamp
    # global slots (first ws//3 = 2 entries) must all be keyframe 0
    assert win.keyframe_list[:2] == [0, 0]
    # current frame still present; keyframe-0 slots never BA-written-back
    assert 30 in win.keyframe_list
    assert win.writeback_eligible[0] is False and win.writeback_eligible[1] is False

    # boundary where the range becomes non-empty: frame//ke - 4 == 1
    sel2 = KeyframeSelector(cfg, seed=0)
    win2 = sel2.window(frame_idx=50, mapping_iter=0)
    assert all(k == 0 for k in win2.keyframe_list[:2])  # only id 0 drawable

    # healthy regime sanity: draws stay within [0, frame//ke - 4) * ke
    cfg3 = KeyframeConfig(mapping_window_size=6, keyframe_every=10,
                          num_mapping_iters=10, global_window_start=30)
    sel3 = KeyframeSelector(cfg3, seed=1)
    win3 = sel3.window(frame_idx=200, mapping_iter=0)
    assert all(k % 10 == 0 and k <= (200 // 10 - 5) * 10
               for k in win3.keyframe_list[:2])


def test_propagate_ba_corrections_rigid_attachment():
    """pose_graph_propagate: frames BA never touched get the world-frame
    correction of their nearest preceding corrected keyframe; frames before
    the earliest corrected keyframe and frame 0 stay put."""
    from nicer_slam_tpu.slam.runner import SLAMRunner

    class Stub:
        _propagate_ba_corrections = SLAMRunner._propagate_ba_corrections

    r = Stub()
    rng = np.random.default_rng(0)

    def rand_pose(t):
        p = np.eye(4)
        p[:3, 3] = t
        return p

    # est poses 0..9; BA corrected keyframes 4 and 8 by known deltas
    r.est_pose_all = {j: rand_pose([j, 0, 0]) for j in range(10)}
    old4 = r.est_pose_all[4].copy()
    old8 = r.est_pose_all[8].copy()
    d4 = rand_pose([0.0, 0.5, 0.0])
    d8 = rand_pose([0.0, 0.0, -0.25])
    r.est_pose_all[4] = d4 @ old4
    r.est_pose_all[8] = d8 @ old8
    before = {j: r.est_pose_all[j].copy() for j in r.est_pose_all}

    r._propagate_ba_corrections({4: old4, 8: old8})

    for j in (0, 1, 2, 3):       # before earliest corrected kf: untouched
        np.testing.assert_allclose(r.est_pose_all[j], before[j])
    for j in (5, 6, 7):          # attached to kf 4
        np.testing.assert_allclose(r.est_pose_all[j], d4 @ before[j],
                                   atol=1e-12)
    np.testing.assert_allclose(r.est_pose_all[9], d8 @ before[9], atol=1e-12)
    # corrected keyframes themselves are left at their BA values
    np.testing.assert_allclose(r.est_pose_all[4], before[4])
    np.testing.assert_allclose(r.est_pose_all[8], before[8])


def test_tracking_rot_lr_scale(runner):
    """rot_lr_scale semantics: 1.0 is bit-identical to the reference path
    (the scale branch is compiled out), 0.0 freezes the quaternion dims
    while translation still moves."""
    import jax
    import jax.numpy as jnp
    from nicer_slam_tpu.slam.tracking import track_frame

    r = runner
    row = r.store.row(4)
    K = jnp.asarray(r.dataset.intrinsics_all[4])
    from nicer_slam_tpu.utils.camera import tensor_from_camera_np
    init_q = jnp.asarray(tensor_from_camera_np(
        np.asarray(r.est_pose_all[3], np.float32)))
    key = jax.random.PRNGKey(11)

    def run(cfg):
        best_q, final_q, _ = track_frame(
            r.scene_cfg, cfg, r.tracking_loss_cfg, r.params, r.voxels,
            r.store.rgb[row], K, init_q, key, r.density_cache)
        return np.asarray(best_q), np.asarray(final_q)

    base_cfg = r.track_cfg._replace(num_iters=6)
    b0, f0 = run(base_cfg)
    b1, f1 = run(base_cfg._replace(rot_lr_scale=1.0))
    np.testing.assert_array_equal(f0, f1)

    bz, fz = run(base_cfg._replace(rot_lr_scale=0.0))
    q0 = np.asarray(init_q)
    np.testing.assert_array_equal(fz[:4], q0[:4])   # rotation frozen
    assert np.abs(fz[4:] - q0[4:]).max() > 0        # translation moved

    # conf default flows through the runner
    assert runner.track_cfg.rot_lr_scale == 1.0


def test_tracking_motion_prior(runner):
    """Motion-prior semantics. In-loss prior: 0.0 is bit-identical to the
    reference path (branch compiled out); a large weight pulls the final
    pose back toward the init (but Adam's per-dim normalization caps its
    restoring force at ~lr/iter, so it only damps — no clamp guarantee).
    Decoupled spring: 1.0 pins the pose at the init exactly, fractional
    values mean-revert the walk."""
    import jax
    import jax.numpy as jnp
    from nicer_slam_tpu.slam.tracking import track_frame

    r = runner
    row = r.store.row(4)
    K = jnp.asarray(r.dataset.intrinsics_all[4])
    from nicer_slam_tpu.utils.camera import tensor_from_camera_np
    init_q = jnp.asarray(tensor_from_camera_np(
        np.asarray(r.est_pose_all[3], np.float32)))
    key = jax.random.PRNGKey(13)

    def run(cfg):
        _, final_q, _ = track_frame(
            r.scene_cfg, cfg, r.tracking_loss_cfg, r.params, r.voxels,
            r.store.rgb[row], K, init_q, key, r.density_cache)
        return np.asarray(final_q)

    base_cfg = r.track_cfg._replace(num_iters=8)
    f0 = run(base_cfg)
    np.testing.assert_array_equal(
        f0, run(base_cfg._replace(motion_prior_w=0.0,
                                  motion_prior_rot_w=0.0,
                                  motion_prior_spring=0.0)))

    q0 = np.asarray(init_q)
    dist0 = np.linalg.norm(f0 - q0)
    assert dist0 > 0  # unconstrained tracker moves

    # in-loss prior damps the walk (directional, not a clamp — Adam
    # normalizes the prior gradient per-dim)
    f_mp = run(base_cfg._replace(motion_prior_w=1e6,
                                 motion_prior_rot_w=1e6))
    assert np.linalg.norm(f_mp - q0) < dist0

    # spring=1.0 pins the pose at the init (up to one fp32 rounding of
    # the q - (q - q0) cancellation per iter)
    f_pin = run(base_cfg._replace(motion_prior_spring=1.0))
    np.testing.assert_allclose(f_pin, q0, atol=1e-6)

    # fractional spring mean-reverts: final distance well under the
    # unconstrained walk
    f_s = run(base_cfg._replace(motion_prior_spring=0.5))
    assert np.linalg.norm(f_s - q0) < dist0

    # conf default flows through the runner (reference behavior = off)
    assert runner.track_cfg.motion_prior_w == 0.0
    assert runner.track_cfg.motion_prior_rot_w == 0.0
    assert runner.track_cfg.motion_prior_spring == 0.0


def test_ba_trust_region_bounds_writeback(tiny_scene, tmp_path_factory):
    """BA_trust_radius/_rot_deg: every BA-written keyframe pose stays inside
    the trust ball around its first-BA-touch anchor, even with a BA_cam_lr
    cranked far above the radius (the sign-step would otherwise move it
    n_ba_iters * lr per mapping call). 0/0 (default) is reference behavior
    and is covered by every other BA test in this file."""
    work = tmp_path_factory.mktemp("exp_trust")
    conf_path = str(work / "tiny_trust.conf")
    conf = TINY_CONF.format(data_dir=tiny_scene, H=60, W=80, n_images=6,
                            map_iters=8, track_iters=6)
    conf = conf.replace(
        "BA_cam_lr = 0.001",
        "BA_cam_lr = 0.05\n        BA_trust_radius = 0.01\n"
        "        BA_trust_rot_deg = 0.5")
    with open(conf_path, "w") as f:
        f.write(conf)
    from nicer_slam_tpu.slam.runner import SLAMRunner

    r = SLAMRunner(conf=conf_path, root_dir=str(work), quiet=True)
    assert r.BA_trust_radius == 0.01 and r.BA_trust_rot_deg == 0.5
    for fidx in range(6):
        r.track(fidx)
        if fidx % r.mapping_every_frame == 0:
            r.map(fidx)
    # BA ran (frame 4 mapping call has iters > 0.7*8) and anchored keyframes
    assert r._ba_anchor, "BA never wrote back — test setup regressed"
    for kf, anchor in r._ba_anchor.items():
        cur = np.asarray(r.est_pose_all[kf])
        d = float(np.linalg.norm(cur[:3, 3] - anchor[:3, 3]))
        assert d <= 0.01 + 1e-5, (kf, d)
        Rd = cur[:3, :3] @ anchor[:3, :3].T
        ang = np.degrees(np.arccos(np.clip((np.trace(Rd) - 1) / 2, -1, 1)))
        # f32 quaternion<->matrix round-trips between clamp and the next
        # writeback add ~0.005 deg of slop on top of the exact clamp
        assert ang <= 0.5 + 0.01, (kf, ang)
    # with lr 0.05 and 2 BA iters/call the unclamped step would be ~0.1;
    # at least one keyframe must actually have hit the clamp
    hits = [kf for kf, anchor in r._ba_anchor.items()
            if np.linalg.norm(np.asarray(r.est_pose_all[kf])[:3, 3]
                              - anchor[:3, 3]) > 0.0099]
    assert hits, "clamp never engaged — BA_cam_lr too small for the test"
