import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nicer_slam_tpu.models import fields
from nicer_slam_tpu.models import scene_model as sm
from nicer_slam_tpu.ops.ray_sampling import SamplerConfig


def tiny_scene_cfg(H=32, W=40):
    imp = fields.ImplicitNetConfig(
        dims=(16,), base_size=8, end_size=16, num_levels=2, level_dim=2,
        logmap=15, multires=6, feature_vector_size=8, name="coarse")
    # fine: geometric_init off (like runconf_demo_1.conf) — geometric init
    # zeroes first-layer grid-feature weights, giving exactly-zero grid grads
    # at step 0 (base_networks.py:138), which would defeat the grad tests.
    impf = imp._replace(dims=(16, 16), name="fine", geometric_init=False)
    rend = fields.RenderingNetConfig(
        dims=(16, 16), multires_view=4, use_grid_feature=False,
        feature_vector_size=8, n_images=10)
    return sm.SceneConfig(
        combine=fields.CombineConfig(coarse=imp, fine=impf),
        render=rend,
        sampler=SamplerConfig(N_samples=8, N_samples_eval=32, N_samples_extra=4),
        use_warp_loss=True,
        H=H, W=W,
    )


def make_batch(cfg, R=16, S=2):
    rng = np.random.default_rng(0)
    uv = np.stack([rng.uniform(0, cfg.W - 1, R), rng.uniform(0, cfg.H - 1, R)],
                  axis=-1).astype(np.float32)
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = 35.0
    K[0, 2] = cfg.W / 2
    K[1, 2] = cfg.H / 2
    poses = np.tile(np.eye(4, dtype=np.float32)[None], (S, 1, 1))
    poses[:, 2, 3] = -0.3  # camera inside the init sphere (r=0.6), looking +z
    return sm.RayBatch(
        uv=jnp.asarray(uv),
        kf_slot=jnp.asarray((np.arange(R) % S).astype(np.int32)),
        poses=jnp.asarray(poses),
        intrinsics=jnp.tile(jnp.asarray(K)[None], (S, 1, 1)),
        frame_ids=jnp.arange(S, dtype=jnp.int32),
        slot_valid=jnp.ones(S, dtype=bool),
        ray_valid=jnp.ones(R, dtype=bool),
    )


@pytest.fixture(scope="module")
def scene():
    cfg = tiny_scene_cfg()
    params = sm.init_scene_params(jax.random.PRNGKey(0), cfg)
    voxels = sm.init_voxels(cfg)
    return cfg, params, voxels


def test_render_shapes_and_finiteness(scene):
    cfg, params, voxels = scene
    batch = make_batch(cfg)
    R = batch.uv.shape[0]
    out = jax.jit(lambda p, v, b, k: sm.render_rays(
        cfg, p, v, b, k, stage="fine", is_mapping=True,
        full_rgb=jnp.ones((2, cfg.H * cfg.W, 3)) * 0.5))(
        params, voxels, batch, jax.random.PRNGKey(1))
    S_total = cfg.sampler.total_samples
    assert out["rgb_values"].shape == (R, 3)
    assert out["depth_values"].shape == (R, 1)
    assert out["normal_map"].shape == (R, 3)
    assert out["sdf"].shape == (R, S_total)
    assert out["weights"].shape == (R, S_total)
    assert out["grad_theta"].shape == (R * 11, 3)
    assert out["warp_sampled_rgb_1"].shape == (2, R, 1, 3)
    assert float(out["voxels"].sum()) > 0
    for k in ("rgb_values", "depth_values", "normal_map"):
        assert np.isfinite(np.asarray(out[k])).all(), k


def test_geometric_init_renders_plausible_depth(scene):
    """With geometric init (inside_outside sphere of radius ~bias=0.6) the
    rendered depth should be near the camera-to-surface distance."""
    cfg, params, voxels = scene
    batch = make_batch(cfg, R=4)
    out = jax.jit(lambda p, v, b, k: sm.render_rays(
        cfg, p, v, b, k, training=False))(params, voxels, batch,
                                          jax.random.PRNGKey(2))
    # camera at z=-0.3 inside the geometric-init sphere (radius ~0.6):
    # the wall along +z is ~0.9 away -> rendered depth should be O(1)
    d = np.asarray(out["depth_values"])[:, 0]
    assert np.all(d > 0.2) and np.all(d < 1.6)


def test_pose_gradients_flow(scene):
    """Tracking path: d loss / d pose quaternion must be nonzero."""
    cfg, params, voxels = scene
    batch = make_batch(cfg, R=8, S=1)
    from nicer_slam_tpu.utils.camera import camera_from_tensor

    def loss(t7):
        b = batch._replace(poses=camera_from_tensor(t7)[None])
        out = sm.render_rays(cfg, params, voxels, b, jax.random.PRNGKey(3),
                             training=True)
        return out["rgb_values"].sum() + out["depth_values"].sum()

    t7 = jnp.array([1.0, 0.01, 0.0, 0.0, 0.0, 0.0, -0.8])
    g = jax.jit(jax.grad(loss))(t7)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_param_gradients_flow_second_order(scene):
    """Mapping path: grads w.r.t. hash grids through the normal map (a
    second-order path) must be finite and nonzero."""
    cfg, params, voxels = scene
    batch = make_batch(cfg, R=8)

    def loss(p):
        out = sm.render_rays(cfg, p, voxels, batch, jax.random.PRNGKey(4),
                             stage="fine", is_mapping=True)
        eik = ((jnp.linalg.norm(out["grad_theta"], axis=1) - 1) ** 2).mean()
        return out["rgb_values"].sum() + out["normal_map"].sum() + eik

    g = jax.jit(jax.grad(loss))(params)
    g_fine = np.asarray(g["implicit"]["fine"]["encoding"])
    g_coarse = np.asarray(g["implicit"]["coarse"]["encoding"])
    assert np.isfinite(g_fine).all() and np.isfinite(g_coarse).all()
    assert np.abs(g_fine).max() > 0
    # coarse uses geometric init whose first layer zeroes grid-feature
    # columns (base_networks.py:138): its grid grads are exactly zero at
    # step 0 in the reference too.
    assert np.abs(g_coarse).max() == 0
    g_mlp = np.asarray(g["implicit"]["coarse"]["lins"][0]["v"])
    assert np.abs(g_mlp).max() > 0  # but its MLP does receive gradient


def test_warp_patches_and_ssim(scene):
    """Warp machinery with patchsize>1 (network.py:177-279): patch outputs
    have [S,R,ps^2(,3)] shapes; at identical poses the warp of a slot into
    itself is the identity, so sampled == gt on in-bounds patch pixels; the
    depth-variance mask kills high-variance patches; and both l1 and SSIM
    warp losses are finite with parameter gradients flowing."""
    cfg, params, voxels = scene
    cfg = cfg._replace(patchsizes=(1, 5))
    R, S = 8, 2
    batch = make_batch(cfg, R=R, S=S)
    # integer pixel centers away from the border so 5x5 patches stay inside
    rng = np.random.default_rng(3)
    uv = np.stack([rng.integers(4, cfg.W - 4, R),
                   rng.integers(4, cfg.H - 4, R)], -1).astype(np.float32)
    batch = batch._replace(uv=jnp.asarray(uv))
    HW = cfg.H * cfg.W
    # smooth image: the reference's grid_sample convention (normalize by W,
    # align_corners=True) samples at u*(W-1)/W — up to ~1px off the integer
    # gt sample — so the identity-warp check needs low image frequency
    ys, xs = np.mgrid[0:cfg.H, 0:cfg.W]
    grad_img = np.stack([xs / cfg.W, ys / cfg.H,
                         np.full_like(xs, 0.5, dtype=float)], -1)
    full_rgb = jnp.asarray(np.tile(grad_img.reshape(1, HW, 3), (S, 1, 1))
                           .astype(np.float32))
    flat_depth = np.full((S, HW), 0.5, np.float32)
    flat_depth[1, : HW // 2] = 5.0       # slot-1 depth edge -> high variance
    out = jax.jit(lambda p, v, b, k: sm.render_rays(
        cfg, p, v, b, k, stage="fine", is_mapping=True,
        full_rgb=full_rgb, full_depth=jnp.asarray(flat_depth)))(
        params, voxels, batch, jax.random.PRNGKey(6))

    assert out["warp_sampled_rgb_5"].shape == (S, R, 25, 3)
    assert out["warp_gt_rgb_5"].shape == (R, 25, 3)
    assert out["warp_mask_5"].shape == (S, R, 25)

    # identical poses: the warp into the ray's OWN slot is the identity, so
    # the bilinear sample equals the integer gt sample wherever masked
    samp = np.asarray(out["warp_sampled_rgb_5"])
    gtp = np.asarray(out["warp_gt_rgb_5"])
    m = np.asarray(out["warp_mask_5"])
    slot = np.asarray(batch.kf_slot)
    for r in range(R):
        s = slot[r]
        sel = m[s, r]
        if sel.any():
            np.testing.assert_allclose(samp[s, r][sel], gtp[r][sel],
                                       atol=5e-2)

    # the depth-variance mask masks patches whose mono-depth patch variance
    # exceeds 0.01 (constant-depth slot-0 rays survive)
    var_rows = [r for r in range(R) if slot[r] == 0]
    assert m[:, var_rows].any()

    # both warp loss types: finite, and grads flow into the hash grids
    from nicer_slam_tpu.models.losses import LossConfig, compute_losses

    gt = {
        "rgb": full_rgb[jnp.asarray(slot), (uv[:, 1].astype(int) * cfg.W
                                            + uv[:, 0].astype(int))],
        "depth": jnp.full((R, 1), 0.5),
        "normal": jnp.ones((R, 3)),
        "gt_depth": jnp.full((R, 1), 0.5),
        "mask": jnp.ones((R, 1)),
    }
    for wtype in ("l1", "ssim"):
        lcfg = LossConfig(warp_loss_weight=0.5, warp_loss_type=wtype,
                          rgb_loss_weight=1.0)

        def loss_fn(p):
            o = sm.render_rays(cfg, p, voxels, batch, jax.random.PRNGKey(7),
                               stage="fine", is_mapping=True,
                               full_rgb=full_rgb,
                               full_depth=jnp.asarray(flat_depth))
            t = compute_losses(lcfg, o, gt, batch, stage="fine",
                               is_first_frame=False, num_slots=S)
            return t["loss"], t["warp_loss"]

        (loss, wl), g = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))(
            params)
        assert np.isfinite(float(loss)) and np.isfinite(float(wl)), wtype
        g_fine = np.asarray(g["implicit"]["fine"]["encoding"])
        assert np.isfinite(g_fine).all() and np.abs(g_fine).max() > 0, wtype


def test_flow_prediction_identity_pose(scene):
    """Two identical poses -> predicted flow between them is ~zero."""
    cfg, params, voxels = scene
    batch = make_batch(cfg, R=8, S=2)
    edges = sm.FlowEdges(idii=jnp.array([0]), idjj=jnp.array([1]),
                         valid=jnp.ones(1, dtype=bool))
    out = jax.jit(lambda p, v, b, k: sm.render_rays(
        cfg, p, v, b, k, training=False, edges=edges))(
        params, voxels, batch, jax.random.PRNGKey(5))
    flow = np.asarray(out["flow"])  # [1,R,2]
    np.testing.assert_allclose(flow, 0.0, atol=0.1)  # f32 4x4-inverse roundoff


def test_density_cache_trilinear_exact():
    """The blocked prepass cache + trilinear lookup reproduces any
    trilinear-in-space field exactly (and zeros out-of-bounds points)."""
    res = 16
    xs = np.linspace(-1, 1, res)
    I, J, K = np.meshgrid(xs, xs, xs, indexing="ij")
    vol = (2.0 * I + 3.0 * J - 1.5 * K + 0.25).astype(np.float32)
    blocks = []
    for c in range(8):
        v = vol
        if c & 1:
            v = np.roll(v, -1, axis=0)
        if c & 2:
            v = np.roll(v, -1, axis=1)
        if c & 4:
            v = np.roll(v, -1, axis=2)
        blocks.append(v.reshape(-1))
    cache = jnp.asarray(np.stack(blocks, -1))
    pts = np.random.default_rng(0).uniform(-0.98, 0.98, (500, 3)).astype(np.float32)
    got = np.asarray(sm._density_cache_lookup(cache, res, jnp.asarray(pts)))
    want = 2.0 * pts[:, 0] + 3.0 * pts[:, 1] - 1.5 * pts[:, 2] + 0.25
    np.testing.assert_allclose(got, want, atol=2e-5)
    oob = np.asarray(sm._density_cache_lookup(
        cache, res, jnp.asarray([[1.2, 0.0, 0.0], [0.0, -1.01, 0.0]])))
    assert np.all(oob == 0.0)


def test_build_density_cache_blocked_shape(scene):
    cfg, params, voxels = scene
    cache = jax.jit(lambda p, v: sm.build_density_cache(cfg, p, v))(params, voxels)
    res = cfg.sampler.prepass_cache_res
    assert cache.shape == (res ** 3, 8)
    assert np.isfinite(np.asarray(cache)).all()
    # corner 0 of cell (i,j,k) equals corner 7 of cell (i-1,j-1,k-1):
    # the blocked rows are consistent views of one volume
    vol = np.asarray(cache[:, 0]).reshape(res, res, res)
    c7 = np.asarray(cache[:, 7]).reshape(res, res, res)
    np.testing.assert_allclose(c7[:-1, :-1, :-1], vol[1:, 1:, 1:], rtol=1e-6)


def test_color_topk_pruning_close_to_exact(scene):
    """TPU-native color top-K pruning (SceneConfig.color_topk): pruned
    compositing must stay close to the exact all-sample composite (the
    renormalized top-K sum captures the surviving weight mass) and must
    remain differentiable w.r.t. scene params."""
    cfg, params, voxels = scene
    batch = make_batch(cfg, R=8)
    key = jax.random.PRNGKey(11)

    def run(c):
        return jax.jit(lambda p, v, b, k: sm.render_rays(
            c, p, v, b, k, stage="fine", training=True, is_mapping=True))(
            params, voxels, batch, key)

    exact = run(cfg)
    S_total = cfg.sampler.total_samples
    pruned = run(cfg._replace(color_topk=S_total // 2))
    assert pruned["rgb"].shape == (8, S_total // 2, 3)
    # same sampling key -> same z_vals/weights; color composite approximated
    np.testing.assert_allclose(np.asarray(pruned["weights"]),
                               np.asarray(exact["weights"]), atol=1e-6)
    err = np.abs(np.asarray(pruned["rgb_values"])
                 - np.asarray(exact["rgb_values"])).max()
    assert err < 0.05, err
    # depth/normals untouched by the color path
    np.testing.assert_allclose(np.asarray(pruned["depth_values"]),
                               np.asarray(exact["depth_values"]), atol=1e-6)

    # gradients flow through the pruned path (params + weights)
    cfg_k = cfg._replace(color_topk=4)

    def loss(p):
        out = sm.render_rays(cfg_k, p, voxels, batch, key,
                             stage="fine", training=True, is_mapping=True)
        return (out["rgb_values"] ** 2).sum()

    g = jax.jit(jax.grad(loss))(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    total = sum(float(np.abs(np.asarray(l)).sum()) for l in leaves)
    assert total > 0

    # eval path (training=False) ignores color_topk entirely
    ev_k = jax.jit(lambda p, v, b, k: sm.render_rays(
        cfg_k, p, v, b, k, training=False))(params, voxels, batch, key)
    ev = jax.jit(lambda p, v, b, k: sm.render_rays(
        cfg, p, v, b, k, training=False))(params, voxels, batch, key)
    np.testing.assert_allclose(np.asarray(ev_k["rgb_values"]),
                               np.asarray(ev["rgb_values"]), atol=1e-7)
