import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nicer_slam_tpu.models import losses as L
from nicer_slam_tpu.models.scene_model import FlowEdges, RayBatch


def make_batch(R=32, S=4):
    rng = np.random.default_rng(0)
    return RayBatch(
        uv=jnp.asarray(rng.uniform(0, 100, (R, 2)).astype(np.float32)),
        kf_slot=jnp.asarray((np.arange(R) // (R // S)).astype(np.int32)),
        poses=jnp.tile(jnp.eye(4)[None], (S, 1, 1)),
        intrinsics=jnp.tile(jnp.eye(4)[None], (S, 1, 1)),
        frame_ids=jnp.arange(S, dtype=jnp.int32),
        slot_valid=jnp.ones((S,), dtype=bool),
        ray_valid=jnp.ones((R,), dtype=bool),
    )


def test_scale_shift_closed_form_matches_lstsq():
    rng = np.random.default_rng(1)
    R, S = 64, 2
    pred = rng.uniform(0.1, 2.0, R)
    seg = (np.arange(R) // (R // S)).astype(np.int32)
    true_scale = np.array([2.0, 0.5])
    true_shift = np.array([0.3, -0.1])
    target = pred * true_scale[seg] + true_shift[seg]
    mask = np.ones(R)
    s, t = L.compute_scale_and_shift_segments(
        jnp.asarray(pred), jnp.asarray(target), jnp.asarray(mask),
        jnp.asarray(seg), S)
    np.testing.assert_allclose(np.asarray(s), true_scale, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(t), true_shift, atol=1e-5)


def test_ssi_loss_invariance():
    """The SSI loss must be zero when prediction is an affine transform of
    the target (per segment)."""
    rng = np.random.default_rng(2)
    R, S = 64, 4
    seg = (np.arange(R) // (R // S)).astype(np.int32)
    target = rng.uniform(0.5, 3.0, R)
    pred = (target - 0.2 * seg) / (1.0 + seg)  # per-seg affine of target
    mask = np.ones(R)
    v = L.ssi_depth_loss(jnp.asarray(pred), jnp.asarray(target),
                         jnp.asarray(mask), jnp.asarray(seg), S)
    assert float(v) < 1e-5


def test_ssi_loss_detects_structure_error():
    rng = np.random.default_rng(3)
    R = 64
    seg = np.zeros(R, dtype=np.int32)
    target = rng.uniform(0.5, 3.0, R)
    pred = rng.uniform(0.5, 3.0, R)  # unrelated
    v = L.ssi_depth_loss(jnp.asarray(pred), jnp.asarray(target),
                         jnp.asarray(np.ones(R)), jnp.asarray(seg), 1)
    assert float(v) > 1e-3


def test_normal_losses_perfect_and_orthogonal():
    n = jnp.array([[1.0, 0, 0], [0, 1.0, 0]])
    mask = jnp.ones((2, 1), dtype=bool)
    l1, cos = L.normal_losses(n, n, mask)
    assert float(l1) < 1e-6 and float(cos) < 1e-6
    n2 = jnp.array([[0.0, 1.0, 0], [1.0, 0, 0]])
    l1o, coso = L.normal_losses(n, n2, mask)
    np.testing.assert_allclose(float(coso), 1.0, atol=1e-6)


def test_eikonal_and_smooth():
    g = jnp.array([[1.0, 0, 0], [0, 2.0, 0]])
    np.testing.assert_allclose(float(L.eikonal_loss(g)), 0.5, atol=1e-6)
    assert float(L.smooth_loss(g, g)) < 1e-6


def test_full_stack_weights_and_first_frame():
    R, S, E = 32, 4, 3
    batch = make_batch(R, S)
    rng = np.random.default_rng(4)
    outputs = {
        "rgb_values": jnp.asarray(rng.uniform(0, 1, (R, 3)).astype(np.float32)),
        "depth_values": jnp.asarray(rng.uniform(0.5, 2, (R, 1)).astype(np.float32)),
        "normal_map": jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32)),
        "sdf": jnp.asarray(rng.normal(size=(R, 8)).astype(np.float32)),
        "grad_theta": jnp.ones((R, 3)),
        "grad_theta_nei": jnp.ones((R, 3)),
        "flow": jnp.zeros((E, R, 2)),
        "warp_sampled_rgb": jnp.zeros((S, R, 3)),
        "warp_mask": jnp.ones((S, R), dtype=bool),
    }
    gt = {
        "rgb": outputs["rgb_values"],  # zero rgb loss
        "depth": jnp.asarray(rng.uniform(0, 1, (R, 1)).astype(np.float32)),
        "normal": jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32)),
        "gt_depth": jnp.asarray(rng.uniform(0.5, 2, (R, 1)).astype(np.float32)),
        "mask": jnp.ones((R, 1)),
    }
    cfg = L.LossConfig(rgb_loss_weight=1.0, eikonal_weight=0.1,
                       smooth_weight=0.005, depth_weight=0.1,
                       normal_l1_weight=0.05, normal_cos_weight=0.05,
                       flow_weight=0.001, warp_loss_weight=0.5,
                       assign_scale_shift_init=True, assign_scale=20.0)
    edges = FlowEdges(idii=jnp.array([0, 1, 2]), idjj=jnp.array([1, 2, 3]),
                      valid=jnp.ones(3, dtype=bool))
    terms = L.compute_losses(
        cfg, outputs, gt, batch, stage="fine", is_first_frame=False,
        num_slots=S, flow_gt=jnp.zeros((E, R, 2)),
        flow_mask=jnp.ones((E, R), dtype=bool), edges=edges)
    assert float(terms["rgb_loss"]) < 1e-6
    assert float(terms["eikonal_loss"]) > 0  # |grad|=sqrt(3) != 1
    assert np.isfinite(float(terms["loss"]))
    # frame 0: gt_depth loss becomes the metric anchor with weight 10
    terms0 = L.compute_losses(
        cfg, outputs, gt, batch, stage="fine", is_first_frame=True,
        num_slots=S)
    # anchor target = mono depth * 20 which is far from pred -> big loss
    assert float(terms0["gt_depth_loss"]) > 1.0
    # warp disabled at frame 0
    assert float(terms0["warp_loss"]) == 0.0


def test_tracking_loss_rgb_only():
    R, S = 16, 1
    batch = make_batch(R, S)
    outputs = {
        "rgb_values": jnp.zeros((R, 3)),
        "depth_values": jnp.ones((R, 1)),
        "normal_map": jnp.ones((R, 3)),
        "sdf": jnp.ones((R, 4)),
    }
    gt = {
        "rgb": jnp.full((R, 3), 0.5),
        "depth": jnp.ones((R, 1)),
        "normal": jnp.ones((R, 3)),
        "gt_depth": jnp.ones((R, 1)),
        "mask": jnp.ones((R, 1)),
    }
    cfg = L.LossConfig()  # all zero but rgb
    terms = L.compute_losses(cfg, outputs, gt, batch, stage="fine",
                             num_slots=S)
    np.testing.assert_allclose(float(terms["loss"]), 0.5, atol=1e-6)
