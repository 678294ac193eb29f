"""Unit tests for tools/rot_drift_forensics.py (round-5 post-mortem tool).

Pure numpy — no JAX. Three synthetic regimes with known ground truth:
a fixed-axis precession must be detected as coherent+linear, a constant
body-gauge conjugation must be fully absorbed by the AX=XB fit, and an
exact trajectory must report ~zero everything.
"""

import importlib.util
import os

import numpy as np

_spec = importlib.util.spec_from_file_location(
    "rot_drift_forensics",
    os.path.join(os.path.dirname(__file__), "..", "tools",
                 "rot_drift_forensics.py"))
rdf = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(rdf)


def _rot(axis, ang):
    axis = np.asarray(axis, float) / np.linalg.norm(axis)
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(ang) * K + (1 - np.cos(ang)) * (K @ K)


def _orbit(n, rate=0.003, radius=2.0, axis=(0, 1, 0)):
    poses = np.tile(np.eye(4), (n, 1, 1))
    for i in range(n):
        R = _rot(axis, i * rate)
        poses[i, :3, :3] = R
        poses[i, :3, 3] = R @ np.array([radius, 0.0, 0.0])
    return poses


def _save(tmp_path, est, gt):
    path = os.path.join(tmp_path, "poses.npz")
    np.savez(path, keys=np.arange(len(est)), est=est.astype(np.float32),
             gt=gt.astype(np.float32))
    return path


def test_exact_trajectory_reports_zero(tmp_path):
    gt = _orbit(120)
    out = rdf.analyze(_save(tmp_path, gt.copy(), gt), global_window_start=60)
    assert out["drift_final_deg"] < 0.1
    assert abs(out["rate_pre_gws_deg_per_frame"]) < 1e-3
    assert out["conj_fit_residual_final_deg"] < 0.1
    assert abs(out["est_over_gt_arc"] - 1.0) < 1e-3


def test_fixed_axis_precession_detected(tmp_path):
    gt = _orbit(150)
    prec_rate = np.radians(0.3)
    est = gt.copy()
    for i in range(len(est)):
        est[i, :3, :3] = _rot((1, 0.3, -0.5), i * prec_rate) @ est[i, :3, :3]
    out = rdf.analyze(_save(tmp_path, est, gt), global_window_start=150)
    # linear growth at the injected rate, on one coherent axis
    assert abs(out["rate_pre_gws_deg_per_frame"] - 0.3) < 0.03
    assert out["axis_coherence"] > 0.99
    assert abs(out["drift_final_deg"] - 0.3 * 149) < 2.0
    # a growing precession is NOT explained by a constant conjugation
    assert out["conj_fit_residual_final_deg"] > 10.0


def test_constant_conjugation_absorbed(tmp_path):
    gt = _orbit(300, rate=0.006)
    D = _rot((0.2, 1, 0.4), np.radians(60.0))
    est = gt.copy()
    # rel_e = D^T rel_g D  <=>  R_e,i = R_g,0 D^T R_g,0^T R_g,i D; with
    # R_g,0 = I: R_e,i = D^T R_g,i D (body-frame convention offset)
    for i in range(len(est)):
        est[i, :3, :3] = D.T @ est[i, :3, :3] @ D
    out = rdf.analyze(_save(tmp_path, est, gt), global_window_start=60)
    # raw drift is nonzero, but the AX=XB fit explains it away
    assert out["drift_max_deg"] > 5.0
    assert out["conj_fit_residual_final_deg"] < 0.5
