"""Rotation-drift forensics on banked pose snapshots (round-5 post-mortem).

Decomposes the raw relative-orientation drift (`evaluation.ate.rotation_drift`)
of a long-sequence run into mechanism hypotheses:

  * **rate + axis coherence** — is the drift a random walk (incoherent axes,
    sqrt-t growth) or a secular precession (fixed axis, linear growth)?
  * **constant-conjugation fit** — solves the hand-eye equation
    ``rel_est @ D = D @ rel_gt`` (AX=XB) by linear least squares + SO(3)
    projection. If a single constant D explained the curve, the "drift"
    would be a fixed body-gauge rotation (a convention/initialization
    artifact), not an accumulating error.
  * **phase split at the global BA window** — the reference activates
    all-keyframe BA sampling past ``global_window_start`` (reference
    volsdf_train.py keyframe schedule); drift that saturates there is
    bounded by the same mechanism the reference relies on.

Round-5 findings on the shipped snapshots (LONG_SEQ_GUARDED/FINAL
_r05_poses.npz): the raw drift grows ~0.25-0.30 deg/frame on one
coherent axis, identically across every tracker configuration (anneal /
spring / trust region / free-space guard) and dataset regeneration — so
it is NOT the tracking-optimizer noise floor (those levers measurably
cut per-frame jitter). The AX=XB fit then explains 80-90%% of it as a
SINGLE constant gauge conjugation — the map forms tilted relative to GT
during the first frames and the trajectory thereafter lives consistently
in the tilted gauge (sim3 trajectory alignment absorbs the tilt for
camera CENTERS, which is why ATE stays low, but the raw relative-rotation
metric exposes it). The conjugation-aligned residual — the true
accumulating orientation error — is 3-12 deg over 150-450 frames on
healthy-map runs, and saturates past the global BA window; only the
anneal-only run whose map died mid-run (fog collapse) keeps a large
residual (tracking coasting against a light field).

Usage:  python tools/rot_drift_forensics.py LONG_SEQ_*_poses.npz
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def _ang_deg(A: np.ndarray) -> np.ndarray:
    t = np.clip((np.trace(A, axis1=-2, axis2=-1) - 1) / 2, -1.0, 1.0)
    return np.degrees(np.arccos(t))


def _axes(S: np.ndarray) -> np.ndarray:
    ax = np.stack([S[..., 2, 1] - S[..., 1, 2],
                   S[..., 0, 2] - S[..., 2, 0],
                   S[..., 1, 0] - S[..., 0, 1]], -1)
    n = np.linalg.norm(ax, axis=-1, keepdims=True)
    return ax / np.where(n < 1e-12, 1.0, n)


def _to_so3(D: np.ndarray) -> np.ndarray:
    U, _, Vt = np.linalg.svd(D)
    D = U @ Vt
    if np.linalg.det(D) < 0:
        D = U @ np.diag([1.0, 1.0, -1.0]) @ Vt
    return D


def fit_conjugation(rel_e: np.ndarray, rel_g: np.ndarray) -> np.ndarray:
    """Best constant D with rel_e @ D ~= D @ rel_g (hand-eye AX=XB),
    via the nullspace of stacked Kronecker constraints, projected to SO(3).

    The nullspace can be multi-dimensional (e.g. rel_e == rel_g: every
    rotation commuting with the motion solves it, and an arbitrary
    nullspace vector may project to SO(3) badly), so candidates from the
    three smallest singular vectors AND the identity are scored by the
    actual conjugation residual; the argmin wins.
    """
    # row-major vec (numpy reshape): vec(A X) = kron(A, I) vec(X),
    # vec(X B) = kron(I, B^T) vec(X)  =>  rel_e X - X rel_g = 0 becomes
    I3 = np.eye(3)
    M = np.concatenate([np.kron(rel_e[i], I3) - np.kron(I3, rel_g[i].T)
                        for i in range(1, len(rel_e))], 0)
    _, _, V = np.linalg.svd(M)
    cands = [I3] + [_to_so3(V[-k].reshape(3, 3)) for k in (1, 2, 3)]

    def score(D):
        E = np.einsum("ji,njk,kl,nml->nim", D, rel_e, D, rel_g)
        return _ang_deg(E).mean()

    return min(cands, key=score)


def analyze(path: str, global_window_start: int = 200) -> dict:
    d = np.load(path)
    est = d["est"].astype(np.float64)
    gt = d["gt"].astype(np.float64)
    keys = d["keys"] if "keys" in d else np.arange(len(est))
    Re, Rg = est[:, :3, :3], gt[:, :3, :3]
    te, tg = est[:, :3, 3], gt[:, :3, 3]

    rel_e = np.einsum("ij,nik->njk", Re[0], Re)
    rel_g = np.einsum("ij,nik->njk", Rg[0], Rg)
    E = np.einsum("nij,nkj->nik", rel_e, rel_g)
    drift = _ang_deg(E)
    ax = _axes(E)
    # coherence: |mean unit axis| == 1 for a fixed-axis precession, ~0 for a walk
    w = drift > 2.0   # axes of near-identity rotations are numerically noisy
    coher = float(np.linalg.norm(ax[w].mean(0))) if w.any() else float("nan")

    n = len(drift)
    frames = np.asarray(keys, dtype=int)
    pre = frames < global_window_start
    post = ~pre
    rate_pre = float(np.polyfit(frames[pre], drift[pre], 1)[0]) if pre.sum() > 2 else float("nan")
    rate_post = float(np.polyfit(frames[post], drift[post], 1)[0]) if post.sum() > 2 else float("nan")

    D = fit_conjugation(rel_e, rel_g)
    conj = _ang_deg(np.einsum("ji,njk,kl,nml->nim", D, rel_e, D, rel_g))
    # gauge-tilt stability: refit on each half; a truly constant tilt gives
    # the same D (delta ~ residual), a slowly-growing one diverges
    h = len(rel_e) // 2
    D1 = fit_conjugation(rel_e[:h], rel_g[:h])
    D2 = fit_conjugation(rel_e[h:], rel_g[h:])
    d_split = float(_ang_deg((D1 @ D2.T)[None])[0])

    step_e = _ang_deg(np.einsum("nij,nik->njk", Re[:-1], Re[1:]))
    step_g = _ang_deg(np.einsum("nij,nik->njk", Rg[:-1], Rg[1:]))
    arc_e = float(np.linalg.norm(np.diff(te, axis=0), axis=1).sum())
    arc_g = float(np.linalg.norm(np.diff(tg, axis=0), axis=1).sum())

    return {
        "file": path,
        "frames": int(frames[-1]) + 1,
        "drift_final_deg": round(float(drift[-1]), 2),
        "drift_max_deg": round(float(drift.max()), 2),
        "axis_coherence": round(coher, 3),
        "rate_pre_gws_deg_per_frame": round(rate_pre, 4),
        "rate_post_gws_deg_per_frame": round(rate_post, 4),
        "conj_angle_deg": round(float(_ang_deg(D[None])[0]), 2),
        "conj_fit_residual_final_deg": round(float(conj[-1]), 2),
        "conj_fit_residual_max_deg": round(float(conj.max()), 2),
        "conj_halves_delta_deg": round(d_split, 2),
        "est_rot_rate_deg_per_frame": round(float(step_e.mean()), 3),
        "gt_rot_rate_deg_per_frame": round(float(step_g.mean()), 3),
        "est_over_gt_arc": round(arc_e / max(arc_g, 1e-12), 2),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("npz", nargs="+", help="pose snapshot npz (keys/est/gt)")
    p.add_argument("--gws", type=int, default=200,
                   help="global BA window start frame (phase split)")
    args = p.parse_args()
    out = [analyze(f, args.gws) for f in args.npz]
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
