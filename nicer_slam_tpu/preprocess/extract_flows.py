"""Optical-flow extraction between keyframe pairs (GMFlow equivalent).

Reference: preprocess/extract_flows.py — GMFlow bidirectional flow on
keyframe pairs (interval 10, radius 3 keyframes, thresh 30), forward/backward
consistency check -> occlusion PNGs (0 = usable), lzma .npy flows.

Backends, in resolution order:
  * ``ckpt``: a converted JAX GMFlow checkpoint (models/gmflow.py).
  * classical RGB-only: pyramidal Horn-Schunck with warping — real flow
    computed from the images alone (no depth, no poses); used whenever no
    checkpoint is given and the scan has no gt_depth pngs, keeping the
    RGB-only pipeline honest. Lower quality than GMFlow on large motions.
  * geometric: exact flow from GT depth + poses with forward/backward
    depth-consistency occlusion — the highest-fidelity option on
    depth-equipped scans (synthetic tests/benches).
"""

from __future__ import annotations

import argparse
import lzma
import os
from glob import glob
from typing import Optional

import numpy as np


def flow_from_depth(depth_i: np.ndarray, c2w_i: np.ndarray,
                    c2w_j: np.ndarray, K: np.ndarray):
    """Exact flow i->j from z-depth; returns (flow [H,W,2], z in j [H,W],
    target pixel coords [H,W,2])."""
    H, W = depth_i.shape
    ys, xs = np.mgrid[0:H, 0:W]
    X = (xs - K[0, 2]) / K[0, 0] * depth_i
    Y = (ys - K[1, 2]) / K[1, 1] * depth_i
    pts = np.stack([X, Y, depth_i], -1).reshape(-1, 3)
    w2c_j = np.linalg.inv(c2w_j)
    rel = w2c_j @ c2w_i
    pj = pts @ rel[:3, :3].T + rel[:3, 3]
    z = pj[:, 2]
    u = K[0, 0] * pj[:, 0] / np.maximum(z, 1e-9) + K[0, 2]
    v = K[1, 1] * pj[:, 1] / np.maximum(z, 1e-9) + K[1, 2]
    flow = np.stack([u - xs.reshape(-1), v - ys.reshape(-1)], -1)
    tgt = np.stack([u, v], -1)
    return (flow.reshape(H, W, 2).astype(np.float32),
            z.reshape(H, W), tgt.reshape(H, W, 2))


def occlusion_from_depth(depth_i, depth_j, c2w_i, c2w_j, K,
                         rel_tol: float = 0.05):
    """Occlusion/validity via projected-depth consistency: pixel usable iff
    the point lands in-bounds in j, in front of the camera, and j's depth at
    the landing pixel agrees within rel_tol."""
    H, W = depth_i.shape
    flow, z_in_j, tgt = flow_from_depth(depth_i, c2w_i, c2w_j, K)
    ui = np.clip(np.round(tgt[..., 0]).astype(np.int64), 0, W - 1)
    vi = np.clip(np.round(tgt[..., 1]).astype(np.int64), 0, H - 1)
    inb = ((tgt[..., 0] >= 0) & (tgt[..., 0] < W)
           & (tgt[..., 1] >= 0) & (tgt[..., 1] < H) & (z_in_j > 0)
           & (depth_i > 0))
    dj = depth_j[vi, ui]
    consistent = np.abs(dj - z_in_j) < rel_tol * np.maximum(z_in_j, 1e-6)
    usable = inb & consistent & (dj > 0)
    return flow, usable


def _bilinear_warp(img: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Sample img [H,W] at (x+u, y+v), edge-clamped."""
    H, W = img.shape
    ys, xs = np.mgrid[0:H, 0:W]
    x = np.clip(xs + u, 0, W - 1.001)
    y = np.clip(ys + v, 0, H - 1.001)
    x0 = x.astype(np.int64)
    y0 = y.astype(np.int64)
    fx, fy = x - x0, y - y0
    return ((1 - fx) * (1 - fy) * img[y0, x0]
            + fx * (1 - fy) * img[y0, x0 + 1]
            + (1 - fx) * fy * img[y0 + 1, x0]
            + fx * fy * img[y0 + 1, x0 + 1])


def _box3(a: np.ndarray) -> np.ndarray:
    """3x3 box filter, edge-replicated."""
    p = np.pad(a, 1, mode="edge")
    return sum(p[i:i + a.shape[0], j:j + a.shape[1]]
               for i in range(3) for j in range(3)) / 9.0


def _downsample2(a: np.ndarray) -> np.ndarray:
    H2, W2 = a.shape[0] // 2 * 2, a.shape[1] // 2 * 2
    a = a[:H2, :W2]
    return 0.25 * (a[0::2, 0::2] + a[1::2, 0::2] + a[0::2, 1::2]
                   + a[1::2, 1::2])


def classical_flow(img0: np.ndarray, img1: np.ndarray, n_levels: int = 5,
                   n_iters: int = 80, alpha: float = 12.0) -> np.ndarray:
    """Pyramidal Horn-Schunck optical flow with warping (RGB-only; no
    learned weights, no depth). img0/img1 [H,W,3] in [0,1] -> flow [H,W,2]
    in pixels (0 -> 1)."""
    # classic HS alphas assume 0-255 intensity units
    g0 = img0.mean(-1).astype(np.float64) * 255.0
    g1 = img1.mean(-1).astype(np.float64) * 255.0
    pyr0, pyr1 = [g0], [g1]
    for _ in range(n_levels - 1):
        if min(pyr0[-1].shape) < 16:
            break
        pyr0.append(_downsample2(pyr0[-1]))
        pyr1.append(_downsample2(pyr1[-1]))

    u = np.zeros_like(pyr0[-1])
    v = np.zeros_like(pyr0[-1])
    a2 = alpha * alpha
    for lvl in range(len(pyr0) - 1, -1, -1):
        a0, b0 = pyr0[lvl], pyr1[lvl]
        if u.shape != a0.shape:
            sy = a0.shape[0] / u.shape[0]
            sx = a0.shape[1] / u.shape[1]
            yi = np.minimum((np.arange(a0.shape[0]) / sy).astype(int),
                            u.shape[0] - 1)
            xi = np.minimum((np.arange(a0.shape[1]) / sx).astype(int),
                            u.shape[1] - 1)
            u = u[yi][:, xi] * sx
            v = v[yi][:, xi] * sy
        # warp img1 toward img0 by the current flow, solve for the increment
        for _ in range(3):  # warping iterations per level
            w1 = _bilinear_warp(b0, u, v)
            Ix = 0.5 * (np.gradient(a0, axis=1) + np.gradient(w1, axis=1))
            Iy = 0.5 * (np.gradient(a0, axis=0) + np.gradient(w1, axis=0))
            It = w1 - a0
            du = np.zeros_like(u)
            dv = np.zeros_like(v)
            denom = a2 + Ix * Ix + Iy * Iy
            for _ in range(n_iters // 3):
                du_avg = _box3(du)
                dv_avg = _box3(dv)
                t = (Ix * du_avg + Iy * dv_avg + It) / denom
                du = du_avg - Ix * t
                dv = dv_avg - Iy * t
            u = u + du
            v = v + dv
    return np.stack([u, v], -1).astype(np.float32)


def _pairs(frame_ids, thresh: int = 30):
    out = []
    for i in frame_ids:
        for j in frame_ids:
            if 0 < abs(i - j) <= thresh:
                out.append((i, j))
    return out


def extract_flows(img_path: str, output_path: str, ckpt: Optional[str] = None,
                  keyframe_every: int = 10, thresh: int = 30,
                  gt_depth_png_scale: float = 6553.5,
                  fwd_bwd_tol: float = 1.0,
                  rgb_only: bool = False) -> None:
    os.makedirs(output_path, exist_ok=True)
    import cv2
    import imageio.v2 as imageio

    rgbs = (sorted(glob(os.path.join(img_path, "*_rgb.png")))
            + sorted(glob(os.path.join(img_path, "*_rgb.jpg"))))
    n = len(rgbs)
    kf_ids = list(range(0, n, keyframe_every))
    pairs = _pairs(kf_ids, thresh)

    use_model = ckpt and os.path.exists(ckpt)
    have_depth = bool(glob(os.path.join(img_path, "*_gt_depth.png")))
    if use_model or rgb_only or not have_depth:
        if use_model:
            from ..models.gmflow import GMFlowInference

            model = GMFlowInference(ckpt)
        else:
            # classical RGB-only fallback (no weights, no depth, no poses)
            model = classical_flow
        cache = {}

        def get_img(i):
            if i not in cache:
                cache[i] = np.asarray(imageio.imread(rgbs[i]),
                                      np.float32)[..., :3] / 255.0
            return cache[i]

        flows = {}
        for i, j in pairs:
            flows[(i, j)] = model(get_img(i), get_img(j))
        for i, j in pairs:
            fwd = flows[(i, j)]
            bwd = flows[(j, i)]
            H, W = fwd.shape[:2]
            ys, xs = np.mgrid[0:H, 0:W]
            u = np.clip(np.round(xs + fwd[..., 0]).astype(np.int64), 0, W - 1)
            v = np.clip(np.round(ys + fwd[..., 1]).astype(np.int64), 0, H - 1)
            cycle = fwd + bwd[v, u]
            usable = np.linalg.norm(cycle, axis=-1) < fwd_bwd_tol
            _write_pair(output_path, i, j, fwd, usable)
        return

    # geometric fallback from GT depth + cameras.npz poses
    cams = np.load(os.path.join(img_path, "cameras.npz"))
    from ..utils.camera import load_K_Rt_from_P

    def load_frame(i):
        P = (cams[f"world_mat_{i}"] @ cams[f"scale_mat_{i}"])[:3, :4]
        intr, pose = load_K_Rt_from_P(P)
        d = cv2.imread(os.path.join(img_path, f"{i:06d}_gt_depth.png"), -1)
        scale = float(cams["scale_mat_0"][0, 0])
        d = d.astype(np.float32) / gt_depth_png_scale / scale  # cube units
        return intr[:3, :3], pose, d

    cache = {}
    for i, j in pairs:
        for k in (i, j):
            if k not in cache:
                cache[k] = load_frame(k)
        K, pose_i, d_i = cache[i]
        _, pose_j, d_j = cache[j]
        flow, usable = occlusion_from_depth(d_i, d_j, pose_i, pose_j, K)
        _write_pair(output_path, i, j, flow, usable)


def _write_pair(output_path: str, i: int, j: int, flow: np.ndarray,
                usable: np.ndarray) -> None:
    import imageio.v2 as imageio

    with lzma.open(os.path.join(output_path, f"{i:04d}_{j:04d}_flow.npy"),
                   "wb") as f:
        np.save(f, flow.astype(np.float32))
    occ = np.where(usable, 0, 255).astype(np.uint8)
    imageio.imwrite(os.path.join(output_path, f"{i:04d}_{j:04d}_occ.png"),
                    np.stack([occ] * 3, -1))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--inference_dir", required=True)
    p.add_argument("--output_path", required=True)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--keyframe_every", type=int, default=10)
    p.add_argument("--thresh", type=int, default=30)
    a = p.parse_args(argv)
    extract_flows(a.inference_dir, a.output_path, a.ckpt,
                  a.keyframe_every, a.thresh)


if __name__ == "__main__":
    main()
