"""TSDF fusion from posed depth maps -> GT mesh (on-device, JAX).

Replaces the reference's Open3D ScalableTSDFVolume step
(preprocess/get_mesh_7scenes.py:12-46): integrate every (depth, pose) pair
into a dense truncated-SDF voxel volume, then extract the zero level set.

TPU-native: each integration step back-projects the whole voxel grid into
the frame and updates tsdf/weight in one fused jit (a scan over frames);
the grid lives on device across the sequence.
"""

from __future__ import annotations

import argparse
import os
from glob import glob
from typing import Optional, Tuple

import numpy as np


def make_integrate_fn(res: int, bounds_min, bounds_max, sdf_trunc: float,
                      depth_max: float):
    import jax
    import jax.numpy as jnp

    bounds_min = jnp.asarray(bounds_min, jnp.float32)
    bounds_max = jnp.asarray(bounds_max, jnp.float32)
    xs = [jnp.linspace(bounds_min[d], bounds_max[d], res) for d in range(3)]
    grid = jnp.stack(jnp.meshgrid(*xs, indexing="ij"), -1).reshape(-1, 3)

    @jax.jit
    def integrate(tsdf, weight, depth_img, w2c, K):
        """One frame: depth_img [H,W], w2c [4,4], K [3,3]."""
        H, W = depth_img.shape
        cam = grid @ w2c[:3, :3].T + w2c[:3, 3]
        z = cam[:, 2]
        u = K[0, 0] * cam[:, 0] / z + K[0, 2]
        v = K[1, 1] * cam[:, 1] / z + K[1, 2]
        ui = jnp.round(u).astype(jnp.int32)
        vi = jnp.round(v).astype(jnp.int32)
        inb = (z > 0) & (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H)
        ui = jnp.clip(ui, 0, W - 1)
        vi = jnp.clip(vi, 0, H - 1)
        d = depth_img[vi, ui]
        valid = inb & (d > 0) & (d < depth_max)
        sdf = d - z                       # + in front of surface
        within = sdf > -sdf_trunc
        tsdf_obs = jnp.clip(sdf / sdf_trunc, -1.0, 1.0)
        w_obs = jnp.where(valid & within, 1.0, 0.0)
        new_weight = weight + w_obs
        new_tsdf = jnp.where(
            new_weight > 0,
            (tsdf * weight + tsdf_obs * w_obs) / jnp.maximum(new_weight, 1e-9),
            tsdf)
        return new_tsdf, new_weight

    return integrate, np.asarray(grid).reshape(res, res, res, 3)


def fuse_depths(depths, c2ws, K, res: int = 256,
                bounds: Optional[Tuple[np.ndarray, np.ndarray]] = None,
                voxel_trunc: float = 4.0, depth_max: float = 5.0,
                min_weight: float = 1.0):
    """Fuse a sequence; returns (verts, faces, normals) world-space mesh.

    depths: iterable of [H,W] float depth maps (meters); c2ws: [N,4,4];
    K: [3,3].
    """
    import jax.numpy as jnp

    if bounds is None:
        # bound from camera frustum centers ± depth_max
        centers = np.asarray(c2ws)[:, :3, 3]
        lo = centers.min(0) - depth_max
        hi = centers.max(0) + depth_max
    else:
        lo, hi = bounds
    voxel = float(np.max(np.asarray(hi) - np.asarray(lo)) / res)
    sdf_trunc = voxel_trunc * voxel

    integrate, grid = make_integrate_fn(res, lo, hi, sdf_trunc, depth_max)
    tsdf = jnp.ones((res ** 3,), jnp.float32)
    weight = jnp.zeros((res ** 3,), jnp.float32)
    for depth, c2w in zip(depths, c2ws):
        w2c = np.linalg.inv(c2w).astype(np.float32)
        tsdf, weight = integrate(tsdf, weight, jnp.asarray(depth, jnp.float32),
                                 jnp.asarray(w2c), jnp.asarray(K, jnp.float32))

    tsdf_np = np.asarray(tsdf).reshape(res, res, res)
    w_np = np.asarray(weight).reshape(res, res, res)

    from ..ops.marching_cubes import marching_tetrahedra

    step = [(hi[d] - lo[d]) / (res - 1) for d in range(3)]
    # only mesh fully-observed cubes: suppresses the phantom shell at the
    # truncation/observation boundary behind surfaces
    return marching_tetrahedra(tsdf_np, level=0.0, spacing=tuple(step),
                               origin=tuple(lo),
                               valid=w_np >= min_weight)


def main(argv=None):
    """CLI: fuse 7-Scenes GT depth into a GT mesh
    (get_mesh_7scenes.py equivalent)."""
    import cv2

    p = argparse.ArgumentParser()
    p.add_argument("--scan_dir", required=True,
                   help="processed scan dir with *_gt_depth.png + cameras.npz")
    p.add_argument("--out", required=True, help="output .ply")
    p.add_argument("--res", type=int, default=256)
    p.add_argument("--depth_scale", type=float, default=1000.0)
    p.add_argument("--every", type=int, default=5)
    a = p.parse_args(argv)

    from ..utils.camera import load_K_Rt_from_P
    from ..utils.ply import write_ply

    cams = np.load(os.path.join(a.scan_dir, "cameras.npz"))
    depth_files = sorted(glob(os.path.join(a.scan_dir, "*_gt_depth.png")))
    idxs = list(range(0, len(depth_files), a.every))
    depths, c2ws = [], []
    K = None
    for i in idxs:
        # world_mat alone (no scale_mat) -> world-frame mesh
        P = cams[f"world_mat_{i}"][:3, :4]
        intr, pose = load_K_Rt_from_P(P)
        K = intr[:3, :3]
        d = cv2.imread(depth_files[i], -1).astype(np.float32) / a.depth_scale
        depths.append(d)
        c2ws.append(pose)
    verts, faces, normals = fuse_depths(depths, np.stack(c2ws), K, res=a.res)
    write_ply(a.out, verts, faces, normals=normals)
    print(f"wrote {a.out}: {verts.shape[0]} verts, {faces.shape[0]} faces")


if __name__ == "__main__":
    main()
