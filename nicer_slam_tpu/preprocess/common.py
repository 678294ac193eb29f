"""Shared preprocessing core for the VolSDF on-disk format.

Behavioral reference: preprocess/{replica,7scenes,azure}_2_volsdf.py —
scene normalization into the unit cube from the GT-mesh bounding box
(optionally unioned with camera positions), ``world_mat = K @ w2c`` with
``scale_mat`` = cube->world similarity, image copying, and the monocular
cue / optical flow extraction hooks.
"""

from __future__ import annotations

import os
import shutil
from typing import Dict, Iterable, Optional, Tuple

import numpy as np


def compute_scale_mat(min_v: np.ndarray, max_v: np.ndarray,
                      enlarge: float = 1.5) -> np.ndarray:
    """cube->world scale_mat from a world-space bounding box.

    The normalizing transform is built first (world->cube: translate by
    -center then scale by 2/(maxdim*enlarge)) and inverted, exactly like
    replica_2_volsdf.py:44-62."""
    center = (min_v + max_v) / 2.0
    scale = 2.0 / (np.max(max_v - min_v) * enlarge)
    norm = np.eye(4, dtype=np.float64)
    norm[:3, 3] = -center
    norm[:3] *= scale
    return np.linalg.inv(norm).astype(np.float32)


def make_K4(fx: float, fy: float, cx: float, cy: float) -> np.ndarray:
    K = np.eye(4, dtype=np.float64)
    K[0, 0], K[1, 1], K[0, 2], K[1, 2] = fx, fy, cx, cy
    return K


def write_cameras_npz(out_path: str, c2ws: np.ndarray, K4: np.ndarray,
                      scale_mat: np.ndarray) -> None:
    """cameras.npz with world_mat_i = K @ inv(c2w_i) and a shared
    scale_mat_i."""
    cams: Dict[str, np.ndarray] = {}
    for i in range(c2ws.shape[0]):
        cams[f"world_mat_{i}"] = (K4 @ np.linalg.inv(c2ws[i])).astype(np.float32)
        cams[f"scale_mat_{i}"] = scale_mat.astype(np.float32)
    np.savez(os.path.join(out_path, "cameras.npz"), **cams)


def copy_or_convert_image(src: str, dst: str) -> None:
    if os.path.splitext(src)[1].lower() == os.path.splitext(dst)[1].lower():
        shutil.copyfile(src, dst)
    else:
        import imageio.v2 as imageio

        imageio.imwrite(dst, imageio.imread(src))


def normalize_mesh_and_export(mesh_path: str, scale_mat_inv_dst: str,
                              norm: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Load a GT mesh, return its bbox; export the cube-normalized copy."""
    from ..utils.ply import read_ply, write_ply

    mesh = read_ply(mesh_path)
    verts = mesh["verts"].astype(np.float64)
    min_v, max_v = verts.min(0), verts.max(0)
    verts_n = verts @ norm[:3, :3].T + norm[:3, 3]
    write_ply(scale_mat_inv_dst, verts_n.astype(np.float32), mesh["faces"],
              normals=mesh.get("normals"), colors=mesh.get("colors"))
    return min_v, max_v


def extract_cues_and_flow(out_path: str, *, with_cues: bool = True,
                          with_flow: bool = True,
                          keyframe_every: int = 10,
                          flow_thresh: int = 30,
                          depth_ckpt: Optional[str] = None,
                          normal_ckpt: Optional[str] = None,
                          flow_ckpt: Optional[str] = None) -> None:
    """On-device (JAX) monocular cue + optical flow extraction, replacing
    the reference's sibling-conda-env subprocess calls
    (replica_2_volsdf.py:96-102). Gated on converted checkpoints being
    available — this environment has no network access to fetch the
    Omnidata/GMFlow weights."""
    if with_cues:
        from .extract_monocular_cues import extract_cues

        extract_cues(out_path, out_path, depth_ckpt=depth_ckpt,
                     normal_ckpt=normal_ckpt)
    if with_flow:
        from .extract_flows import extract_flows

        extract_flows(out_path, out_path + "_pair", ckpt=flow_ckpt,
                      keyframe_every=keyframe_every, thresh=flow_thresh)
