"""Checkpoint/resume with the reference's on-disk contract.

The reference writes three ``latest.pth`` files per run
(volsdf_train.py:226-253):
  checkpoints/ModelParameters/latest.*    model state + voxel counter + frame_idx
  checkpoints/OptimizerParameters/latest.* optimizer state
  checkpoints/PoseParameters/latest.*     est_pose_all dict + gt_pose_all list

We keep the same tree and key semantics but store ``.npz`` pytrees instead
of torch pickles (SURVEY.md §5 allows this since the eval tools are ours).
Pose checkpoints keep est_pose_all as a {frame_idx: 4x4 c2w} mapping.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List

import jax
import numpy as np


def _flatten_pytree(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten_pytree(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten_pytree(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten_into(template, flat, prefix=""):
    """Rebuild arrays in the structure of ``template`` from flat dict."""
    if isinstance(template, dict):
        return {k: _unflatten_into(v, flat, f"{prefix}{k}/")
                for k, v in template.items()}
    if isinstance(template, (list, tuple)):
        seq = [
            _unflatten_into(v, flat, f"{prefix}{i}/")
            for i, v in enumerate(template)
        ]
        return type(template)(seq) if isinstance(template, tuple) else seq
    return flat[prefix[:-1]]


def save_model(path_dir: str, params: Dict[str, Any], voxels, frame_idx: int):
    os.makedirs(path_dir, exist_ok=True)
    flat = _flatten_pytree({"model_state_dict": params})
    flat["voxels"] = np.asarray(voxels)
    flat["frame_idx"] = np.asarray(frame_idx)
    np.savez(os.path.join(path_dir, "latest.npz"), **flat)


def load_model(path_dir: str, params_template: Dict[str, Any],
               checkpoint: str = "latest"):
    data = np.load(os.path.join(path_dir, f"{checkpoint}.npz"),
                   allow_pickle=False)
    flat = {k: data[k] for k in data.files}
    params = _unflatten_into({"model_state_dict": params_template}, flat)
    return (params["model_state_dict"], flat["voxels"],
            int(flat["frame_idx"]))


def _opt_state_keypaths(opt_state):
    """Stable per-leaf key paths — the structural fingerprint that guards
    resume against a changed optimizer config / param tree (leaf-index-only
    restore would silently load Adam moments into the wrong slots)."""
    flat, _ = jax.tree_util.tree_flatten_with_path(opt_state)
    return [jax.tree_util.keystr(path) for path, _ in flat]


def save_optimizer(path_dir: str, opt_state, frame_idx: int):
    os.makedirs(path_dir, exist_ok=True)
    leaves, treedef = jax.tree.flatten(opt_state)
    flat = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    flat["frame_idx"] = np.asarray(frame_idx)
    flat["keypaths"] = np.asarray(_opt_state_keypaths(opt_state))
    np.savez(os.path.join(path_dir, "latest.npz"), **flat)


def load_optimizer(path_dir: str, opt_state_template,
                   checkpoint: str = "latest"):
    data = np.load(os.path.join(path_dir, f"{checkpoint}.npz"))
    leaves, treedef = jax.tree.flatten(opt_state_template)
    if "keypaths" in data.files:
        saved = [str(s) for s in data["keypaths"]]
        current = _opt_state_keypaths(opt_state_template)
        if saved != current:
            raise ValueError(
                "optimizer checkpoint structure mismatch (optimizer config "
                "or param tree changed since save); refusing to restore "
                f"misaligned Adam state. saved {len(saved)} leaves vs "
                f"current {len(current)}; first difference: "
                f"{next((f'{a} != {b}' for a, b in zip(saved, current) if a != b), 'leaf count')}")
    new_leaves = []
    for i, tmpl in enumerate(leaves):
        leaf = data[f"leaf_{i}"]
        if leaf.shape != np.asarray(tmpl).shape:
            raise ValueError(
                f"optimizer checkpoint leaf_{i} shape {leaf.shape} != "
                f"expected {np.asarray(tmpl).shape}")
        new_leaves.append(leaf)
    return jax.tree.unflatten(treedef, new_leaves)


def save_poses(path_dir: str, est_pose_all: Dict[int, np.ndarray],
               gt_pose_all: List[np.ndarray], frame_idx: int):
    os.makedirs(path_dir, exist_ok=True)
    keys = sorted(est_pose_all.keys())
    flat = {
        "frame_idx": np.asarray(frame_idx),
        "est_keys": np.asarray(keys, np.int64),
        "est_poses": np.stack([np.asarray(est_pose_all[k]) for k in keys])
        if keys else np.zeros((0, 4, 4), np.float32),
        "gt_poses": np.stack([np.asarray(p) for p in gt_pose_all])
        if len(gt_pose_all) else np.zeros((0, 4, 4), np.float32),
    }
    np.savez(os.path.join(path_dir, "latest.npz"), **flat)


def load_poses(path_dir: str, checkpoint: str = "latest"):
    data = np.load(os.path.join(path_dir, f"{checkpoint}.npz"))
    est = {int(k): data["est_poses"][i]
           for i, k in enumerate(data["est_keys"])}
    gt = [data["gt_poses"][i] for i in range(data["gt_poses"].shape[0])]
    return est, gt, int(data["frame_idx"])
