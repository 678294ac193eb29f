"""Full-image rendering in fixed-size ray chunks (vis/eval path).

Equivalent of the reference's split_input/merge_output chunked render
(utils/general.py:169-204, volsdf_train.py:255-310): one jitted chunk
renderer reused for every chunk (fixed shapes), padded at the tail.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..models import scene_model as sm


@functools.partial(jax.jit, static_argnames=("scene_cfg", "chunk"))
def _render_chunk(scene_cfg: sm.SceneConfig, chunk: int, params, voxels,
                  uv, c2w, K, frame_id, key):
    batch = sm.RayBatch(
        uv=uv,
        kf_slot=jnp.zeros((chunk,), jnp.int32),
        poses=c2w[None],
        intrinsics=K[None],
        frame_ids=jnp.asarray([frame_id], jnp.int32),
        slot_valid=jnp.ones((1,), bool),
        ray_valid=jnp.ones((chunk,), bool),
    )
    out = sm.render_rays(scene_cfg, params, voxels, batch, key,
                         stage="fine", color_stage="highfreq",
                         training=False, is_mapping=False)
    return {
        "rgb_values": out["rgb_values"],
        "depth_values": out["depth_values"],
        "normal_map": out["normal_map"],
    }


def render_image(scene_cfg: sm.SceneConfig, params, voxels,
                 c2w: np.ndarray, K: np.ndarray, frame_idx: int = 0,
                 chunk: int = 8192, key=None) -> Dict[str, np.ndarray]:
    H, W = scene_cfg.H, scene_cfg.W
    total = H * W
    if key is None:
        key = jax.random.PRNGKey(0)
    xs = np.arange(total) % W
    ys = np.arange(total) // W
    uv_all = np.stack([xs, ys], -1).astype(np.float32)

    outs = {"rgb_values": [], "depth_values": [], "normal_map": []}
    c2w_j = jnp.asarray(c2w, jnp.float32)
    K_j = jnp.asarray(K, jnp.float32)
    for start in range(0, total, chunk):
        end = min(start + chunk, total)
        uv = uv_all[start:end]
        pad = chunk - uv.shape[0]
        if pad:
            uv = np.concatenate([uv, np.zeros((pad, 2), np.float32)], 0)
        res = _render_chunk(scene_cfg, chunk, params, voxels,
                            jnp.asarray(uv), c2w_j, K_j, frame_idx,
                            jax.random.fold_in(key, start))
        for k in outs:
            v = np.asarray(res[k])
            outs[k].append(v[: end - start])
    return {
        "rgb": np.concatenate(outs["rgb_values"]).reshape(H, W, 3),
        "depth": np.concatenate(outs["depth_values"]).reshape(H, W),
        "normal": np.concatenate(outs["normal_map"]).reshape(H, W, 3),
    }
