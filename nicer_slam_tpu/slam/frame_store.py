"""Device-resident frame ring buffer.

The reference keeps a host-side per-frame dict cache and re-uploads sampled
pixels every iteration (scene_dataset.py:99-127, 227-232) — on TPU that
would be input-bound. Here every keyframe (and a rolling window of recent
frames) is staged ONCE into fixed device arrays; the jitted mapping step
gathers its per-iteration pixel batches on device.

Storage per frame row (H*W pixels): rgb uint8 (3B), mono depth f16 (2B),
mono normal f16x3 (6B), gt depth f16 (2B), mask bool (1B) = 14 B/pixel.
Replica (1200x680, 200 keyframes + 16 recent): ~2.5 GB HBM.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np


class FrameStore:
    def __init__(self, H: int, W: int, n_keyframe_rows: int,
                 n_recent_rows: int, device=None):
        self.H, self.W = H, W
        self.HW = H * W
        self.n_kf_rows = n_keyframe_rows
        self.n_recent_rows = n_recent_rows
        C = n_keyframe_rows + n_recent_rows
        self.capacity = C
        self._row_of_frame: Dict[int, int] = {}
        self._next_kf_row = 0
        self._next_recent = 0
        dev = device or jax.devices()[0]
        self.rgb = jax.device_put(np.zeros((C, self.HW, 3), np.uint8), dev)
        self.depth = jax.device_put(np.zeros((C, self.HW), np.float16), dev)
        self.normal = jax.device_put(np.zeros((C, self.HW, 3), np.float16), dev)
        self.gt_depth = jax.device_put(np.zeros((C, self.HW), np.float16), dev)
        self.mask = jax.device_put(np.zeros((C, self.HW), np.bool_), dev)

    def __contains__(self, frame_id: int) -> bool:
        return frame_id in self._row_of_frame

    def row(self, frame_id: int) -> int:
        return self._row_of_frame[frame_id]

    def put(self, frame_id: int, *, rgb: np.ndarray, depth: np.ndarray,
            normal: np.ndarray, gt_depth: Optional[np.ndarray],
            mask: Optional[np.ndarray], is_keyframe: bool) -> int:
        """Stage one frame. rgb [HW,3] float in [0,1] or uint8; depth [HW];
        normal [HW,3]; gt_depth [HW] or None; mask [HW] or None."""
        if frame_id in self._row_of_frame:
            return self._row_of_frame[frame_id]
        if is_keyframe:
            row = self._next_kf_row
            if row >= self.n_kf_rows:
                raise RuntimeError(
                    f"FrameStore keyframe rows exhausted staging frame "
                    f"{frame_id}: capacity {self.n_kf_rows} keyframe rows "
                    f"(+{self.n_recent_rows} recent). The runner sizes this "
                    f"as n_images // keyframe_every + 2 — check that the "
                    f"conf's n_images covers the sequence actually fed in.")
            self._next_kf_row += 1
        else:
            row = self.n_kf_rows + (self._next_recent % self.n_recent_rows)
            self._next_recent += 1
            # evict whatever recent frame previously used this row
            for fid, r in list(self._row_of_frame.items()):
                if r == row:
                    del self._row_of_frame[fid]
        self._row_of_frame[frame_id] = row

        if rgb.dtype != np.uint8:
            rgb = np.clip(rgb * 255.0 + 0.5, 0, 255).astype(np.uint8)
        self.rgb = self.rgb.at[row].set(rgb)
        self.depth = self.depth.at[row].set(depth.astype(np.float16))
        self.normal = self.normal.at[row].set(normal.astype(np.float16))
        if gt_depth is not None:
            self.gt_depth = self.gt_depth.at[row].set(gt_depth.astype(np.float16))
        else:
            self.gt_depth = self.gt_depth.at[row].set(
                np.ones((self.HW,), np.float16))
        if mask is not None:
            self.mask = self.mask.at[row].set(mask.astype(np.bool_))
        else:
            self.mask = self.mask.at[row].set(np.ones((self.HW,), np.bool_))
        return row
