"""FrameStore capacity/eviction behavior at simulated Replica scale
(VERDICT round-1 weak item 7: a mid-run capacity abort on a 2000-frame
sequence would lose hours — prove the sizing formula and the eviction
policy on the real staging pattern, tiny pixel counts)."""

import numpy as np
import pytest

from nicer_slam_tpu.slam.frame_store import FrameStore


def _stage(store, fid, keyframe_every, HW):
    store.put(
        fid,
        rgb=np.zeros((HW, 3), np.uint8),
        depth=np.zeros((HW,), np.float16),
        normal=np.zeros((HW, 3), np.float16),
        gt_depth=None,
        mask=None,
        is_keyframe=(fid % keyframe_every == 0),
    )


def test_replica_scale_staging_pattern():
    """2000 frames, keyframe_every=10, runner's sizing formula: every frame
    is staged once for tracking (recent ring) and keyframes persist. No
    exhaustion; all keyframes stay resident; the recent ring evicts."""
    n_images, keyframe_every = 2000, 10
    H, W = 2, 3
    n_kf_rows = n_images // keyframe_every + 2          # runner.py sizing
    store = FrameStore(H, W, n_kf_rows, n_recent_rows=keyframe_every + 2)

    for fid in range(n_images):
        _stage(store, fid, keyframe_every, H * W)

    # every keyframe is still resident at its own row
    kf_rows = {store.row(f) for f in range(0, n_images, keyframe_every)}
    assert len(kf_rows) == n_images // keyframe_every
    assert max(kf_rows) < n_kf_rows

    # the recent ring holds only the newest non-keyframes
    recent = [f for f in range(n_images) if f % keyframe_every != 0
              and f in store]
    assert len(recent) <= keyframe_every + 2
    assert min(recent) >= n_images - 2 * (keyframe_every + 2)

    # staging an already-resident frame is a no-op returning the same row
    r0 = store.row(0)
    _stage(store, 0, keyframe_every, H * W)
    assert store.row(0) == r0


def test_keyframe_exhaustion_raises_clear_error():
    store = FrameStore(2, 3, n_keyframe_rows=2, n_recent_rows=2)
    _stage(store, 0, 1, 6)
    _stage(store, 1, 1, 6)
    with pytest.raises(RuntimeError, match="keyframe rows exhausted"):
        _stage(store, 2, 1, 6)


def test_recent_ring_eviction_reuses_rows():
    store = FrameStore(2, 3, n_keyframe_rows=1, n_recent_rows=3)
    _stage(store, 0, 10, 6)               # keyframe
    rows = []
    for fid in range(1, 8):               # 7 non-keyframes through a 3-ring
        _stage(store, fid, 10, 6)
        rows.append(store.row(fid))
    assert set(rows) == {1, 2, 3}         # rows after the single kf row
    assert 0 in store                     # keyframe never evicted
    resident = [f for f in range(1, 8) if f in store]
    assert resident == [5, 6, 7]          # only the newest 3 remain
