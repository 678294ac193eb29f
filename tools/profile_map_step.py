"""Profile ONE map_step iteration on the real TPU and print the op-level
time breakdown (top-N ops by self time), parsed from a jax.profiler trace.

This is the measurement tool behind the round-3 scatter work: BASELINE.md's
microbenchmarks say big-table scatter dominates mapping, but the honest
per-op split of a real fine/highfreq iteration is what decides where the
Pallas/sorted-scatter effort goes.

Usage:
  python tools/profile_map_step.py [--stage fine] [--color_stage highfreq]
                                   [--rays 8192] [--top 40]

Writes the raw trace under /tmp/nicer_profile/ and prints a table of
  self_time_ms  count  op_name (truncated)
aggregated over the sampled steps.
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/nicer_slam_tpu_jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_trace(trace_dir: str, top: int = 40):
    """Aggregate XLA op self-times from the newest .trace.json.gz."""
    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        print("no trace found under", trace_dir, file=sys.stderr)
        return
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # TPU op events live on "/device:TPU:* XLA Ops"-style threads
    pid_names = {e["pid"]: e.get("args", {}).get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name"}
    tid_names = {(e["pid"], e["tid"]): e.get("args", {}).get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "thread_name"}
    agg = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        tname = tid_names.get((e.get("pid"), e.get("tid")), "")
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname and "TPU" not in tname:
            continue
        if "XLA Op" not in tname and "Steps" not in tname and tname != "":
            # keep only the op-level lanes
            if "XLA" not in tname:
                continue
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        if "XLA Op" in tname or "XLA TPU" in tname:
            rec = agg.setdefault(name, [0.0, 0])
            rec[0] += dur
            rec[1] += 1
            total += dur
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:top]
    print(f"\n== top {top} ops by total device time "
          f"(sum {total:.1f} ms across sampled steps) ==")
    for name, (ms, cnt) in rows:
        print(f"{ms:9.2f} ms  x{cnt:4d}  {name[:110]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="fine")
    ap.add_argument("--color_stage", default="highfreq")
    ap.add_argument("--rays", type=int, default=8192)
    ap.add_argument("--ba", action="store_true",
                    help="profile the BA variant (pose grads live)")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--parse_only", default=None,
                    help="skip running; parse this trace dir")
    a = ap.parse_args()

    if a.parse_only:
        parse_trace(a.parse_only, a.top)
        return

    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship_setup
    from nicer_slam_tpu.models.losses import loss_config_from_conf
    from nicer_slam_tpu.models.scene_model import build_density_cache
    from nicer_slam_tpu.slam.mapping import MapBatchRefs, MapConfig, map_step
    from nicer_slam_tpu.slam.state import OptimConfig, make_optimizer
    from nicer_slam_tpu.utils.camera import tensor_from_camera_np

    conf, scene_cfg, params, voxels = _flagship_setup(tiny=False, n_images=64)
    loss_cfg = loss_config_from_conf(conf.get_config("loss"))
    optim_cfg = OptimConfig(
        learning_rate=conf.get_float("train.learning_rate"),
        learning_rate_beta=conf.get_float("train.learning_rate_beta", 2e-3))
    optimizer = make_optimizer(optim_cfg, params)
    opt_state = optimizer.init(params)

    H, W = scene_cfg.H, scene_cfg.W
    HW = H * W
    Smax, Emax = 16, 4
    R = a.rays
    map_cfg = MapConfig(num_pixels=R, max_slots=Smax, max_edges=Emax)

    rng = np.random.default_rng(0)
    store_rgb = jnp.asarray(rng.integers(0, 255, (Smax, HW, 3)).astype(np.uint8))
    store_depth = jnp.asarray(rng.uniform(0.5, 4.0, (Smax, HW)).astype(np.float16))
    store_normal = jnp.asarray(rng.normal(size=(Smax, HW, 3)).astype(np.float16))
    store_gt = jnp.asarray(rng.uniform(0.5, 4.0, (Smax, HW)).astype(np.float16))
    store_mask = jnp.ones((Smax, HW), bool)

    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = 600.0
    K[0, 2], K[1, 2] = W / 2, H / 2
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = -0.5
    q = tensor_from_camera_np(pose)
    poses_q = jnp.tile(jnp.asarray(q)[None], (Smax, 1))

    refs = MapBatchRefs(
        slot_rows=jnp.arange(Smax, dtype=jnp.int32),
        frame_ids=jnp.arange(Smax, dtype=jnp.int32),
        n_valid=jnp.asarray(Smax, jnp.int32),
        intrinsics=jnp.tile(jnp.asarray(K)[None], (Smax, 1, 1)),
        edge_idii=jnp.zeros((Emax,), jnp.int32),
        edge_idjj=jnp.ones((Emax,), jnp.int32),
        edge_valid=jnp.ones((Emax,), bool),
        flow_imgs=jnp.asarray(rng.normal(size=(Emax, HW, 2)).astype(np.float16)),
        flow_occ=jnp.ones((Emax, HW), bool),
    )
    cache_fn = jax.jit(build_density_cache, static_argnames=("cfg",)).lower(
        scene_cfg, params, voxels).compile()
    density_cache = cache_fn(params, voxels)

    def step(params, opt_state, voxels, poses_q, key):
        return map_step(
            scene_cfg, map_cfg, loss_cfg, params, opt_state, voxels,
            optimizer, poses_q, refs,
            store_rgb, store_depth, store_normal, store_gt, store_mask,
            key, density_cache, stage=a.stage, color_stage=a.color_stage,
            ba=a.ba, is_first_frame=False, use_flow=True)

    key = jax.random.PRNGKey(0)
    print(f"[profile] compiling... t={time.strftime('%H:%M:%S')}",
          file=sys.stderr, flush=True)
    params, opt_state, voxels, poses_q, terms = step(
        params, opt_state, voxels, poses_q, key)
    print(f"[profile] warm, loss={float(terms['loss']):.4f}",
          file=sys.stderr, flush=True)

    trace_dir = "/tmp/nicer_profile"
    with jax.profiler.trace(trace_dir):
        for i in range(a.steps):
            params, opt_state, voxels, poses_q, terms = step(
                params, opt_state, voxels, poses_q, jax.random.fold_in(key, i))
        float(terms["loss"])
    t0 = time.perf_counter()
    for i in range(3):
        params, opt_state, voxels, poses_q, terms = step(
            params, opt_state, voxels, poses_q, jax.random.fold_in(key, 7 + i))
    float(terms["loss"])
    dt = (time.perf_counter() - t0) / 3
    print(f"steady-state: {dt*1e3:.1f} ms/iter = {R/dt:.0f} rays/s")
    parse_trace(trace_dir, a.top)


if __name__ == "__main__":
    main()
