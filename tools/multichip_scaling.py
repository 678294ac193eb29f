"""Measure (not just dryrun) multi-chip ray-parallel scaling of map_step on
the virtual CPU mesh (VERDICT r3 item 7; SURVEY §2.3).

Real multi-chip TPU hardware is unavailable in this environment, so
absolute times are XLA:CPU numbers — what transfers is the RELATIVE
overhead decomposition, which is hardware-agnostic in structure:

  t(n, R) = compute(R / n) + psum(params) + fixed

The parameter psum is the ONLY collective the math requires (grid grads
all-reduced across ray shards; SURVEY §2.3), and its payload is constant
in n and R — so scaling efficiency on real ICI is bounded by
psum_bytes / ICI_bw vs compute(R/n). This tool measures t(1, R) vs
t(n, R) and t(n, n*R) (weak scaling) on the same host, reports the
fixed-overhead fraction, and projects v5e-8: compute time from the
measured single-TPU map-iter ms (BENCH stderr), psum time from the
gradient payload at 45 GB/s/link ICI.

Run (CPU mesh):
  JAX_PLATFORMS=cpu XLA_FLAGS="--xla_force_host_platform_device_count=8 \
      --xla_cpu_collective_call_terminate_timeout_seconds=900" \
      python tools/multichip_scaling.py [--devices 8] [--rays 256]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--rays", type=int, default=256,
                    help="rays per device (weak scaling unit)")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--out", default="/tmp/multichip_scaling.json")
    a = ap.parse_args()

    sys.path.insert(0, "/root/repo")
    os.environ.setdefault("NICER_EQUIV_DEVICES", str(a.devices))

    import jax

    if "cpu" not in os.environ.get("JAX_PLATFORMS", ""):
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={a.devices}"
                " --xla_cpu_collective_call_terminate_timeout_seconds=900"
            ).strip()
        jax.config.update("jax_platforms", "cpu")
    import socket, hashlib
    mk = hashlib.md5(socket.gethostname().encode()).hexdigest()[:8]
    jax.config.update("jax_compilation_cache_dir", f"/tmp/nicer_cpu_cache_{mk}")

    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship_setup
    from nicer_slam_tpu.models.losses import loss_config_from_conf
    from nicer_slam_tpu.parallel.mesh import make_mesh, ray_sharding
    from nicer_slam_tpu.slam.mapping import MapBatchRefs, MapConfig, map_step
    from nicer_slam_tpu.slam.state import OptimConfig, make_optimizer
    from nicer_slam_tpu.utils.camera import tensor_from_camera_np

    conf, scene_cfg, params, voxels = _flagship_setup(tiny=True, n_images=8)
    loss_cfg = loss_config_from_conf(conf.get_config("loss"))
    optimizer = make_optimizer(OptimConfig(learning_rate=2e-3), params)
    opt_state0 = optimizer.init(params)

    H, W = scene_cfg.H, scene_cfg.W
    HW = H * W
    Smax, Emax = 8, 4
    rng = np.random.default_rng(0)
    store_rgb = jnp.asarray(rng.integers(0, 255, (Smax, HW, 3), np.uint8))
    store_depth = jnp.asarray(rng.uniform(0.1, 1, (Smax, HW)).astype(np.float16))
    store_normal = jnp.asarray(rng.normal(size=(Smax, HW, 3)).astype(np.float16))
    store_gt_depth = jnp.asarray(rng.uniform(0.1, 1, (Smax, HW)).astype(np.float16))
    store_mask = jnp.ones((Smax, HW), bool)
    poses_q = np.zeros((Smax, 7), np.float32)
    for s in range(Smax):
        pose = np.eye(4, dtype=np.float32)
        pose[2, 3] = -0.3 + 0.01 * s
        poses_q[s] = tensor_from_camera_np(pose)
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = 35.0
    K[0, 2], K[1, 2] = W / 2, H / 2
    refs = MapBatchRefs(
        slot_rows=jnp.arange(Smax, dtype=jnp.int32),
        frame_ids=jnp.arange(Smax, dtype=jnp.int32),
        n_valid=jnp.asarray(Smax, jnp.int32),
        intrinsics=jnp.tile(jnp.asarray(K)[None], (Smax, 1, 1)),
        edge_idii=jnp.asarray([0, 1, 2, 3], jnp.int32),
        edge_idjj=jnp.asarray([1, 2, 3, 0], jnp.int32),
        edge_valid=jnp.ones((Emax,), bool),
        flow_imgs=jnp.zeros((Emax, HW, 2), jnp.float16),
        flow_occ=jnp.ones((Emax, HW), bool),
        slot_conf=jnp.ones((Smax,), jnp.float32),
    )
    key = jax.random.PRNGKey(0)

    def run_config(n_dev, R, iters):
        mesh = make_mesh(n_dev) if n_dev > 1 else None
        shard = ray_sharding(mesh) if mesh is not None else None
        map_cfg = MapConfig(num_pixels=R, max_slots=Smax, max_edges=Emax)

        def step():
            p = jax.tree.map(jnp.copy, params)
            o = jax.tree.map(jnp.copy, opt_state0)
            v = jnp.copy(voxels)
            return map_step(
                scene_cfg, map_cfg, loss_cfg, p, o, v, optimizer,
                jnp.asarray(poses_q), refs,
                store_rgb, store_depth, store_normal, store_gt_depth,
                store_mask, key, stage="fine", color_stage="highfreq",
                ba=True, is_first_frame=False, use_flow=True,
                shard_rays=shard)

        ctx = mesh if mesh is not None else _null()
        with ctx:
            out = step()          # compile + warm
            jax.block_until_ready(out[:4])
            t0 = time.perf_counter()
            for _ in range(iters):
                out = step()
            jax.block_until_ready(out[:4])
            loss = float(out[4]["loss"])
        dt = (time.perf_counter() - t0) / iters * 1000
        return dt, loss

    class _null:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    n = a.devices
    R = a.rays
    res = {}
    for label, nd, rays in [("1dev_R", 1, R), (f"{n}dev_R", n, R),
                            ("1dev_nR", 1, n * R), (f"{n}dev_nR", n, n * R)]:
        dt, loss = run_config(nd, rays, a.iters)
        res[label] = {"ms_per_iter": round(dt, 1), "rays": rays,
                      "devices": nd, "loss": round(loss, 4)}
        print(f"[scaling] {label}: {dt:.1f} ms/iter ({rays} rays, "
              f"{nd} dev) loss={loss:.4f}", flush=True)

    # decomposition: strong-scaling efficiency and fixed overhead
    t1R = res["1dev_R"]["ms_per_iter"]
    tnR = res[f"{n}dev_R"]["ms_per_iter"]
    t1nR = res["1dev_nR"]["ms_per_iter"]
    tnnR = res[f"{n}dev_nR"]["ms_per_iter"]
    res["weak_scaling_efficiency"] = round(t1R / tnnR, 3)
    res["strong_scaling_vs_serial"] = round(t1nR / tnnR, 3)
    res["sharded_overhead_ms_small"] = round(tnR - t1R, 1)

    # psum payload: every differentiable param gradient is all-reduced
    # once per step. Quote it at FLAGSHIP scale (this run uses shrunken
    # tiny grids): grid tables dominate (MLPs are ~100 KB).
    import nicer_slam_tpu.models.scene_model as sm
    flag_conf, flag_cfg, _, _ = (conf, scene_cfg, None, None)
    full_conf = __import__("nicer_slam_tpu.config", fromlist=["config"])         .parse_file("/root/repo/confs/replica/runconf_replica_2.conf")
    full_cfg = sm.scene_config_from_conf(
        full_conf.get_config("model"),
        tuple(full_conf.get_list("dataset.img_res")), 64)
    grid_entries = (
        full_cfg.combine.coarse.hash_spec().total_entries
        * full_cfg.combine.coarse.level_dim
        + full_cfg.combine.fine.hash_spec().total_entries
        * full_cfg.combine.fine.level_dim
        + (full_cfg.render.hash_spec().total_entries
           * 2 if full_cfg.render.use_grid_feature else 0))
    psum_mb = grid_entries * 4 / 1e6
    # ring all-reduce moves 2*(n-1)/n * payload per link; v5e ICI ~45 GB/s
    proj_psum_ms = 2 * (n - 1) / n * psum_mb / 45e3 * 1e3
    res["flagship_psum_payload_mb"] = round(psum_mb, 1)
    res["projected_v5e8_psum_ms"] = round(proj_psum_ms, 2)
    n_params_tiny = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    res["tiny_run_params_mb"] = round(n_params_tiny * 4 / 1e6, 1)
    print(json.dumps(res, indent=2), flush=True)
    with open(a.out, "w") as f:
        json.dump(res, f, indent=2)


if __name__ == "__main__":
    main()
