"""Produce pretrain.npz — the fine-SDF-MLP geometric prior.

The reference hard-loads ``pretrain.pth`` (fine-level MLP weights, keys
matching "fine"&!"encoding", volsdf_train.py:140-147) but does not ship it
or its training recipe. This tool reproduces its effect: the fine decoder
is trained — with its hash grid — to represent room-like SDFs, so that at
SLAM time the frozen decoder maps hash features to meaningful SDF residuals.

Recipe: direct SDF regression on procedurally generated room scenes
(random box rooms with sphere/box furniture): sample points in [-1,1]^3,
supervise combine(coarse+fine) against the analytic SDF + eikonal term,
training ALL parameters; export only the fine MLP.

Usage: python tools/pretrain.py --out pretrain.npz [--steps 2000]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def random_scene_sdf(rng, n_obj=6):
    """Returns a closure: [N,3] -> free-space-positive SDF of a random room."""
    import numpy as np

    room_r = rng.uniform(0.75, 0.92)
    objs = []
    for _ in range(int(rng.integers(2, n_obj + 1))):
        c = rng.uniform(-0.55, 0.55, 3)
        r = rng.uniform(0.08, 0.3)
        kind = rng.integers(0, 2)
        objs.append((kind, c, r))

    def sdf(x):
        d = room_r - np.abs(x).max(axis=-1)
        for kind, c, r in objs:
            if kind == 0:
                od = np.linalg.norm(x - c, axis=-1) - r
            else:
                od = (np.abs(x - c) - r).max(axis=-1)
            d = np.minimum(d, od)
        return d

    return sdf


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=str, default="pretrain.npz")
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batch", type=int, default=32768)
    p.add_argument("--lr", type=float, default=2e-3)
    p.add_argument("--conf", type=str,
                   default=os.path.join(os.path.dirname(os.path.dirname(
                       os.path.abspath(__file__))), "confs", "replica",
                       "runconf_replica_2.conf"))
    p.add_argument("--cpu", action="store_true")
    a = p.parse_args(argv)

    import jax

    if a.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/nicer_slam_tpu_jax_cache")

    import jax.numpy as jnp
    import numpy as np
    import optax

    from nicer_slam_tpu import config as cm
    from nicer_slam_tpu.models import fields

    conf = cm.parse_file(a.conf)
    fvs = conf.get_int("model.feature_vector_size")
    combine_cfg = fields.combine_config_from_conf(
        conf.get_config("model.implicit_network"), fvs)

    rng = np.random.default_rng(0)
    params = fields.init_combine(rng, combine_cfg)

    opt = optax.adam(a.lr, b1=0.9, b2=0.99, eps=1e-15)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, pts, target):
        def loss_fn(p):
            sdf, feat, grad = fields.combine_get_outputs(
                combine_cfg, p, pts, "fine")
            data = jnp.abs(sdf[:, 0] - target).mean()
            eik = ((jnp.linalg.norm(grad, axis=-1) - 1.0) ** 2).mean()
            return data + 0.05 * eik, (data, eik)

        (loss, (data, eik)), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(g, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, data, eik

    t0 = time.time()
    scene = random_scene_sdf(rng)
    for i in range(a.steps):
        if i % 200 == 0:
            scene = random_scene_sdf(rng)  # rotate scenes
        pts = rng.uniform(-1, 1, (a.batch, 3)).astype(np.float32)
        target = scene(pts).astype(np.float32)
        params, opt_state, loss, data, eik = step(
            params, opt_state, jnp.asarray(pts), jnp.asarray(target))
        if i % 100 == 0:
            print(f"step {i}: loss {float(loss):.4f} sdf-l1 {float(data):.4f}"
                  f" eik {float(eik):.4f} ({time.time() - t0:.0f}s)",
                  flush=True)

    out = {}
    for i, lp in enumerate(params["fine"]["lins"]):
        for k, v in lp.items():
            out[f"fine_lin{i}_{k}"] = np.asarray(v)
    np.savez(a.out, **out)
    print(f"wrote {a.out} ({len(out)} arrays)")


if __name__ == "__main__":
    main()
