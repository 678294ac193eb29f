"""Train the RGB-only monocular prior (models/mono_prior.py) on procedural
room scenes with closed-form GT depth/normals.

  python tools/train_mono_prior.py --steps 3000 --n-scenes 60 \
      --frames-per-scene 8 --out mono_prior.npz

Scenes are randomized variants of the synthetic generator's room (sphere
count/centers/radii drawn per scene, same procedural albedo family), so the
prior learns RGB->geometry for this scene family from scratch — no GT depth
is read when the prior is later used for cue extraction. Provenance is
documented in models/mono_prior.py.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        items = tree.items()
    elif isinstance(tree, list):
        items = ((str(i), v) for i, v in enumerate(tree))
    else:
        return {prefix.rstrip("/"): tree}
    for k, v in items:
        out.update(_flatten(v, f"{prefix}{k}/"))
    return out


def render_dataset(n_scenes, frames_per_scene, H, W, seed=0):
    """Randomized procedural scenes -> (rgb [N,H,W,3], depth01 [N,H,W],
    normal_cam [N,H,W,3])."""
    import numpy as np

    from nicer_slam_tpu.datasets import synthetic as syn

    rng = np.random.default_rng(seed)
    rgbs, deps, nrms = [], [], []
    orig = syn.SPHERES
    try:
        for s in range(n_scenes):
            n_sph = rng.integers(2, 6)
            spheres = []
            for _ in range(n_sph):
                c = rng.uniform(-0.55, 0.55, 3)
                r = rng.uniform(0.12, 0.3)
                spheres.append((c, float(r)))
            syn.SPHERES = spheres
            f = 0.9 * W
            K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]])
            start = rng.integers(0, 120)
            poses = syn.camera_trajectory(start + frames_per_scene * 11)
            for i in range(frames_per_scene):
                c2w = poses[start + i * 11]
                rgb, z, n_cam, _ = syn.render_frame(H, W, K, c2w)
                rgbs.append(rgb)
                deps.append(np.clip(z / 2.5, 0, 1).astype(np.float32))
                nrms.append(n_cam)
            if (s + 1) % 10 == 0:
                print(f"rendered {s + 1}/{n_scenes} scenes", flush=True)
    finally:
        syn.SPHERES = orig
    import numpy as np

    return (np.stack(rgbs), np.stack(deps), np.stack(nrms))


def train(steps=3000, n_scenes=60, frames_per_scene=8, H=96, W=128,
          batch=8, lr=3e-4, seed=0, out="mono_prior.npz", platform=None):
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/nicer_slam_tpu_jax_cache")
    import jax.numpy as jnp
    import numpy as np
    import optax

    from nicer_slam_tpu.models.mono_prior import (init_mono_prior,
                                                  mono_prior_forward)

    rgb, dep, nrm = render_dataset(n_scenes, frames_per_scene, H, W, seed)
    N = rgb.shape[0]
    print(f"dataset: {N} frames at {H}x{W}", flush=True)

    params = init_mono_prior(seed)
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    def loss_fn(p, x, d, n):
        pd, pn = mono_prior_forward(p, x)
        l_d = jnp.abs(pd - d).mean()
        l_n = (1.0 - (pn * n).sum(-1)).mean()
        return l_d + 0.5 * l_n, (l_d, l_n)

    @jax.jit
    def step(p, o, x, d, n):
        (l, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(p, x, d, n)
        up, o = opt.update(g, o, p)
        return optax.apply_updates(p, up), o, l, aux

    rng = np.random.default_rng(seed + 1)
    for it in range(steps):
        idx = rng.integers(0, N, batch)
        params, opt_state, l, (ld, ln) = step(
            params, opt_state, jnp.asarray(rgb[idx]), jnp.asarray(dep[idx]),
            jnp.asarray(nrm[idx]))
        if it % 200 == 0 or it == steps - 1:
            print(f"step {it}: loss {float(l):.4f} depth {float(ld):.4f} "
                  f"normal {float(ln):.4f}", flush=True)

    flat = {k: np.asarray(v) for k, v in _flatten(params).items()}
    np.savez(out, **flat)
    size = os.path.getsize(out) / 1e6
    print(f"wrote {out} ({size:.1f} MB)", flush=True)
    return float(l)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--n-scenes", type=int, default=60)
    p.add_argument("--frames-per-scene", type=int, default=8)
    p.add_argument("--H", type=int, default=96)
    p.add_argument("--W", type=int, default=128)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--out", default="mono_prior.npz")
    p.add_argument("--platform", default=None)
    a = p.parse_args(argv)
    train(a.steps, a.n_scenes, a.frames_per_scene, a.H, a.W, a.batch, a.lr,
          out=a.out, platform=a.platform)


if __name__ == "__main__":
    main()
