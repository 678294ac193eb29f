"""Prior-fidelity ablation: how much do the RGB-only cue/flow stand-ins
degrade SLAM quality vs exact (GT-derived) cues?

The reference runs learned priors on real images — Omnidata DPT for mono
depth/normal (reference preprocess/extract_monocular_cues.py:55-112) and
GMFlow for optical flow (reference preprocess/extract_flows.py:16-165).
Our offline build ships RGB-only stand-ins (models/mono_prior.py UNet,
pyramidal Horn-Schunck). This tool quantifies the gap on the synthetic
probe, where exact cues exist, by running the identical SLAM budget on
cue variants of the SAME scene:

  gt       exact cues (affine-of-true depth, true normals, true flow)
  unet     mono depth/normal replaced by the self-trained RGB-only UNet
  hs       flow replaced by pyramidal Horn-Schunck (RGB-only)
  rgbonly  unet + hs together — the full no-GT-at-preprocess stack

Usage:
  python tools/ablate_priors.py [--frames 21 --iters 50 ...probe args...]
      [--variants gt,unet,hs,rgbonly] [--mono_ckpt mono_prior.npz]
      [--out /tmp/ablate_priors.json]

Trains mono_prior.npz first (tools/train_mono_prior.py defaults) if the
checkpoint is absent and a unet/rgbonly variant is requested.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from convergence_probe import build_argparser, run_probe  # noqa: E402


def _prepare_variant(base_dir: str, work: str, name: str, scan_id: int,
                     mono_ckpt: str) -> str:
    """Copy the GT-cue scan and overwrite the requested cue family."""
    vdir = os.path.join(work, name)
    shutil.copytree(base_dir, vdir)
    scan = os.path.join(vdir, f"scan{scan_id}")
    pair = os.path.join(vdir, f"scan{scan_id}_pair")
    if name in ("unet", "rgbonly"):
        from nicer_slam_tpu.preprocess.extract_monocular_cues import (
            extract_cues)

        extract_cues(scan, scan, mono_prior_ckpt=mono_ckpt)
    if name in ("hs", "rgbonly"):
        from nicer_slam_tpu.preprocess.extract_flows import extract_flows

        if os.path.isdir(pair):
            shutil.rmtree(pair)
        extract_flows(scan, pair, rgb_only=True)
    return vdir


def main():
    p = build_argparser()
    p.add_argument("--variants", default="gt,unet,hs,rgbonly")
    p.add_argument("--mono_ckpt", default=None)
    p.add_argument("--out", default="/tmp/ablate_priors.json")
    args = p.parse_args()
    args.frames = max(args.frames, 21)   # flow edges need >10 frames

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    mono_ckpt = args.mono_ckpt or os.path.join(repo, "mono_prior.npz")
    variants = args.variants.split(",")
    needs_unet = any(v in ("unet", "rgbonly") for v in variants)
    if needs_unet and not os.path.exists(mono_ckpt):
        print(f"[ablate] training mono prior -> {mono_ckpt}", flush=True)
        subprocess.run(
            [sys.executable, os.path.join(repo, "tools/train_mono_prior.py"),
             "--out", mono_ckpt], check=True)

    from nicer_slam_tpu.datasets.synthetic import generate

    work = tempfile.mkdtemp(prefix="ablate_priors_")
    base = os.path.join(work, "gt")
    generate(base, scan_id=1, n_frames=args.frames, H=args.H, W=args.W,
             world_scale=3.0, with_flow=True,
             rad_per_frame=args.rad_per_frame)

    results = {}
    for name in variants:
        vdir = (base if name == "gt" else
                _prepare_variant(base, work, name, 1, mono_ckpt))
        print(f"[ablate] === variant {name} ({vdir}) ===", flush=True)
        _, metrics = run_probe(args, data_dir=vdir)
        results[name] = metrics
        print(f"[ablate] {name}: {metrics}", flush=True)
        # bank each variant as it lands (atomic): a session-boundary kill
        # mid-sweep must not lose the completed variants' numbers.
        with open(args.out + ".tmp", "w") as f:
            json.dump(results, f, indent=2)
        os.replace(args.out + ".tmp", args.out)
    print(f"\n[ablate] table (budget: {args.frames} frames, "
          f"{args.iters}/{args.track_iters} iters, {args.rays} rays):")
    print(f"{'variant':10s} {'ATE':>8s} {'PSNR':>7s} {'depthMAE':>9s}")
    for name, m in results.items():
        print(f"{name:10s} {m['ate']:8.4f} {m['psnr']:7.2f} "
              f"{m['depth_mae']:9.4f}")


if __name__ == "__main__":
    main()
