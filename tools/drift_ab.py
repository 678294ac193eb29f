"""Drift-loop mechanism A/B on the 210-frame fast-motion synthetic
(VERDICT r3 item 2). Baseline for comparison: round-2/3 unweighted run,
ATE 0.3285 at the same budget (BASELINE.md), terr compounding
~0.011/frame.

Mechanism hypothesis (runner.py BA notes): the reference BA camera step is
a fresh-Adam SIGN step of ~BA_cam_lr per iteration, so the per-mapping-call
correction capacity is ~n_ba_iters x BA_cam_lr ~= 0.009 — below the
fast-motion per-window drift accrual (~0.044 at mef=5 x 0.011/frame).
Variants raise capacity (earlier BA + larger lr), propagate corrections to
frames BA never touches (pose graph), and leave map-only iterations after
BA so geometry re-fits the corrected poses.

Usage: python tools/drift_ab.py [--frames 210] [--variants cap,pg,comb]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VARIANTS = {
    "ctrl": [],
    "cap": ["--ba_ratio", "0.3", "--ba_cam_lr", "0.004"],
    "pg": ["--pose_graph"],
    "comb": ["--ba_ratio", "0.3", "--ba_cam_lr", "0.004", "--pose_graph",
             "--ba_end_ratio", "0.9"],
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=210)
    ap.add_argument("--variants", default="cap,pg,comb")
    ap.add_argument("--out", default="/tmp/drift_ab.json")
    ap.add_argument("--logdir", default="/tmp/drift_ab_logs")
    a = ap.parse_args()

    os.makedirs(a.logdir, exist_ok=True)
    work = tempfile.mkdtemp(prefix="drift_ab_")
    data_dir = os.path.join(work, "Synthetic")
    print(f"[drift_ab] generating {a.frames} frames -> {data_dir}",
          flush=True)
    sys.path.insert(0, REPO)
    from nicer_slam_tpu.datasets.synthetic import generate
    generate(data_dir, scan_id=1, n_frames=a.frames, H=120, W=160,
             world_scale=3.0, with_flow=True, rad_per_frame=0.03)

    base_args = ["--frames", str(a.frames), "--iters", "30",
                 "--track_iters", "30", "--rays", "4096",
                 "--track_rays", "1024", "--ba", "--mef", "5",
                 "--data_dir", data_dir]
    results = {}
    for name in a.variants.split(","):
        log = os.path.join(a.logdir, f"{name}.log")
        cmd = [sys.executable, os.path.join(REPO, "tools/convergence_probe.py")] \
            + base_args + VARIANTS[name]
        print(f"[drift_ab] === {name}: {' '.join(cmd)} -> {log}", flush=True)
        with open(log, "w") as f:
            rc = subprocess.run(cmd, stdout=f, stderr=subprocess.STDOUT).returncode
        tail = open(log).read().strip().splitlines()
        res_line = next((ln for ln in reversed(tail)
                         if ln.startswith("RESULT")), None)
        results[name] = {"rc": rc, "result": res_line}
        print(f"[drift_ab] {name}: rc={rc} {res_line}", flush=True)
        with open(a.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
