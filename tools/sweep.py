"""Scene-parallel sweep runner: one SLAM scene per local device.

SURVEY.md §2.3(b) / BASELINE.json "stretch": batch N scenes (e.g. the full
Replica suite) across the chips of a TPU slice. Scene runs are completely
independent — no collectives — so the TPU-native expression is simply one
SLAMRunner per device: each runner's jitted track/map steps are placed on
its own chip via ``jax.default_device`` (thread-local in JAX), and the
Python orchestration shells run in threads (their device work is dispatched
asynchronously, so chips execute concurrently while the host threads
interleave I/O and keyframe bookkeeping).

Usage:
  python tools/sweep.py --conf confs/replica/runconf_replica_1.conf \
                        --conf confs/replica/runconf_replica_2.conf \
                        [--exps_folder exps_sweep] [--max_devices N]

Library use (tests): ``sweep([conf_a, conf_b], root_dir=...)``.
"""

from __future__ import annotations

import argparse
import os
import sys
import threading
import time
import traceback
from typing import List, Optional, Sequence

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _run_one(conf: str, device, root_dir: str, exps_folder: str,
             scan_id: Optional[int], result: dict, quiet: bool):
    import jax

    from nicer_slam_tpu.slam.runner import SLAMRunner

    t0 = time.time()
    try:
        with jax.default_device(device):
            kwargs = {}
            if scan_id is not None:
                kwargs["scan_id"] = scan_id
            r = SLAMRunner(conf=conf, root_dir=root_dir,
                           exps_folder_name=exps_folder, quiet=quiet, **kwargs)
            result["run_dir"] = r.rundir
            r.run()
        result["ok"] = True
    except Exception:
        result["ok"] = False
        result["error"] = traceback.format_exc()
    result["wall_s"] = time.time() - t0
    result["device"] = str(device)


def sweep(confs: Sequence[str], root_dir: str = ".",
          exps_folder: str = "exps", scan_ids: Optional[Sequence[int]] = None,
          max_devices: Optional[int] = None, quiet: bool = True,
          scenes_per_device: int = 1) -> List[dict]:
    """Run each conf on its own local device, concurrently.

    More confs than devices are processed in waves (round-robin). Returns a
    result dict per conf: {ok, run_dir, wall_s, device, error?}.

    ``scenes_per_device > 1`` time-shares a chip between several scenes:
    a single SLAM scene's steps are partly latency-bound (tracking is
    1024-ray work), so two interleaved scenes on one chip recover real
    aggregate throughput — the single-chip expression of the
    scene-parallel scaling mode.
    """
    import jax

    devices = jax.local_devices()
    if max_devices is not None:
        devices = devices[:max_devices]
    n_dev = max(1, len(devices))
    if scan_ids is None:
        scan_ids = [None] * len(confs)

    results: List[dict] = [dict() for _ in confs]
    wave_width = n_dev * max(1, scenes_per_device)
    for wave_start in range(0, len(confs), wave_width):
        wave = list(range(wave_start,
                          min(wave_start + wave_width, len(confs))))
        threads = []
        for k, i in enumerate(wave):
            th = threading.Thread(
                target=_run_one,
                args=(confs[i], devices[k % n_dev], root_dir, exps_folder,
                      scan_ids[i], results[i], quiet),
                name=f"sweep-{i}")
            th.start()
            threads.append(th)
        for th in threads:
            th.join()
    return results


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--conf", action="append", required=True,
                   help="conf file (repeat for each scene)")
    p.add_argument("--scan_id", action="append", type=int, default=None,
                   help="optional scan_id override per conf (repeat)")
    p.add_argument("--exps_folder", default="exps_sweep")
    p.add_argument("--root_dir", default=".")
    p.add_argument("--max_devices", type=int, default=None)
    p.add_argument("--scenes_per_device", type=int, default=1,
                   help="time-share each chip between N concurrent scenes "
                        "(single-chip scene-parallel mode)")
    p.add_argument("--verbose", action="store_true")
    a = p.parse_args(argv)

    scan_ids = a.scan_id
    if scan_ids is not None and len(scan_ids) != len(a.conf):
        p.error("--scan_id must be given once per --conf (or not at all)")

    t0 = time.time()
    results = sweep(a.conf, root_dir=a.root_dir, exps_folder=a.exps_folder,
                    scan_ids=scan_ids, max_devices=a.max_devices,
                    quiet=not a.verbose,
                    scenes_per_device=a.scenes_per_device)
    wall = time.time() - t0
    ok = sum(1 for r in results if r.get("ok"))
    for conf, r in zip(a.conf, results):
        status = "ok" if r.get("ok") else "FAILED"
        print(f"[sweep] {status:6s} {conf} on {r.get('device')} "
              f"({r.get('wall_s', 0):.1f}s) -> {r.get('run_dir')}")
        if not r.get("ok") and r.get("error"):
            print(r["error"], file=sys.stderr)
    print(f"[sweep] {ok}/{len(results)} scenes completed, "
          f"wall {wall:.1f}s on {min(len(results), len(__import__('jax').local_devices()))} devices")
    return 0 if ok == len(results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
