"""CLI entry point (reference: code/training/exp_runner.py).

Usage:
  python -m nicer_slam_tpu.training.exp_runner --conf confs/replica/runconf_replica_2.conf \
      [--is_continue] [--timestamp latest] [--checkpoint latest] \
      [--scan_id N] [--expname suffix] [--exps_folder exps] [--new_expfolder]
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--conf", type=str,
                        default="./confs/replica/runconf_replica_2.conf")
    parser.add_argument("--expname", type=str, default="")
    parser.add_argument("--exps_folder", type=str, default="exps")
    parser.add_argument("--is_continue", default=False, action="store_true",
                        help="continue from a previous run")
    parser.add_argument("--new_expfolder", default=False, action="store_true",
                        help="create a new run dir when continuing")
    parser.add_argument("--timestamp", default="latest", type=str,
                        help="run timestamp to continue from")
    parser.add_argument("--checkpoint", default="latest", type=str,
                        help="checkpoint name to continue from")
    parser.add_argument("--scan_id", type=int, default=-1,
                        help="overrides the conf's dataset.scan_id")
    parser.add_argument("--root_dir", type=str, default=".",
                        help="where the exps folder lives")
    parser.add_argument("--seed", type=int, default=0)
    opt = parser.parse_args(argv)

    from ..slam.runner import SLAMRunner
    from ..utils.plots import vis_hook

    runner = SLAMRunner(
        conf=opt.conf,
        expname=opt.expname,
        exps_folder_name=opt.exps_folder,
        is_continue=opt.is_continue,
        timestamp=opt.timestamp,
        new_expfolder=opt.new_expfolder,
        checkpoint=opt.checkpoint,
        scan_id=opt.scan_id,
        root_dir=opt.root_dir,
        seed=opt.seed,
    )
    runner.run(vis_hook=vis_hook)


if __name__ == "__main__":
    main()
