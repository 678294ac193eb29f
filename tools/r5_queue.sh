#!/bin/bash
# Round-5 serial TPU job queue (single chip + 1-CPU host => strictly
# serial). Waits for WAIT_PID (the long-sequence fix run) to exit, then
# runs the round's remaining TPU evidence jobs, each timeout-bounded so one
# hang can't eat the round. All results land in OUTDIR (default the repo,
# which the driver commits at round end). Parameterized via env vars — no
# session-specific paths baked in.
#
# Usage:
#   WAIT_PID=<pid> [OUTDIR=/root/repo] [FIX_ROOT=/tmp/long_seq_xxx] \
#     nohup bash tools/r5_queue.sh >> /tmp/r5_queue.log 2>&1 & disown
set -u
OUTDIR=${OUTDIR:-/root/repo}
WAIT_PID=${WAIT_PID:-}
FIX_ROOT=${FIX_ROOT:-}          # run root of the fix run (for the rot probe)
SKIP=${SKIP:-}                  # comma list of steps to skip
cd "$(dirname "$0")/.."

note() { echo "[r5_queue $(date +%H:%M:%S)] $*"; }
want() { case ",$SKIP," in *",$1,"*) return 1;; *) return 0;; esac; }

if [ -n "$WAIT_PID" ]; then
  note "waiting for pid $WAIT_PID to release the chip..."
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
note "chip free; starting queue"

if want bench; then
  note "bench A/B: ctrl (color_topk=0) ..."
  NICER_COLOR_TOPK=0 BENCH_SLICES=3 timeout 4000 python bench.py \
    > /tmp/bench_r5_ctrl.out 2> /tmp/bench_r5_ctrl.err
  note "bench ctrl rc=$? : $(cat /tmp/bench_r5_ctrl.out 2>/dev/null)"
  note "bench A/B: topk16 (flagship default) ..."
  BENCH_SLICES=3 timeout 4000 python bench.py \
    > /tmp/bench_r5_topk16.out 2> /tmp/bench_r5_topk16.err
  note "bench topk16 rc=$? : $(cat /tmp/bench_r5_topk16.out 2>/dev/null)"
  python - <<'EOF'
import json
out = {}
for name in ("ctrl", "topk16"):
    rec = {}
    try:
        rec["headline"] = json.loads(open(f"/tmp/bench_r5_{name}.out").read().strip())
    except Exception as e:
        rec["error"] = str(e)
    rec["stderr_metrics"] = []
    try:
        for line in open(f"/tmp/bench_r5_{name}.err"):
            line = line.strip()
            if line.startswith("{"):
                rec["stderr_metrics"].append(json.loads(line))
    except Exception:
        pass
    out[name] = rec
with open("/tmp/bench_ab.json", "w") as f:
    json.dump(out, f, indent=2)
EOF
  cp /tmp/bench_ab.json "$OUTDIR/BENCH_AB_r05.json"
  note "bench A/B written to $OUTDIR/BENCH_AB_r05.json"
fi

if want ablate; then
  note "prior-fidelity ablation..."
  timeout 7000 python tools/ablate_priors.py --frames 21 --iters 50 \
    --track_iters 50 --rays 4096 --track_rays 1024 --ba --mef 4 \
    --out "$OUTDIR/ABLATE_PRIORS_r05.json"
  note "ablate rc=$?"
fi

if want rotprobe && [ -n "$FIX_ROOT" ] && [ -f "$FIX_ROOT/long_seq.conf" ]; then
  note "rotation noise-floor probe on the fix-run checkpoint..."
  timeout 3000 python tools/track_noise_floor.py \
    --conf "$FIX_ROOT/long_seq.conf" --root "$FIX_ROOT" --frame 300 \
    --variants anneal100_lr005,anneal100_rot025,anneal100_rot01 \
    --out "$OUTDIR/TRACK_NOISE_ROT_r05.json"
  note "rotprobe rc=$?"
fi

if want onechip; then
  note "single-chip scene-parallel demo..."
  timeout 4000 python tools/sweep_onechip_demo.py --frames 12 --iters 20 \
    --track_iters 20 --rays 2048 --track_rays 512 \
    --out "$OUTDIR/SWEEP_1CHIP_r05.json"
  note "onechip rc=$?"
fi

if want topk0; then
  note "color_topk=0 long-horizon bound (150 frames, annealed schedule)..."
  timeout 12000 python tools/long_seq_eval.py --frames 150 \
    --rad_per_frame 0.003 --iters 60 --track_iters 100 --track_lr 0.005 \
    --track_lr_step 12 --track_lr_gamma 0.5 --rays 4096 --track_rays 1024 \
    --ba --mef 5 --color_grid --color_topk 0 --checkpoint_freq 50 \
    --interim_every 50 --mesh_res 128 \
    ${FIX_ROOT:+--data_dir "$FIX_ROOT/Synthetic"} \
    --out "$OUTDIR/TOPK0_LONG_r05.json"
  note "topk0 rc=$?"
fi

if want driftab; then
  note "fast-motion drift A/B (comb variant)..."
  timeout 10000 python tools/drift_ab.py --variants comb \
    --out "$OUTDIR/DRIFT_AB_r05.json" --logdir /tmp/drift_ab_logs
  note "driftab rc=$?"
fi

note "queue done"
