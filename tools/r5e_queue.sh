#!/bin/bash
# Round-5 session-4 serial TPU queue. Stages:
#   1. trust-region A/B (150 frames, same data/seeds as the spring run —
#      the spring run's own interim curve is the control)
#   2. ba_grad_probe on the anneal@300 checkpoint (drag-term evidence)
#   3. definitive 500-frame run: spring+anneal always; trust radii included
#      only if stage 1 beat the spring control at frame 150
#   4. flow-live prior ablation (gws=12) — VERDICT item 4, third order
#   5. color_topk=0 quality bound (150 frames) — VERDICT item 8
#   6. full pytest suite (CPU) — VERDICT item 9
#
#   WAIT_PID=<pid> DATA_DIR=/tmp/long_seq_xq4z53eo/Synthetic \
#     nohup bash tools/r5e_queue.sh >> /tmp/r5e_queue.log 2>&1 & disown
set -u
OUTDIR=${OUTDIR:-/root/repo}
WAIT_PID=${WAIT_PID:-}
DATA_DIR=${DATA_DIR:-/tmp/long_seq_xq4z53eo/Synthetic}
ANNEAL300=${ANNEAL300:-/tmp/long_seq_xq4z53eo/exps/probe_1/2026_08_19_08_33_54probe}
TRUST_R=${TRUST_R:-0.01}
TRUST_ROT=${TRUST_ROT:-1.0}
SKIP=${SKIP:-}
cd "$(dirname "$0")/.."

note() { echo "[r5e_queue $(date +%H:%M:%S)] $*"; }
want() { case ",$SKIP," in *",$1,"*) return 1;; *) return 0;; esac; }

if [ -n "$WAIT_PID" ]; then
  note "waiting for pid $WAIT_PID to release the chip..."
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi
note "chip free; starting"

if want trustab; then
  note "stage 1: trust A/B (radius $TRUST_R rot $TRUST_ROT, 150 frames)"
  timeout 7200 python tools/long_seq_eval.py \
    --frames 150 --rad_per_frame 0.003 --data_dir "$DATA_DIR" \
    --iters 60 --track_iters 100 --rays 4096 --track_rays 1024 \
    --lr 0.002 --track_lr 0.005 --track_lr_step 12 --track_lr_gamma 0.5 \
    --motion_prior_spring 0.1 \
    --ba_trust_radius "$TRUST_R" --ba_trust_rot "$TRUST_ROT" \
    --ba --mef 5 --color_topk 16 --checkpoint_freq 50 --interim_every 50 \
    --out "$OUTDIR/TRUST_AB_r05.json"
  note "trust A/B rc=$?"
fi

if want probe; then
  note "stage 2: ba_grad_probe (dragged + reset poses)"
  # frame 195: the pre-global regime where the drag accrues (window = all
  # keyframes); the anneal@300 checkpoint's map has seen 300 frames
  timeout 3600 python tools/ba_grad_probe.py --rundir "$ANNEAL300" \
    --frame 195 --seeds 6 --out "$OUTDIR/BA_GRAD_PROBE_r05.json"
  note "probe rc=$?"
  timeout 3600 python tools/ba_grad_probe.py --rundir "$ANNEAL300" \
    --frame 195 --seeds 6 --reset_kf \
    --out "$OUTDIR/BA_GRAD_PROBE_RESET_r05.json"
  note "probe(reset) rc=$?"
fi

if want longseq; then
  # gate: include trust radii only if the A/B beat the spring control
  # (spring run interim @150 = 0.0374, LONG_SEQ_FINAL_r05.json)
  GATE=$(python - <<'EOF'
import json
try:
    ab = json.load(open("TRUST_AB_r05.json"))
    ctrl = json.load(open("LONG_SEQ_FINAL_r05.json"))
    a = [e for e in ab.get("interim", []) if e["frame"] == 150]
    c = [e for e in ctrl.get("interim", []) if e["frame"] == 150]
    print("trust" if a and c and a[0]["ate_rmse"] < c[0]["ate_rmse"] else "plain")
except Exception:
    print("plain")
EOF
)
  if [ "$GATE" = "trust" ]; then R="$TRUST_R"; RD="$TRUST_ROT"; else R=0.0; RD=0.0; fi
  note "stage 3: definitive 500-frame run (gate=$GATE, trust=$R/$RD)"
  timeout 21600 python tools/long_seq_eval.py \
    --frames 500 --rad_per_frame 0.003 --data_dir "$DATA_DIR" \
    --iters 60 --track_iters 100 --rays 4096 --track_rays 1024 \
    --lr 0.002 --track_lr 0.005 --track_lr_step 12 --track_lr_gamma 0.5 \
    --motion_prior_spring 0.1 \
    --ba_trust_radius "$R" --ba_trust_rot "$RD" \
    --ba --mef 5 --color_topk 16 --checkpoint_freq 50 --interim_every 50 \
    --out "$OUTDIR/LONG_SEQ_TRUST_r05.json"
  note "definitive rc=$?"
fi

if want ablate; then
  note "stage 4: flow-live prior ablation (gws=12)"
  timeout 7200 python tools/ablate_priors.py \
    --frames 21 --gws 12 --iters 50 --track_iters 50 \
    --rays 2048 --track_rays 1024 --ba \
    --out "$OUTDIR/ABLATE_PRIORS_GWS_r05.json"
  note "ablate rc=$?"
fi

if want topk0; then
  note "stage 5: color_topk=0 quality bound (150 frames)"
  timeout 14400 python tools/long_seq_eval.py \
    --frames 150 --rad_per_frame 0.003 --data_dir "$DATA_DIR" \
    --iters 60 --track_iters 100 --rays 4096 --track_rays 1024 \
    --lr 0.002 --track_lr 0.005 --track_lr_step 12 --track_lr_gamma 0.5 \
    --motion_prior_spring 0.1 \
    --ba --mef 5 --color_topk 0 --checkpoint_freq 50 --interim_every 50 \
    --out "$OUTDIR/TOPK0_LONG_r05.json"
  note "topk0 rc=$?"
fi

if want pytest; then
  note "stage 6: full pytest suite"
  timeout 7200 python -m pytest tests/ -q > /tmp/pytest_r5s4_full.log 2>&1
  note "pytest rc=$? (log /tmp/pytest_r5s4_full.log)"
  tail -3 /tmp/pytest_r5s4_full.log
fi
note "queue done"
