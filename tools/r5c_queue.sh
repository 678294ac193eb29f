#!/bin/bash
# Round-5 session-3 serial TPU queue (1 chip, 1 host CPU — jobs must not
# overlap). Stage 3: the definitive 500-frame slow-motion quality run with
# the tracking-noise-floor lever chosen from TRACK_NOISE_ROT_r05.json,
# then the probe-independent leftovers (flow-live prior ablation, topk0
# quality bound).
#
# Tracking knobs come from env so the launcher is written before the probe
# finishes and parameterized after reading it:
#   WAIT_PID=<probe pid> SPRING=0.1 MPW=0 MPRW=0 ROTLR=1.0 \
#     DATA_DIR=/tmp/long_seq_xq4z53eo/Synthetic \
#     nohup bash tools/r5c_queue.sh >> /tmp/r5c_queue.log 2>&1 & disown
set -u
OUTDIR=${OUTDIR:-/root/repo}
WAIT_PID=${WAIT_PID:-}
SPRING=${SPRING:-0.0}
MPW=${MPW:-0.0}
MPRW=${MPRW:-0.0}
ROTLR=${ROTLR:-1.0}
FRAMES=${FRAMES:-500}
# reuse the r4 baseline/fix dataset for exact data comparability
DATA_DIR=${DATA_DIR:-/tmp/long_seq_xq4z53eo/Synthetic}
SKIP=${SKIP:-}
cd "$(dirname "$0")/.."

note() { echo "[r5c_queue $(date +%H:%M:%S)] $*"; }
want() { case ",$SKIP," in *",$1,"*) return 1;; *) return 0;; esac; }

if [ -n "$WAIT_PID" ]; then
  note "waiting for pid $WAIT_PID to release the chip..."
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi
note "chip free; starting"

if want longseq; then
  note "definitive ${FRAMES}-frame run: spring=$SPRING mpw=$MPW mprw=$MPRW rotlr=$ROTLR"
  timeout 21600 python tools/long_seq_eval.py \
    --frames "$FRAMES" --rad_per_frame 0.003 \
    --data_dir "$DATA_DIR" \
    --iters 60 --track_iters 100 --rays 4096 --track_rays 1024 \
    --lr 0.002 --track_lr 0.005 --track_lr_step 12 --track_lr_gamma 0.5 \
    --rot_lr_scale "$ROTLR" \
    --motion_prior_spring "$SPRING" \
    --motion_prior_w "$MPW" --motion_prior_rot_w "$MPRW" \
    --ba --mef 5 --color_topk 16 --checkpoint_freq 50 \
    --interim_every 50 \
    --out "$OUTDIR/LONG_SEQ_FINAL_r05.json"
  note "longseq rc=$?"
fi

if want ablate; then
  note "flow-live prior ablation (gws=12)..."
  timeout 7200 python tools/ablate_priors.py \
    --frames 21 --gws 12 --iters 50 --track_iters 50 \
    --rays 2048 --track_rays 1024 --ba \
    --out "$OUTDIR/ABLATE_PRIORS_GWS_r05.json"
  note "ablate rc=$?"
fi

if want topk0; then
  note "color_topk=0 quality-bound run (150 frames, same data)..."
  timeout 14400 python tools/long_seq_eval.py \
    --frames 150 --rad_per_frame 0.003 \
    --data_dir "$DATA_DIR" \
    --iters 60 --track_iters 100 --rays 4096 --track_rays 1024 \
    --lr 0.002 --track_lr 0.005 --track_lr_step 12 --track_lr_gamma 0.5 \
    --rot_lr_scale "$ROTLR" \
    --motion_prior_spring "$SPRING" \
    --motion_prior_w "$MPW" --motion_prior_rot_w "$MPRW" \
    --ba --mef 5 --color_topk 0 --checkpoint_freq 50 \
    --interim_every 50 \
    --out "$OUTDIR/TOPK0_LONG_r05.json"
  note "topk0 rc=$?"
fi
note "queue done"
