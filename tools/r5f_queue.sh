#!/bin/bash
# Round-5 session-4 queue, part 2 (supersedes r5e_queue stages 2-6 after the
# trust A/B verdict: the clamp works — keyframe midpoint deviations 0.1475 ->
# 0.0095 — but ATE@100 is unchanged, so BA drag is a SYMPTOM of whole-gauge
# diffusion, not the cause. The definitive run therefore ships every
# safety rail (trust region keeps keyframes sane for the map/mesh; the
# camera-free-space guard blocks the fog/light-field collapse that killed
# both prior long runs) on top of the spring+anneal tracker, with map-health
# interims recording any death frame.)
#
#   WAIT_PID=<stage1 pid> nohup bash tools/r5f_queue.sh >> /tmp/r5f_queue.log 2>&1 & disown
set -u
OUTDIR=${OUTDIR:-/root/repo}
WAIT_PID=${WAIT_PID:-}
DATA_DIR=${DATA_DIR:-/tmp/long_seq_xq4z53eo/Synthetic}
ANNEAL300=${ANNEAL300:-/tmp/long_seq_xq4z53eo/exps/probe_1/2026_08_19_08_33_54probe}
SKIP=${SKIP:-}
cd "$(dirname "$0")/.."

note() { echo "[r5f_queue $(date +%H:%M:%S)] $*"; }
want() { case ",$SKIP," in *",$1,"*) return 1;; *) return 0;; esac; }

if [ -n "$WAIT_PID" ]; then
  note "waiting for pid $WAIT_PID to release the chip..."
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi
note "chip free; starting"

if want probe; then
  note "stage 2: ba_grad_probe (dragged + reset poses, frame 195)"
  timeout 3600 python tools/ba_grad_probe.py --rundir "$ANNEAL300" \
    --frame 195 --seeds 6 --out "$OUTDIR/BA_GRAD_PROBE_r05.json"
  note "probe rc=$?"
  timeout 3600 python tools/ba_grad_probe.py --rundir "$ANNEAL300" \
    --frame 195 --seeds 6 --reset_kf \
    --out "$OUTDIR/BA_GRAD_PROBE_RESET_r05.json"
  note "probe(reset) rc=$?"
fi

if want longseq; then
  note "stage 3: definitive guarded 500-frame run"
  timeout 21600 python tools/long_seq_eval.py \
    --frames 500 --rad_per_frame 0.003 --data_dir "$DATA_DIR" \
    --iters 60 --track_iters 100 --rays 4096 --track_rays 1024 \
    --lr 0.002 --track_lr 0.005 --track_lr_step 12 --track_lr_gamma 0.5 \
    --motion_prior_spring 0.1 \
    --ba_trust_radius 0.01 --ba_trust_rot 1.0 \
    --cam_freespace_w 10.0 --cam_freespace_margin 0.05 \
    --ba --mef 5 --color_topk 16 --checkpoint_freq 50 --interim_every 50 \
    --out "$OUTDIR/LONG_SEQ_GUARDED_r05.json"
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
  note "stage 5: color_topk=0 quality bound (150 frames, config matches the
stage-1 A/B minus topk so TRUST_AB_r05.json is the control)"
  timeout 14400 python tools/long_seq_eval.py \
    --frames 150 --rad_per_frame 0.003 --data_dir "$DATA_DIR" \
    --iters 60 --track_iters 100 --rays 4096 --track_rays 1024 \
    --lr 0.002 --track_lr 0.005 --track_lr_step 12 --track_lr_gamma 0.5 \
    --motion_prior_spring 0.1 \
    --ba_trust_radius 0.01 --ba_trust_rot 1.0 \
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
