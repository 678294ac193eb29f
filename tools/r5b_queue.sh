#!/bin/bash
# Round-5 session-2 serial TPU queue. Stage 1: rotation/motion-prior
# noise-floor probe on the fix run's frame-300 checkpoint. The 500-frame
# run is launched SEPARATELY after reading the probe (its config depends
# on the probe's winner) — this script only runs the jobs whose configs
# are probe-independent.
#
# Usage:
#   [WAIT_PID=<pid>] FIX_ROOT=/tmp/long_seq_xq4z53eo [OUTDIR=/root/repo] \
#     [SKIP=...] nohup bash tools/r5b_queue.sh >> /tmp/r5b_queue.log 2>&1 &
#   disown
set -u
OUTDIR=${OUTDIR:-/root/repo}
WAIT_PID=${WAIT_PID:-}
FIX_ROOT=${FIX_ROOT:?set FIX_ROOT}
SKIP=${SKIP:-}
cd "$(dirname "$0")/.."

note() { echo "[r5b_queue $(date +%H:%M:%S)] $*"; }
want() { case ",$SKIP," in *",$1,"*) return 1;; *) return 0;; esac; }

if [ -n "$WAIT_PID" ]; then
  note "waiting for pid $WAIT_PID to release the chip..."
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi
note "chip free; starting"

if want rotprobe; then
  note "rotation + motion-prior noise-floor probe (frame 300)..."
  timeout 5400 python tools/track_noise_floor.py \
    --conf "$FIX_ROOT/long_seq.conf" --root "$FIX_ROOT" --frame 300 \
    --seeds 4 \
    --variants anneal100_lr005,anneal100_rot025,anneal100_rot01,anneal100_mp300,anneal100_spring01,anneal100_spring03 \
    --out "$OUTDIR/TRACK_NOISE_ROT_r05.json"
  note "rotprobe rc=$?"
fi
note "queue done (launch the 500-frame run next)"
