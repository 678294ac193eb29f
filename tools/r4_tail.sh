#!/bin/bash
# Round-4 end-of-run tail: at KILL_EPOCH, stop the long-sequence SLAM loop
# (checkpointed every 50 frames) and run the full eval battery off its
# latest checkpoint into the repo, so the quality table survives the round
# boundary even if the interactive session is gone.
#
# Usage: KILL_EPOCH=<epoch> nohup bash tools/r4_tail.sh & disown
set -u
KILL_EPOCH=${KILL_EPOCH:?set KILL_EPOCH}
LOG=/tmp/r4_tail.log
note() { echo "[r4_tail $(date +%H:%M:%S)] $*" >> "$LOG"; }

note "armed; firing at epoch $KILL_EPOCH ($(date -d @$KILL_EPOCH +%H:%M:%S))"
while [ "$(date +%s)" -lt "$KILL_EPOCH" ]; do
  # if the SLAM loop already exited on its own, fire early
  if [ -f /tmp/long_seq_r4.pid ] && ! kill -0 "$(cat /tmp/long_seq_r4.pid)" 2>/dev/null; then
    note "long_seq exited on its own; firing early"
    break
  fi
  sleep 30
done

if [ -f /tmp/long_seq_r4.pid ] && kill -0 "$(cat /tmp/long_seq_r4.pid)" 2>/dev/null; then
  PID=$(cat /tmp/long_seq_r4.pid)
  note "killing long_seq pid $PID (timeout wrapper + python child)"
  CHILD=$(cat /proc/$PID/task/$PID/children 2>/dev/null || true)
  kill "$PID" 2>/dev/null
  [ -n "${CHILD:-}" ] && kill "$CHILD" 2>/dev/null
  sleep 10
  [ -n "${CHILD:-}" ] && kill -9 "$CHILD" 2>/dev/null
fi

RUNDIR=$(ls -dt /tmp/long_seq_*/exps/probe_1/*/ 2>/dev/null | head -1)
note "rundir=$RUNDIR"
if [ -z "$RUNDIR" ] || [ ! -d "$RUNDIR/checkpoints/PoseParameters" ]; then
  note "no checkpointed rundir found; abort"
  exit 1
fi

cd /root/repo
note "eval_checkpoint start"
timeout 2400 python tools/eval_checkpoint.py --rundir "$RUNDIR" \
  --synthetic_gt_mesh --mesh_res 256 \
  --eval_data_dir /tmp/long_seq_0kkq81kd/Synthetic_eval \
  --out /root/repo/LONG_SEQ_TAIL_r04.json >> "$LOG" 2>&1
note "eval_checkpoint rc=$?"
cp "$LOG" /root/repo/r4_tail.log 2>/dev/null
note "done"
