#!/bin/bash
# Round-4 session-4 fallback: if the interactive session dies, stop the
# annealed-tracking A/B SLAM loop at KILL_EPOCH (checkpointed every 50
# frames), run the eval battery off its latest checkpoint into the repo,
# and commit — so the A/B table survives the round boundary unattended.
#
# Usage: KILL_EPOCH=<epoch> nohup bash tools/r4b_tail.sh & disown
set -u
KILL_EPOCH=${KILL_EPOCH:?set KILL_EPOCH}
LOG=/tmp/r4b_tail.log
note() { echo "[r4b_tail $(date +%H:%M:%S)] $*" >> "$LOG"; }

note "armed; firing at epoch $KILL_EPOCH"
while [ "$(date +%s)" -lt "$KILL_EPOCH" ]; do
  if [ -f /tmp/long_seq_fix.pid ] && ! kill -0 "$(cat /tmp/long_seq_fix.pid)" 2>/dev/null; then
    note "long_seq_fix exited on its own"
    break
  fi
  # disarm file: interactive session took over
  [ -f /tmp/r4b_tail.disarm ] && { note "disarmed"; exit 0; }
  sleep 30
done
[ -f /tmp/r4b_tail.disarm ] && { note "disarmed"; exit 0; }

if [ -f /tmp/long_seq_fix.pid ] && kill -0 "$(cat /tmp/long_seq_fix.pid)" 2>/dev/null; then
  note "killing long_seq_fix"
  kill "$(cat /tmp/long_seq_fix.pid)" 2>/dev/null
  kill "$(cat /tmp/long_seq_fix_child.pid)" 2>/dev/null
  sleep 10
  kill -9 "$(cat /tmp/long_seq_fix_child.pid)" 2>/dev/null
  sleep 5
fi

RUNDIR=$(ls -dt /tmp/long_seq_xq4z53eo/exps/probe_1/*/ 2>/dev/null | head -1)
note "rundir=$RUNDIR"
if [ -n "$RUNDIR" ] && [ -d "$RUNDIR/checkpoints/PoseParameters" ]; then
  cd /root/repo
  timeout 2400 python tools/eval_checkpoint.py --rundir "$RUNDIR" \
    --synthetic_gt_mesh --mesh_res 256 \
    --eval_data_dir /tmp/long_seq_xq4z53eo/Synthetic_eval \
    --out /root/repo/LONG_SEQ_FIX_TAIL_r04.json >> "$LOG" 2>&1
  note "eval_checkpoint rc=$?"
fi
cd /root/repo
git add LONG_SEQ_FIX_r04.json LONG_SEQ_FIX_TAIL_r04.json 2>/dev/null
git commit -q -m "Preserve annealed-tracking A/B long-seq results (round-boundary tail)" 2>>"$LOG"
note "done"
