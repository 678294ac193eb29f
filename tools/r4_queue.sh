#!/bin/bash
# Round-4 serial TPU job queue (single chip + 1-CPU host => strictly serial).
# Fires the moment the long-sequence eval (VERDICT item 1) releases the chip:
#   1. bench ctrl (compile-cache warm from r3)        -> /tmp/bench_r4_ctrl.*
#   2. bench color_topk=16 (VERDICT item 3 attack)    -> /tmp/bench_r4_topk16.*
#   3. color_topk quality A/B, 9-frame probe + grid   -> /tmp/topk_q_{ctrl,16}.log
#   4. drift mechanism A/B (VERDICT item 2)           -> /tmp/drift_ab.json
# Each step is bounded with `timeout` so one hang can't eat the round.
set -u
cd /root/repo
Q=/tmp/r4_queue_status.log
note() { echo "[r4_queue $(date +%H:%M:%S)] $*" | tee -a "$Q"; }

if [ -f /tmp/long_seq_r4.pid ]; then
  note "waiting for long_seq (pid $(cat /tmp/long_seq_r4.pid))..."
  while kill -0 "$(cat /tmp/long_seq_r4.pid)" 2>/dev/null; do sleep 60; done
fi
note "long_seq done; tail: $(tail -1 /tmp/long_seq_r4.log 2>/dev/null)"

note "bench ctrl start"
timeout 1800 python bench.py > /tmp/bench_r4_ctrl.json 2> /tmp/bench_r4_ctrl.log
note "bench ctrl rc=$? -> $(cat /tmp/bench_r4_ctrl.json 2>/dev/null)"

note "bench topk16 start"
NICER_COLOR_TOPK=16 timeout 2400 python bench.py \
  > /tmp/bench_r4_topk16.json 2> /tmp/bench_r4_topk16.log
note "bench topk16 rc=$? -> $(cat /tmp/bench_r4_topk16.json 2>/dev/null)"

PROBE="python tools/convergence_probe.py --frames 9 --iters 60
  --track_iters 60 --rays 4096 --track_rays 1024 --color_grid"
note "topk quality ctrl start"
timeout 2400 $PROBE > /tmp/topk_q_ctrl.log 2>&1
note "topk quality ctrl rc=$? -> $(grep RESULT /tmp/topk_q_ctrl.log | tail -1)"
note "topk quality k=16 start"
timeout 2400 $PROBE --color_topk 16 > /tmp/topk_q_16.log 2>&1
note "topk quality k=16 rc=$? -> $(grep RESULT /tmp/topk_q_16.log | tail -1)"

note "drift_ab start (comb,cap,pg)"
timeout 7200 python tools/drift_ab.py --variants comb,cap,pg \
  --out /tmp/drift_ab.json > /tmp/drift_ab_driver.log 2>&1
note "drift_ab rc=$? -> $(cat /tmp/drift_ab.json 2>/dev/null | tr -d '\n')"
note "queue complete"
