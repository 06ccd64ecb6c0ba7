#!/bin/bash
# Round-5 session scaling-evidence loop: alternate TRUE-multi-executor
# local-cluster attempts (scripts/cluster_scaling.py -> BENCH/
# cluster_scaling_attempts.jsonl) with calibration-gated local[8]/[32]
# hunt attempts (scripts/scaling_hunt.py -> BENCH/scaling_attempts.jsonl).
# Touch /tmp/pause_hunt to pause between attempts (lets the session run
# tests without poisoning a measurement); rm it to resume.
set -u
cd "$(dirname "$0")/.."
N_ITER="${1:-8}"
for i in $(seq 1 "$N_ITER"); do
  while [ -f /tmp/pause_hunt ]; do sleep 15; done
  while pgrep java >/dev/null; do sleep 30; done
  echo "[loop $i] cluster attempt $(date -u +%H:%M:%S)"
  SC_CYCLE_SCALE=4 python scripts/cluster_scaling.py 2 4 3 2>/dev/null | tail -1
  while [ -f /tmp/pause_hunt ]; do sleep 15; done
  while pgrep java >/dev/null; do sleep 30; done
  echo "[loop $i] local-pair hunt attempt $(date -u +%H:%M:%S)"
  SC_CYCLE_SCALE=4 timeout 900 python scripts/scaling_hunt.py 12 1 2>/dev/null | tail -2
done
echo LOOP_DONE
