#!/bin/bash
# Two-cluster-size scaling via spark-submit --py-files on a TRUE
# multi-executor cluster (local-cluster[N,4,8g]: N separate executor
# JVMs). Thin wrapper — protocol, calibration and attempt logging live in
# scripts/cluster_scaling.py (appends BENCH/cluster_scaling_attempts.jsonl).
#
# Usage: scripts/spark_submit_cluster_scaling.sh [N_EXEC] [SCALE] [N_RUNS]
set -euo pipefail
cd "$(dirname "$0")/.."
exec python scripts/cluster_scaling.py "${1:-2}" "${2:-4}" "${3:-3}"
