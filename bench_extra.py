"""Extra benchmarks for optimization work (guide §1.4): per-query noop-sink
isolation with repeats, and formatted-plan capture.

Does NOT replace bench.py (which is frozen for driver measurement) — this is
the measure-first harness: same session config, same SF dir, same noop sink,
but N repeats per query so plan changes are distinguishable from host noise,
plus `.explain("formatted")` dumps for the plans/r06 evidence.

Usage:
  python bench_extra.py time [repeats] [query ...]   # per-query seconds
  python bench_extra.py plans <outdir> [query ...]   # dump formatted plans
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "flagship_frontier_pop", "q1_pricing_summary", "q3_top_revenue",
    "host_decay_priority", "anti_join_dedup", "dedup_exact_fp",
    "minhash_lsh_pairs", "simhash_near_pairs", "token_jaccard",
    "lang_id", "quality_score", "embedding_cosine_topk", "ann_lsh_topk",
    "multimodal_pipeline", "ngram_span_dedup",
]


def _load():
    import importlib.util

    from supercrawler_spark.session import get_spark
    spec = importlib.util.spec_from_file_location(
        "entrymod", os.path.join(REPO, "__spark_entry__.py"))
    entrymod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entrymod)
    spark = get_spark("bench_extra", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    # same untimed warmup as bench.py
    (spark.read.parquet(f"{SF_DIR}/events.parquet").limit(10_000)
     .write.format("noop").mode("overwrite").save())
    return spark, entrymod.queries()


def cmd_time(repeats: int, names: list[str]):
    spark, queries = _load()
    out: dict[str, dict] = {}
    for name in names:
        samples = []
        for _ in range(repeats):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = queries[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        srt = sorted(samples)
        out[name] = {"min": srt[0], "med": srt[len(srt) // 2],
                     "samples": samples}
        print(f"{name}: min={srt[0]} med={srt[len(srt) // 2]} {samples}",
              flush=True)
    print(json.dumps(out))
    spark.stop()


def cmd_plans(outdir: str, names: list[str], suffix: str):
    spark, queries = _load()
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = queries[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)", flush=True)
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    if mode == "time":
        reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
        names = sys.argv[3:] or HEADLINE
        cmd_time(reps, names)
    elif mode == "plans":
        outdir = sys.argv[2]
        suffix = os.environ.get("SC_PLAN_SUFFIX", "before")
        names = sys.argv[3:] or HEADLINE
        cmd_plans(outdir, names, suffix)
    else:
        raise SystemExit(f"unknown mode {mode}")
