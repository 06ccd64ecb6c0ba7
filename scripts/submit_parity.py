"""spark-submit entrypoint for CORRECTNESS-under-cluster evidence.

The north rule's verification clause binds two things together: the
engine must match the reference's crawl ordering and URL-seen set under
the same seed list + politeness budget, AND run via `spark-submit
--py-files` on a multi-executor cluster. The scaling harness
(scripts/submit_scaling.py) evidences the throughput half; THIS payload
evidences the correctness half under the same deployment path: the full
SparkCrawler (not the cycle core) crawls the deterministic fixture web
on a local-cluster master — separate executor JVMs, netty shuffle, real
scheduler — and its crawl order + seen set are compared against the
single-threaded Python oracle (supercrawler_spark.oracle, the reference
simulator) in the driver.

Runs BOTH queue disciplines end-to-end: order_mode="random"
(DbUrlList-style deterministic scatter priority) and "fifo"
(FifoUrlList). Prints one JSON line:
  {"master": ..., "modes": {"random": {"order_match": ..., ...}, ...},
   "all_match": ...}

A second evidence axis — checkpoint/resume ACROSS JVM LIFETIMES — runs
as a two-invocation protocol driven by SC_PARITY_PHASE:
  "resume_first":  seed + crawl 3 cycles (checkpoint_every=1) into
                   SC_PARITY_WORKDIR, then EXIT (driver + executors die).
  "resume_second": a fresh spark-submit resumes from the same workdir's
                   parquet snapshot, crawls to completion, and compares
                   the final frontier state against an UNINTERRUPTED
                   crawl run in the same session (plus oracle order/seen
                   checks on the uninterrupted run). The in-process
                   variant of this is tests/test_crawl_parity.py::
                   test_resume_equals_uninterrupted; this one proves the
                   snapshot store carries everything across process
                   death on the real deployment path.

Invoked by scripts/cluster_parity.py; do not run directly unless a
SparkSession master is provided via spark-submit.
"""

import json
import os
import tempfile

from pyspark.sql import SparkSession

STATE_COLS = ["url", "status_code", "error_code", "num_errors", "seq"]


def run_mode(spark, order_mode: str, use_bloom: bool = False) -> dict:
    # imports AFTER the session exists — the package arrives via --py-files
    from supercrawler_spark import fixtures
    from supercrawler_spark.crawler import CrawlConfig, SparkCrawler
    from supercrawler_spark.oracle import (OracleConfig, OracleCrawler,
                                           web_pages_dict)

    seeds, web, _images = fixtures.make_web_fixture(n_hosts=3, pages_per_host=4)
    web_df = spark.createDataFrame(web)
    cr = SparkCrawler(spark, web_df, tempfile.mkdtemp(),
                      CrawlConfig(budget=8, order_mode=order_mode,
                                  use_bloom=use_bloom,
                                  bloom_partitions=8))
    cr.seed(list(seeds["url"]))
    cr.crawl(max_cycles=100)

    ora = OracleCrawler(web_pages_dict(web),
                        OracleConfig(budget=8, order_mode=order_mode))
    ora.seed(list(seeds["url"]))
    res = ora.crawl(max_rounds=100)
    return {
        "order_match": cr.crawl_order == res.crawl_order,
        "seen_match": cr.seen_urls() == res.seen_urls(),
        "crawled": len(cr.crawl_order),
        "oracle_crawled": len(res.crawl_order),
    }


def _fixture(spark):
    from supercrawler_spark import fixtures
    seeds, web, _images = fixtures.make_web_fixture(n_hosts=3, pages_per_host=4)
    return list(seeds["url"]), web, spark.createDataFrame(web)


def run_resume_first(spark, workdir: str) -> dict:
    from supercrawler_spark.crawler import CrawlConfig, SparkCrawler

    seed_urls, _web, web_df = _fixture(spark)
    cfg = CrawlConfig(budget=8, order_mode="random", checkpoint_every=1)
    cr = SparkCrawler(spark, web_df, workdir, cfg)
    cr.seed(seed_urls)
    cr.crawl(max_cycles=3)
    return {"phase": "resume_first", "crawled_so_far": len(cr.crawl_order)}


def run_resume_second(spark, workdir: str) -> dict:
    from supercrawler_spark.crawler import CrawlConfig, SparkCrawler
    from supercrawler_spark.oracle import (OracleConfig, OracleCrawler,
                                           web_pages_dict)

    seed_urls, web, web_df = _fixture(spark)
    cfg = CrawlConfig(budget=8, order_mode="random", checkpoint_every=1)
    resumed = SparkCrawler(spark, web_df, workdir, cfg)
    found = resumed.resume()
    resumed.crawl(max_cycles=100)

    uninterrupted = SparkCrawler(spark, web_df, tempfile.mkdtemp(), cfg)
    uninterrupted.seed(seed_urls)
    uninterrupted.crawl(max_cycles=100)

    a = resumed.frontier_pdf()[STATE_COLS] \
        .sort_values("url").reset_index(drop=True)
    b = uninterrupted.frontier_pdf()[STATE_COLS] \
        .sort_values("url").reset_index(drop=True)

    ora = OracleCrawler(web_pages_dict(web),
                        OracleConfig(budget=8, order_mode="random"))
    ora.seed(seed_urls)
    res = ora.crawl(max_rounds=100)
    return {
        "phase": "resume_second",
        "snapshot_found": bool(found),
        "final_state_match": bool(a.equals(b)),
        "seen_match": resumed.seen_urls() == uninterrupted.seen_urls(),
        "uninterrupted_order_match":
            uninterrupted.crawl_order == res.crawl_order,
        "uninterrupted_seen_match":
            uninterrupted.seen_urls() == res.seen_urls(),
    }


def main():
    spark = (SparkSession.builder.appName("submit-parity")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    master = spark.sparkContext.master

    def n_exec():
        # probed AFTER the crawl ran: executor registration is lazy, so a
        # probe before the first job can race and read 0
        return len([e for e in spark.sparkContext._jsc.sc().statusTracker()
                    .getExecutorInfos()]) - 1  # minus driver

    phase = os.environ.get("SC_PARITY_PHASE", "parity")
    if phase == "resume_first":
        res = run_resume_first(spark, os.environ["SC_PARITY_WORKDIR"])
        out = {"master": master, **res, "n_executors": n_exec()}
    elif phase == "resume_second":
        res = run_resume_second(spark, os.environ["SC_PARITY_WORKDIR"])
        out = {"master": master, **res, "n_executors": n_exec(),
               "all_match": all(v for k, v in res.items()
                                if k not in ("phase",))}
    else:
        modes = {m: run_mode(spark, m) for m in ("random", "fifo")}
        # scale-path seen set: the distributed pid-keyed Bloom table
        # (cogroup probe) under separate executor JVMs + netty shuffle
        modes["random_bloom"] = run_mode(spark, "random", use_bloom=True)
        out = {
            "master": master,
            "n_executors": n_exec(),
            "modes": modes,
            "all_match": all(r["order_match"] and r["seen_match"]
                             for r in modes.values()),
        }
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
