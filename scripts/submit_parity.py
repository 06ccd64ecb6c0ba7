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

Invoked by scripts/cluster_parity.py; do not run directly unless a
SparkSession master is provided via spark-submit.
"""

import json
import tempfile

from pyspark.sql import SparkSession


def run_mode(spark, order_mode: str) -> dict:
    # imports AFTER the session exists — the package arrives via --py-files
    from supercrawler_spark import fixtures
    from supercrawler_spark.crawler import CrawlConfig, SparkCrawler
    from supercrawler_spark.oracle import (OracleConfig, OracleCrawler,
                                           web_pages_dict)

    seeds, web, _images = fixtures.make_web_fixture(n_hosts=3, pages_per_host=4)
    web_df = spark.createDataFrame(web)
    cr = SparkCrawler(spark, web_df, tempfile.mkdtemp(),
                      CrawlConfig(budget=8, order_mode=order_mode))
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


def main():
    spark = (SparkSession.builder.appName("submit-parity")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    master = spark.sparkContext.master
    modes = {m: run_mode(spark, m) for m in ("random", "fifo")}
    out = {
        "master": master,
        "n_executors": len([e for e in
                            spark.sparkContext._jsc.sc().statusTracker()
                            .getExecutorInfos()]) - 1,  # minus driver
        "modes": modes,
        "all_match": all(r["order_match"] and r["seen_match"]
                         for r in modes.values()),
    }
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
