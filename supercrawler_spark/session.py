"""SparkSession factory with scale-oriented defaults.

Tuned for the crawl workload: AQE on (runtime coalescing + skew-join
splitting stands in for hot-host handling at cluster scale — SURVEY.md O12),
Arrow enabled for every pandas UDF / mapInPandas stage, and shuffle
partitions sized for the sandbox (32 cores). On a real cluster these come
from spark-submit conf; nothing here is sandbox-specific logic.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "supercrawler-spark", master: str | None = None,
              shuffle_partitions: int | None = None, extra_conf: dict | None = None
              ) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_SHUFFLE_PARTITIONS", cpus))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # keep Arrow batches bounded in BYTES for fat binary rows (a 10k-row
        # batch of 14KB pages is 140MB/worker — at 32 workers that thrashes);
        # 2k rows caps a body batch at ~30MB while analytic columns stay fast
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        # runtime bloom on join keys complements our persisted seen-filter
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "32g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
