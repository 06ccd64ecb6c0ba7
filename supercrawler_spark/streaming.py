"""Structured Streaming operators.

The crawl loop itself is deliberately batch micro-cycles (north_star), but
the engine ships streaming operators for the surrounding pipeline: live
metrics over the crawl_log, and event-time windowed aggregation with
watermarks for late data. Tested by running the stream with an
``availableNow`` trigger over static parquet and comparing against the
equivalent batch aggregation (the oracle).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_event_counts(spark: SparkSession, events_path: str,
                          window: str = "1 day",
                          watermark: str = "2 days") -> DataFrame:
    """Event-time tumbling-window counts per event_type over a parquet
    stream, with a watermark for late data. Runs to completion with
    availableNow and returns the full result (complete output mode, so the
    result equals the batch GROUP BY — SQL-oracle checkable)."""
    schema = spark.read.parquet(events_path).schema
    if os.path.isfile(events_path):
        # the file-stream source needs a directory; link the single fixture
        # file into one (production streams a directory of arriving files)
        d = tempfile.mkdtemp(prefix="sc-stream-src-")
        os.symlink(os.path.abspath(events_path),
                   os.path.join(d, os.path.basename(events_path)))
        events_path = d
    stream = (spark.readStream.schema(schema).format("parquet")
              .option("path", events_path)
              .option("maxFilesPerTrigger", "16")
              .load())
    # watermarks require TIMESTAMP (session-tz) event time, not NTZ
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (stream
           .withWatermark("ts", watermark)
           .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
           .agg(F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 2).alias("total_value")))
    name = f"win_counts_{abs(hash(events_path)) % 10**8}"
    ckpt = tempfile.mkdtemp(prefix="sc-stream-ckpt-")
    q = (agg.writeStream.format("memory").queryName(name)
         .outputMode("complete")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    out = spark.table(name)
    return out.select(
        F.col("w.start").cast("timestamp").cast("long").alias("window_start"),
        "event_type", "n_events", "total_value")


def stream_crawl_metrics(spark: SparkSession, metrics_dir: str) -> DataFrame:
    """Live rollup over the crawler's append-only metrics log: cumulative
    fetched / new / dedup-hit counts. availableNow over whatever parts
    exist; in production this runs continuously against the log directory."""
    parts = [os.path.join(metrics_dir, e) for e in sorted(os.listdir(metrics_dir))
             if e.startswith("part-")]
    if not parts:
        raise ValueError(f"no metrics parts under {metrics_dir}")
    schema = spark.read.parquet(parts[0]).schema
    stream = (spark.readStream.schema(schema).format("parquet")
              .load(os.path.join(metrics_dir, "part-*")))
    agg = stream.agg(
        F.sum("popped").alias("total_fetched"),
        F.sum("links_new").alias("total_new_urls"),
        F.sum("dedup_hits").alias("total_dedup_hits"),
        F.sum("robots_denied").alias("total_robots_denied"),
        F.max("cycle_id").alias("last_cycle"),
    )
    name = f"crawl_metrics_{abs(hash(metrics_dir)) % 10**8}"
    ckpt = tempfile.mkdtemp(prefix="sc-stream-ckpt-")
    q = (agg.writeStream.format("memory").queryName(name)
         .outputMode("complete")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return spark.table(name)
