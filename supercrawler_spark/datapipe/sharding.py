"""Curated-corpus shard sink (WebDataset-shaped, parquet-backed).

Training loaders consume a curated image+caption corpus as a fixed set
of similar-sized shards, each independently readable, with a manifest
that records per-shard row counts and byte sizes (the WebDataset /
tfrecord layout convention). The reference crawler has no sink at all —
its handlers just fire events (`lib/Crawler.js:200-217`); this is the
stage a 100 TB pipeline needs between curation and training.

Spark-first design:
- shard assignment is a DETERMINISTIC hash of the id column
  (xxhash64 pmod n_shards) — reruns and resumed jobs place every row in
  the same shard, so downstream sample order is reproducible without
  any RNG state. `repartition(n_shards, shard_key)` makes shard = Spark
  partition, so each shard is written by exactly one task as exactly
  one file (no per-file coordination, no driver involvement).
- hash sharding balances rows regardless of input skew (a hot domain's
  rows scatter across all shards) — at 10^10 rows the law of large
  numbers keeps shard sizes within a fraction of a percent.
- the manifest is computed from the WRITTEN files (one parquet footer
  read per shard), not from pre-write estimates, so it is the ground
  truth a training loader can trust.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def shard_assignments(df: DataFrame, n_shards: int,
                      id_col: str = "image_id") -> DataFrame:
    """Adds the deterministic `shard` column (0..n_shards-1)."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    return df.withColumn(
        "shard", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards))
                  .cast("int"))


def write_shards(df: DataFrame, path: str, n_shards: int,
                 id_col: str = "image_id") -> DataFrame:
    """Writes `df` as `n_shards` deterministic hash shards under
    ``path/shard=K/`` and returns the manifest DataFrame
    (shard, n_rows, n_bytes, n_files) read back from the written files.

    One shuffle (the repartition on the shard key); each shard is one
    task's single output file, so the write is embarrassingly parallel
    and adding executors scales it linearly.
    """
    spark = df.sparkSession
    assigned = shard_assignments(df, n_shards, id_col=id_col)
    (assigned
     .repartition(n_shards, "shard")
     .write.mode("overwrite")
     .partitionBy("shard")
     .parquet(path))
    return shard_manifest(spark, path)


def shard_manifest(spark: SparkSession, path: str) -> DataFrame:
    """Ground-truth manifest from the written shard directories: per
    shard, row count (parquet footer metadata — no data scan) and the
    on-disk byte size. Driver work is O(n_shards) directory listings."""
    rows = []
    for name in sorted(os.listdir(path)):
        if not name.startswith("shard="):
            continue
        shard_dir = os.path.join(path, name)
        files = [os.path.join(shard_dir, f) for f in os.listdir(shard_dir)
                 if f.endswith(".parquet")]
        n_bytes = sum(os.path.getsize(f) for f in files)
        n_rows = (spark.read.parquet(shard_dir).count() if files else 0)
        rows.append((int(name.split("=", 1)[1]), n_rows, n_bytes,
                     len(files)))
    return spark.createDataFrame(
        rows, "shard int, n_rows long, n_bytes long, n_files int")


def read_shard(spark: SparkSession, path: str, shard: int) -> DataFrame:
    """Reads one shard by partition-pruned scan (the `shard=K` directory
    only — Catalyst never lists the other shards)."""
    return (spark.read.parquet(path)
            .filter(F.col("shard") == shard))
