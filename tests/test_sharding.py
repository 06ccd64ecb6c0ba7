"""Corpus shard sink (datapipe/sharding.py): deterministic assignment,
single-file-per-shard writes, ground-truth manifest, pruned reads."""

import pandas as pd
from pyspark.sql import functions as F

from supercrawler_spark import fixtures
from supercrawler_spark.crawler import plan_str
from supercrawler_spark.datapipe import sharding as SH


def _corpus(spark, n=64):
    pdf = pd.DataFrame({
        "image_id": [f"img-{i:05d}" for i in range(n)],
        "caption": [f"caption {i}" for i in range(n)],
        "phash": list(range(n)),
    })
    return spark.createDataFrame(pdf)


def test_shard_assignment_deterministic_and_complete(spark):
    df = _corpus(spark)
    a = {r["image_id"]: r["shard"]
         for r in SH.shard_assignments(df, 8).collect()}
    b = {r["image_id"]: r["shard"]
         for r in SH.shard_assignments(df, 8).collect()}
    assert a == b
    assert set(a.values()) <= set(range(8))
    assert len(a) == 64


def test_write_shards_manifest_and_roundtrip(spark, tmp_path):
    path = str(tmp_path / "shards")
    df = _corpus(spark, n=100)
    manifest = SH.write_shards(df, path, n_shards=4).orderBy("shard")
    rows = manifest.collect()
    assert [r["shard"] for r in rows] == [0, 1, 2, 3]
    assert sum(r["n_rows"] for r in rows) == 100
    # one task -> one file per shard
    assert all(r["n_files"] == 1 for r in rows)
    assert all(r["n_bytes"] > 0 for r in rows)
    # round trip preserves every row exactly once
    back = spark.read.parquet(path)
    assert back.count() == 100
    assert back.select("image_id").distinct().count() == 100
    # rows landed in the shard the assignment function says
    got = {r["image_id"]: r["shard"] for r in back.collect()}
    want = {r["image_id"]: r["shard"]
            for r in SH.shard_assignments(df, 4).collect()}
    assert got == want


def test_write_shards_rerun_is_stable(spark, tmp_path):
    """Re-running the sink over the same corpus reproduces identical
    shard membership (resume/retrain reproducibility contract)."""
    df = _corpus(spark, n=40)
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    SH.write_shards(df, p1, n_shards=4)
    SH.write_shards(df, p2, n_shards=4)
    a = {(r["image_id"], r["shard"]) for r in spark.read.parquet(p1).collect()}
    b = {(r["image_id"], r["shard"]) for r in spark.read.parquet(p2).collect()}
    assert a == b


def test_read_shard_partition_pruned(spark, tmp_path):
    path = str(tmp_path / "shards")
    SH.write_shards(_corpus(spark, n=50), path, n_shards=5)
    one = SH.read_shard(spark, path, shard=2)
    ids = {r["image_id"] for r in one.collect()}
    want = {r["image_id"] for r in
            SH.shard_assignments(_corpus(spark, n=50), 5).collect()
            if r["shard"] == 2}
    assert ids == want
    # the scan is pruned to the shard=2 directory
    plan = plan_str(one)
    assert "PartitionFilters" in plan and "shard" in plan, plan


def test_shard_balance_at_scale(spark, tmp_path):
    """Hash sharding balances a skewed corpus: 2k rows over 8 shards
    stay within 2x of the mean (binomial bound at this n)."""
    pdf = pd.DataFrame({
        "image_id": [f"img-{i}" for i in range(2000)],
        "caption": ["same caption everywhere"] * 2000,  # value skew
        "phash": [7] * 2000,
    })
    counts = (SH.shard_assignments(spark.createDataFrame(pdf), 8)
              .groupBy("shard").count().collect())
    sizes = [r["count"] for r in counts]
    assert len(sizes) == 8
    assert max(sizes) < 2 * (2000 / 8) and min(sizes) > 0
