"""A/B: simhash signature build — current 60-agg (one SUM per bit) vs a
PACKED 20-agg variant (3 x 21-bit counters per 64-bit SUM: bit j lives at
lane j // 20, position 21 * (j // 20) ... i.e. counter for bit k, k+20,
k+40 packed into agg column k).  Same single shuffle on doc_id, same
map-side combine; 3x fewer aggregation-buffer columns in the stage that
dominates simhash_near_pairs.  Overflow bound: each lane holds counts up
to 2^21 - 1 = 2,097,151 tokens per document (lane carries cannot collide
below that), far above any real document.

Parity is checked exactly (packed vs current signature on the full
corpus) before timing.

Usage: python scripts/ab_simhash_pack.py [rep]
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from supercrawler_spark.session import get_spark  # noqa: E402
from supercrawler_spark.datapipe.dedup import (  # noqa: E402
    SIMHASH_BITS, md5_long, simhash)
from supercrawler_spark.datapipe.text import tokens  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

LANES = 3                      # counters per packed agg column
GROUPS = SIMHASH_BITS // LANES  # 20 packed agg columns
LANE_W = 21                    # bits per counter lane
LANE_MASK = (1 << LANE_W) - 1


def simhash_packed(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    exploded = df.select(
        F.col(id_col),
        F.explode_outer(tokens(F.col(text_col))).alias("tok"))
    exploded = exploded.select(
        F.col(id_col), F.col("tok"), md5_long(F.col("tok")).alias("_h"))

    def lane_bit(k: int, lane: int) -> "F.Column":
        j = k + lane * GROUPS
        b = F.shiftrightunsigned(F.col("_h"), j).bitwiseAND(F.lit(1))
        return F.shiftleft(b, lane * LANE_W) if lane else b

    packed_exprs = []
    for k in range(GROUPS):
        v = lane_bit(k, 0)
        for lane in range(1, LANES):
            v = v + lane_bit(k, lane)
        packed_exprs.append(F.sum(v).alias(f"p{k}"))
    aggs = [F.count(F.col("tok")).alias("n_tok")] + packed_exprs
    agg = exploded.groupBy(id_col).agg(*aggs)

    value = None
    for j in range(SIMHASH_BITS):
        k, lane = j % GROUPS, j // GROUPS
        cnt = (F.shiftrightunsigned(F.coalesce(F.col(f"p{k}"), F.lit(0)),
                                    lane * LANE_W)
               .bitwiseAND(F.lit(LANE_MASK)))
        bit_set = (cnt * 2) > F.col("n_tok")
        term = F.when(bit_set, F.lit(1 << j).cast("long")) \
                .otherwise(F.lit(0).cast("long"))
        value = term if value is None else value + term
    return agg.select(F.col(id_col), value.alias("simhash"))


def main():
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    spark = get_spark("ab_simhash_pack", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()
    big = (docs.crossJoin(spark.range(rep).withColumnRenamed("id", "_r"))
           .withColumn("doc_id",
                       F.col("doc_id") + F.col("_r") * F.lit(10_000_000))
           .drop("_r"))

    docs.limit(1000).write.format("noop").mode("overwrite").save()

    def run(fn, frame, label):
        t0 = time.time()
        fn(frame).write.format("noop").mode("overwrite").save()
        w = time.time() - t0
        print(f"{label:28s} {w:6.2f}s")
        return w

    a = simhash(docs).withColumnRenamed("simhash", "sh_a")
    b = simhash_packed(docs).withColumnRenamed("simhash", "sh_b")
    diff = (a.join(b, "doc_id", "full")
            .where((F.col("sh_a") != F.col("sh_b")) |
                   F.col("sh_a").isNull() | F.col("sh_b").isNull()).count())
    print(f"parity over {n_docs} docs: {diff} mismatches")
    if diff:
        sys.exit(1)

    for tag, frame in (("sf0.1", docs), (f"sf0.1 x{rep}", big)):
        for i in range(3):
            w_cur = run(simhash, frame, f"current 60-agg {tag} #{i}")
            w_pak = run(simhash_packed, frame, f"packed 20-agg {tag} #{i}")
            print(f"  ratio packed/current: {w_pak / w_cur:.3f}")


if __name__ == "__main__":
    main()
