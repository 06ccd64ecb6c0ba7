"""A/B: simhash signature build — current 60-agg over every token
occurrence vs a (doc_id, token-hash)-count pre-aggregation feeding the
60-agg (fewer wide-agg input rows; natural-language corpora repeat
tokens ~2-5x). Times both at sf0.1 and at a REP-times replicated corpus
(distinct doc ids) to separate fixed plan overhead from per-row cost.

Usage: python scripts/ab_simhash.py [rep]
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


def simhash_preagg(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    exploded = df.select(
        F.col(id_col),
        F.explode_outer(tokens(F.col(text_col))).alias("tok"))
    per_tok = (exploded
               .select(F.col(id_col), md5_long(F.col("tok")).alias("_h"))
               .groupBy(id_col, "_h")
               .agg(F.count("_h").alias("_cnt")))  # count() skips NULL _h
    aggs = [F.sum(F.col("_cnt")).alias("n_tok")] + [
        F.sum(F.col("_cnt") *
              F.shiftrightunsigned(F.col("_h"), j).bitwiseAND(F.lit(1)))
         .alias(f"s{j}")
        for j in range(SIMHASH_BITS)
    ]
    agg = per_tok.groupBy(id_col).agg(*aggs)
    n_tok = F.coalesce(F.col("n_tok"), F.lit(0))
    value = None
    for j in range(SIMHASH_BITS):
        bit_set = (F.coalesce(F.col(f"s{j}"), F.lit(0)) * 2) > n_tok
        term = F.when(bit_set, F.lit(1 << j).cast("long")) \
                .otherwise(F.lit(0).cast("long"))
        value = term if value is None else value + term
    return agg.select(F.col(id_col), value.alias("simhash"))


def main():
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    spark = get_spark("ab_simhash", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()
    big = (docs.crossJoin(spark.range(rep).withColumnRenamed("id", "_r"))
           .withColumn("doc_id",
                       F.col("doc_id") + F.col("_r") * F.lit(10_000_000))
           .drop("_r"))

    # warm session
    docs.limit(1000).write.format("noop").mode("overwrite").save()

    def run(fn, frame, label):
        t0 = time.time()
        fn(frame).write.format("noop").mode("overwrite").save()
        w = time.time() - t0
        print(f"{label:28s} {w:6.2f}s")
        return w

    # parity first (cheap, sf0.1)
    a = simhash(docs).withColumnRenamed("simhash", "sh_a")
    b = simhash_preagg(docs).withColumnRenamed("simhash", "sh_b")
    diff = (a.join(b, "doc_id", "full")
            .where((F.col("sh_a") != F.col("sh_b")) |
                   F.col("sh_a").isNull() | F.col("sh_b").isNull()).count())
    print(f"parity: {n_docs} docs, {diff} mismatches")
    assert diff == 0

    for tag, frame in (("sf0.1", docs), (f"sf0.1 x{rep}", big)):
        for _ in range(3):
            run(simhash, frame, f"current   {tag}")
            run(simhash_preagg, frame, f"preagg    {tag}")
    spark.stop()


if __name__ == "__main__":
    main()
