"""A/B: ngram_span_dedup span-key representation — md5 hex STRING (current)
vs two 60-bit LONGs parsed from the same md5 (conv(substring(md5,1,15),16,10)
/ conv(substring(md5,17,15),16,10)).

Hypothesis: the 32-char string key inflates the two span-key shuffles
(stats agg + dup-occurrence join) and slows key comparisons; a lossless
(hi, lo) long pair should cut both.

MEASURED RESULT (2026-08-19, sf0.1 documents, local[32], alternating
same-window trials, noop sink): the long-pair variant is SLOWER —
str 3.49/2.59 s vs long2 9.22/4.53 s warm — because the two
conv(substring(...)) hex parses run per TOKEN OCCURRENCE (~1.3M rows at
sf0.1), and that projection CPU exceeds the shuffle-byte savings at any
scale where the span key is md5-derived (conv re-parses the hex the md5
just produced). Output parity was exact (exceptAll both ways = 0 rows).

Conclusion: keep the md5 hex string key. The fixed-width-key goal is
already met (md5 is constant 32 chars); shrinking it requires a hash that
is natively numeric on BOTH engines (DuckDB twin must replay it), which
md5 is not. Do not re-try blind.

Run: python scripts/ab_ngram_key.py  (prints per-trial seconds + parity)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

import supercrawler_spark as sc  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = 8
ID = "doc_id"


def build(docs, key_mode: str):
    toks = docs.select(F.col(ID), F.split(F.col("text"), " ").alias("_t"))
    base = toks.withColumn("_len", F.size("_t"))
    gram = F.md5(F.concat_ws(" ", F.slice(F.col("_t"), F.col("pos") + 1, F.lit(N))))
    occ0 = (base.filter(F.col("_len") >= N)
            .select(F.col(ID), F.col("_t"),
                    F.explode(F.sequence(F.lit(0), F.col("_len") - N)).alias("pos")))
    if key_mode == "str":
        occ = occ0.select(F.col(ID), F.col("pos"), gram.alias("_g"))
        keys = ["_g"]
    else:
        occ = occ0.select(
            F.col(ID), F.col("pos"),
            F.conv(F.substring(gram, 1, 15), 16, 10).cast("long").alias("_g1"),
            F.conv(F.substring(gram, 17, 15), 16, 10).cast("long").alias("_g2"))
        keys = ["_g1", "_g2"]
    stats = occ.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("_cnt"),
        F.min(F.struct(F.col(ID).alias("d"), F.col("pos").alias("p"))).alias("_canon"))
    dup_occ = (occ.join(stats.filter(F.col("_cnt") > 1), keys)
               .filter(~((F.col(ID) == F.col("_canon.d")) &
                         (F.col("pos") == F.col("_canon.p")))))
    covered = (dup_occ.select(
        F.col(ID),
        F.explode(F.sequence(F.col("pos"), F.col("pos") + (N - 1))).alias("tpos"))
        .distinct())
    tokpos = base.select(F.col(ID), F.posexplode("_t").alias("tpos", "tok"))
    kept = tokpos.join(covered, [ID, "tpos"], "left_anti")
    reassembled = kept.groupBy(ID).agg(
        F.concat_ws(" ", F.transform(
            F.array_sort(F.collect_list(F.struct("tpos", "tok"))),
            lambda s: s["tok"])).alias("text_dedup"),
        F.count(F.lit(1)).alias("_n_kept"))
    return (base.select(F.col(ID), F.col("_len").alias("n_tokens"))
            .join(reassembled, ID, "left")
            .select(F.col(ID),
                    F.coalesce(F.col("text_dedup"), F.lit("")).alias("text_dedup"),
                    F.col("n_tokens").cast("long").alias("n_tokens"),
                    (F.col("n_tokens") - F.coalesce(F.col("_n_kept"), F.lit(0)))
                    .cast("long").alias("n_removed")))


def main():
    spark = sc.get_spark("ab-ngram-key", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")) \
                .select(ID, "text")
    # untimed session warmup
    (spark.read.parquet(os.path.join(SF_DIR, "events.parquet")).limit(10_000)
     .write.format("noop").mode("overwrite").save())
    a, b = build(docs, "str"), build(docs, "long2")
    for i in range(3):
        t0 = time.time(); a.write.format("noop").mode("overwrite").save()
        ta = time.time() - t0
        t0 = time.time(); b.write.format("noop").mode("overwrite").save()
        tb = time.time() - t0
        print(f"trial{i}: str={ta:.2f}s long2={tb:.2f}s", flush=True)
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    print("parity diff rows:", diff)


if __name__ == "__main__":
    main()
