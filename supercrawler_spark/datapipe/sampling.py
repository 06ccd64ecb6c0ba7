"""Corpus resampling operators: stratified temperature resampling and
per-domain caps — the mixture-shaping stages a training pipeline runs after
dedup/quality filtering (CCNet/Gopher/LLaMA-style source reweighting).

Scale design: both operators reduce the corpus to a per-stratum count
dimension first (one map-side-combinable groupBy), broadcast that tiny
dimension back, and decide membership per row from a deterministic hash —
no global sort, no second full shuffle, nothing driver-resident. The
selection threshold is computed in INTEGER arithmetic (decimal(38,0) on
Spark, HUGEINT in DuckDB) so the ANSI-SQL oracle twin replays every keep
decision bit-for-bit — no cross-engine floating-point pow/sum ordering can
flip a row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 32-bit uniform draw from the row id via the repo's md5→bigint trick
# (exact DuckDB twin: ('0x' || substr(md5(id::VARCHAR), 1, 8))::BIGINT)
_U_BITS = 32
_U_MOD = 1 << _U_BITS


def _u32(col) -> "F.Column":
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10) \
            .cast("long")


def stratified_temperature_sample(df: DataFrame,
                                  stratum_col: str = "source",
                                  id_col: str = "doc_id",
                                  target: int | None = None) -> DataFrame:
    """Temperature-0.5 stratified resampling: stratum s with c_s documents
    gets sampling weight proportional to sqrt(c_s) (temperature alpha=1/2,
    the standard multilingual/source rebalancing exponent — upweights
    small strata relative to proportional sampling). A document is kept
    iff u(id) < target * sqrt(c_s) / (S * c_s) of the 32-bit hash space,
    where S = sum over strata of sqrt(c_s) and target defaults to the
    corpus size.

    sqrt is floor-integer (isqrt) and the keep test cross-multiplies to
    u * S * c_s < target * isqrt(c_s) * 2^32 in decimal(38,0) — exact, so
    the DuckDB twin (HUGEINT) decides identically for every row. At
    alpha=1/2 a stratum's expected kept count is min(c_s, target*q_s)
    with q_s = isqrt(c_s)/S.

    Scale shape: one map-combinable count per stratum, the stratum
    dimension (bounded by the number of sources/languages, never corpus-
    sized) broadcast back, keep decided row-local. One shuffle total.

    Returns every row as (id, stratum, keep) so drops stay auditable."""
    counts = (df.groupBy(F.col(stratum_col).alias("_s"))
              .agg(F.count(F.lit(1)).alias("_c"))
              .withColumn("_r", F.floor(F.sqrt(F.col("_c"))).cast("long")))
    sums = counts.agg(F.sum("_c").alias("_total"), F.sum("_r").alias("_rsum"))
    dim = counts.crossJoin(F.broadcast(sums))
    tgt = (F.lit(target).cast("long") if target is not None
           else F.col("_total"))
    joined = df.select(F.col(id_col), F.col(stratum_col)).join(
        F.broadcast(dim), F.col(stratum_col) == F.col("_s"))
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    lhs = d(_u32(F.col(id_col))) * d(F.col("_rsum")) * d(F.col("_c"))
    rhs = d(tgt) * d(F.col("_r")) * d(F.lit(_U_MOD))
    return joined.select(F.col(id_col), F.col(stratum_col),
                         (lhs < rhs).alias("keep"))


def domain_capped_sample(df: DataFrame, cap: int,
                         stratum_col: str = "source",
                         id_col: str = "doc_id") -> DataFrame:
    """Per-domain document cap (C4/Gopher-style hot-domain limiting):
    within each stratum keep at most ``cap`` documents, chosen by
    deterministic hash order (u(id), id) — a reproducible uniform sample
    without a random state.

    Scale shape: rank = row_number over (stratum / order u, id) with the
    ``rank <= cap`` filter directly above it, which Spark plans as
    WindowGroupLimit: each map task pre-limits its partition to the top
    ``cap`` rows per stratum BEFORE the exchange, so a 10^9-document hot
    domain ships ~cap rows per input task, not 10^9 rows into one window
    partition.

    Returns kept rows as (id, stratum, sample_rank)."""
    u = _u32(F.col(id_col))
    from pyspark.sql import Window
    w = (Window.partitionBy(F.col(stratum_col))
         .orderBy(u.asc(), F.col(id_col).asc()))
    return (df.select(F.col(id_col), F.col(stratum_col))
            .withColumn("sample_rank", F.row_number().over(w))
            .filter(F.col("sample_rank") <= cap))
