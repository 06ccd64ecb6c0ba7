"""Adaptive recrawl scheduling — per-URL change-frequency estimation.

The reference recrawls every page on one fixed clock
(/root/reference/lib/Crawler.js ``finalUpdateNextCrawlDate`` →
``crawledurl + interval``); at 10^10-URL scale a single interval either
hammers static pages or goes stale on news pages. The standard fix (Cho &
Garcia-Molina 2003, "Estimating frequency of change") estimates each
page's Poisson change rate from its revisit history and sets the recrawl
interval per URL.

Input: a revisit-history table ``(url, fetch_time, fingerprint)`` — one
row per completed fetch, ``fingerprint`` any content digest (e.g.
``datapipe.text.fingerprint`` of the body, or a handler-recorded md5).
The engine's crawl_log supplies (url, fetch_time); the fingerprint is one
extra handler column.

The estimator (ibid., the bias-corrected X̄ estimator for changes observed
at revisit boundaries):

    r̂ = -ln( (n - X + 0.5) / (n + 0.5) ) / Ī

with n revisit intervals, X of them showing a changed fingerprint, and Ī
the mean interval length. The recrawl interval then solves the freshness
target: P(unchanged at revisit) = exp(-r̂·Δ) ≥ target ⇒
Δ = -ln(target) / r̂, clamped to [min_ms, max_ms].

Scale design: ONE url-keyed exchange total — the lag window
(per-interval change flags) and the per-url aggregate share the same
partitioning, so Catalyst plans a single Exchange (plan-pinned by
tests/test_recrawl.py); per-URL history is short, so the window key is
high-cardinality and skew-free. Everything is JVM column math — no UDFs.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def change_rate(visits: DataFrame, url_col: str = "url",
                time_col: str = "fetch_time",
                fp_col: str = "fingerprint") -> DataFrame:
    """Per-URL Poisson change-rate estimate from revisit history.

    Returns ``(url, n_intervals, n_changed, mean_interval_ms,
    change_rate)`` — ``change_rate`` in changes per millisecond, NULL for
    URLs with no revisit (single fetch) or zero mean interval."""
    w = Window.partitionBy("url").orderBy("t")
    iv = (visits.select(
              F.col(url_col).alias("url"),
              F.col(time_col).cast("double").alias("t"),
              F.col(fp_col).alias("fp"))
          .withColumn("prev_t", F.lag("t").over(w))
          .withColumn("prev_fp", F.lag("fp").over(w))
          .filter(F.col("prev_t").isNotNull()))
    agg = iv.groupBy("url").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum(F.when(F.col("fp") != F.col("prev_fp"), F.lit(1))
               .otherwise(F.lit(0))).alias("n_changed"),
        F.avg(F.col("t") - F.col("prev_t")).alias("mean_interval_ms"))
    n = F.col("n_intervals").cast("double")
    x = F.col("n_changed").cast("double")
    rate = (-F.log((n - x + F.lit(0.5)) / (n + F.lit(0.5)))
            / F.col("mean_interval_ms"))
    return agg.withColumn(
        "change_rate",
        F.when(F.col("mean_interval_ms") > 0, rate)
         .otherwise(F.lit(None).cast("double")))


def recrawl_interval(rates: DataFrame, target_freshness: float = 0.5,
                     min_ms: float = 3600.0e3,
                     max_ms: float = 30 * 86400.0e3) -> DataFrame:
    """Map change rates to per-URL recrawl intervals: the largest Δ with
    P(page unchanged at revisit) = exp(-r̂·Δ) ≥ ``target_freshness``,
    clamped to [min_ms, max_ms]. URLs with NULL/zero rate (never observed
    changing) get ``max_ms``."""
    if not 0.0 < target_freshness < 1.0:
        raise ValueError("target_freshness must be in (0, 1)")
    delta = F.lit(-math.log(target_freshness)) / F.col("change_rate")
    return rates.withColumn(
        "recrawl_ms",
        F.when(F.col("change_rate").isNull() | (F.col("change_rate") <= 0),
               F.lit(max_ms))
         .otherwise(F.least(F.lit(max_ms),
                            F.greatest(F.lit(min_ms), delta))))
