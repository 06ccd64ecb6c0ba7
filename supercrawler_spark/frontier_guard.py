"""Crawler-trap detection — frontier pollution guard.

The reference crawler has no defense against infinite URL spaces
(calendar pages, session-id links, faceted-search combinatorics): it
enqueues every novel URL forever (lib/Crawler.js `_processUrl` →
insertIfNotExists). At 10^10-URL scale a single trap host can flood the
frontier. The standard defense (Heritrix's path-ology rules; Mercator's
per-host budgets) is to collapse URLs to structural TEMPLATES and flag
(host, template) groups whose distinct-URL count explodes.

Everything here is pure JVM column expressions — one map-combinable
``groupBy(host, template)`` shuffle over the candidate links, a
broadcast-able flagged-group set, and an anti-join guard. No UDFs, no
driver-side URL lists.

Template collapse (deterministic, cross-engine replayable — the pytest
twin runs the identical regex pipeline in DuckDB):
- the query string is dropped (``?`` and after) — query params are the
  most common trap axis;
- runs of 8+ hex characters become ``x`` (session ids, content hashes);
- runs of digits become ``0`` (dates, page numbers, numeric ids).

Verified by tests/test_frontier_guard.py: DuckDB-twin parity on the
template/flagging pipeline, planted calendar-trap and session-id-trap
detection, below-threshold hosts untouched, and a guard-plan audit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# order matters: strip query first, then hex (before digit collapse eats
# the digits inside hex runs), then digit runs. RE2-safe (no lookaround,
# like datapipe.text) so the DuckDB twin runs the IDENTICAL patterns.
_Q = r"\?.*$"
_HEX_RUN = r"[0-9a-f]{8,}"
_DIGITS = r"[0-9]+"


def url_template(col: F.Column) -> F.Column:
    """Collapse a URL to its structural template (JVM-side regexes)."""
    t = F.lower(col)
    t = F.regexp_replace(t, _Q, "")
    t = F.regexp_replace(t, _HEX_RUN, "x")
    t = F.regexp_replace(t, _DIGITS, "0")
    return t


def trap_stats(urls: DataFrame, url_col: str = "url",
               min_urls: int = 100) -> DataFrame:
    """Per (host, template) explosion stats over a URL table (frontier or
    a cycle's discovered links): ``(host, template, n_urls)`` for groups
    with at least ``min_urls`` distinct URLs — the flagged trap set.

    One shuffle: the distinct-and-count on (host, template) is
    map-combinable after the in-partition distinct; the output is
    trap-group-sized (tiny), never frontier-sized."""
    u = urls.select(F.col(url_col).alias("_u"))
    grouped = (u.select(
                   F.lower(F.try_parse_url(F.col("_u"), F.lit("HOST")))
                    .alias("host"),
                   url_template(F.col("_u")).alias("template"),
                   F.col("_u"))
                .filter(F.col("host").isNotNull())
                .groupBy("host", "template")
                .agg(F.count_distinct(F.col("_u")).alias("n_urls")))
    return grouped.filter(F.col("n_urls") >= F.lit(min_urls))


def guard_links(links: DataFrame, flagged: DataFrame,
                url_col: str = "url") -> DataFrame:
    """Drop candidate links that fall into a flagged (host, template)
    trap group. The flagged set is trap-sized → broadcast; the links side
    streams (one projection + broadcast anti-join, no link-side
    shuffle)."""
    keyed = links.withColumn(
        "_host", F.lower(F.try_parse_url(F.col(url_col), F.lit("HOST")))
    ).withColumn("_template", url_template(F.col(url_col)))
    out = keyed.join(
        F.broadcast(flagged.select(F.col("host").alias("_host"),
                                   F.col("template").alias("_template"))),
        ["_host", "_template"], "left_anti")
    return out.drop("_host", "_template")
