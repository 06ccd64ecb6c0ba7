"""Crawler-trap detection (frontier_guard.py): planted calendar /
session-id traps, DuckDB-twin parity on the identical RE2 pipeline, and
the broadcast anti-join guard plan."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from supercrawler_spark import frontier_guard as FG


def trap_urls():
    urls = []
    # calendar trap: one template, 300 distinct date URLs
    for y in range(2000, 2025):
        for m in range(1, 13):
            urls.append(f"http://trap.test/cal/{y}/{m:02d}/index.html")
    # session-id trap: 150 distinct hex session tokens on one path
    for i in range(150):
        urls.append(f"http://trap.test/view?sid={'%032x' % (i * 7919)}")
    # healthy host: 90 distinct articles (each its own numeric id, ONE
    # shared template — but below the threshold)
    for i in range(90):
        urls.append(f"http://ok.test/article/{i}")
    # healthy host: distinct real pages, unique templates
    urls += [f"http://ok.test/{w}.html" for w in ("about", "contact", "faq")]
    return urls


@pytest.fixture(scope="module")
def frontier(spark):
    return spark.createDataFrame([(u,) for u in trap_urls()], ["url"])


def duckdb_trap_stats(urls: list[str], min_urls: int) -> set[tuple]:
    """The identical template+flag pipeline in DuckDB (RE2 regexes — the
    module avoids lookaround precisely so this twin runs verbatim)."""
    con = duckdb.connect()
    con.register("u", pd.DataFrame({"url": urls}))
    rows = con.execute(f"""
        WITH t AS (
          SELECT lower(regexp_extract(url, '^[a-z]+://([^/?#]+)', 1)) AS host,
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(lower(url), '\\?.*$', ''),
                     '[0-9a-f]{{8,}}', 'x', 'g'),
                   '[0-9]+', '0', 'g') AS template,
                 url
          FROM u)
        SELECT host, template, COUNT(DISTINCT url) AS n_urls
        FROM t GROUP BY host, template
        HAVING COUNT(DISTINCT url) >= {min_urls}
    """).fetchall()
    con.close()
    return set(rows)


def test_trap_stats_matches_duckdb_twin(spark, frontier):
    got = {(r["host"], r["template"], r["n_urls"])
           for r in FG.trap_stats(frontier, min_urls=100).collect()}
    assert got == duckdb_trap_stats(trap_urls(), 100)
    # exactly the two planted traps, nothing from the healthy host
    assert {g[0] for g in got} == {"trap.test"}
    assert got == {
        ("trap.test", "http://trap.test/cal/0/0/index.html", 300),
        ("trap.test", "http://trap.test/view", 150),
    }


def test_below_threshold_host_not_flagged(spark, frontier):
    # ok.test/article/<n> shares one template at 90 urls: under 100 → clean;
    # at min_urls=50 it IS flagged (the knob works)
    flagged_50 = {(r["host"], r["template"])
                  for r in FG.trap_stats(frontier, min_urls=50).collect()}
    assert ("ok.test", "http://ok.test/article/0") in flagged_50


def test_guard_links_drops_only_trap_groups(spark, frontier):
    flagged = FG.trap_stats(frontier, min_urls=100)
    kept = FG.guard_links(frontier, flagged)
    urls = [r["url"] for r in kept.collect()]
    assert len(urls) == 90 + 3
    assert all(u.startswith("http://ok.test/") for u in urls)
    # schema untouched (guard cols dropped)
    assert kept.columns == ["url"]


def test_guard_plan_is_broadcast_anti_join(spark, frontier):
    flagged = FG.trap_stats(frontier, min_urls=100)
    from supercrawler_spark.crawler import plan_str
    out = FG.guard_links(frontier, flagged)
    plan = plan_str(out)
    assert "LeftAnti" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_template_collapse_examples(spark):
    df = spark.createDataFrame(
        [("http://a.test/cal/2024/03/07?page=9",),
         ("http://a.test/s/deadbeefcafe1234/item",),
         ("http://a.test/plain/path",)], ["url"])
    got = [r["t"] for r in
           df.select(FG.url_template(F.col("url")).alias("t")).collect()]
    assert got == ["http://a.test/cal/0/0/0",
                   "http://a.test/s/x/item",
                   "http://a.test/plain/path"]
