"""Adaptive recrawl scheduling (recrawl.py) vs a pure-Python reference of
the Cho & Garcia-Molina estimator and a DuckDB window-SQL twin."""

import math

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from supercrawler_spark import recrawl as RC

HOUR = 3600.0e3


def history():
    rows = []
    # 'news': changes on every one of 5 revisits (hourly)
    for i in range(6):
        rows.append(("http://a.test/news", i * HOUR, f"v{i}"))
    # 'static': 5 revisits, never changes
    for i in range(6):
        rows.append(("http://a.test/static", i * HOUR, "same"))
    # 'weekly': 10 revisits (daily), changes on 2 of them
    for i in range(11):
        rows.append(("http://a.test/weekly", i * 24 * HOUR,
                     "w" + str(i // 5)))
    # 'once': a single fetch — no intervals, rate must be NULL
    rows.append(("http://a.test/once", 0.0, "x"))
    return rows


@pytest.fixture(scope="module")
def visits(spark):
    return spark.createDataFrame(history(),
                                 ["url", "fetch_time", "fingerprint"])


def expected_rate(n: int, x: int, mean_iv: float) -> float:
    return -math.log((n - x + 0.5) / (n + 0.5)) / mean_iv


def test_change_rate_matches_formula(spark, visits):
    got = {r["url"]: r for r in RC.change_rate(visits).collect()}
    news = got["http://a.test/news"]
    assert (news["n_intervals"], news["n_changed"]) == (5, 5)
    assert news["change_rate"] == pytest.approx(
        expected_rate(5, 5, HOUR), rel=1e-12)
    static = got["http://a.test/static"]
    assert (static["n_intervals"], static["n_changed"]) == (5, 0)
    assert static["change_rate"] == pytest.approx(
        expected_rate(5, 0, HOUR), rel=1e-12)
    weekly = got["http://a.test/weekly"]
    assert (weekly["n_intervals"], weekly["n_changed"]) == (10, 2)
    assert weekly["change_rate"] == pytest.approx(
        expected_rate(10, 2, 24 * HOUR), rel=1e-12)
    assert "http://a.test/once" not in got  # no interval → no estimate row


def test_change_rate_matches_duckdb_window_twin(spark, visits):
    con = duckdb.connect()
    con.register("v", pd.DataFrame(history(),
                                   columns=["url", "fetch_time",
                                            "fingerprint"]))
    ref = {u: (n, x, m, r) for u, n, x, m, r in con.execute("""
        WITH iv AS (
          SELECT url, fetch_time - lag(fetch_time) OVER w AS dt,
                 (fingerprint <> lag(fingerprint) OVER w)::INT AS chg
          FROM v WINDOW w AS (PARTITION BY url ORDER BY fetch_time))
        SELECT url, COUNT(*) AS n, SUM(chg) AS x, AVG(dt) AS m,
               -ln((COUNT(*) - SUM(chg) + 0.5)/(COUNT(*) + 0.5))/AVG(dt) AS r
        FROM iv WHERE dt IS NOT NULL GROUP BY url""").fetchall()}
    con.close()
    got = {r["url"]: r for r in RC.change_rate(visits).collect()}
    assert set(got) == set(ref)
    for u, (n, x, m, r) in ref.items():
        assert got[u]["n_intervals"] == n and got[u]["n_changed"] == x
        assert got[u]["mean_interval_ms"] == pytest.approx(m, rel=1e-12)
        assert got[u]["change_rate"] == pytest.approx(r, rel=1e-12)


def test_recrawl_interval_monotone_and_clamped(spark, visits):
    out = RC.recrawl_interval(RC.change_rate(visits),
                              target_freshness=0.5,
                              min_ms=HOUR, max_ms=30 * 24 * HOUR)
    by = {r["url"]: r["recrawl_ms"] for r in out.collect()}
    # faster-changing pages recrawl sooner
    assert by["http://a.test/news"] < by["http://a.test/weekly"]
    assert by["http://a.test/weekly"] < by["http://a.test/static"]
    # news changes every revisit → clamps to the floor
    assert by["http://a.test/news"] == HOUR
    # exact mid-range value for weekly: delta = -ln(0.5)/r
    r = expected_rate(10, 2, 24 * HOUR)
    assert by["http://a.test/weekly"] == pytest.approx(
        -math.log(0.5) / r, rel=1e-12)


def test_never_changed_gets_max_interval_at_high_freshness(spark):
    sp = spark.createDataFrame(
        [("u", 0.0, "a"), ("u", HOUR, "a")],
        ["url", "fetch_time", "fingerprint"])
    # with n=1 intervals and x=0 changes the estimator is
    # -ln((1 - 0/(1+0.5)) ...) = -ln(1.5/1.5) = 0 — a ZERO rate, so the
    # row takes the rate <= 0 branch and gets exactly max_ms (the old
    # comment claimed a positive rate, which made the <= assertion look
    # meaningful; pin the actual zero-rate behavior instead)
    out = RC.recrawl_interval(RC.change_rate(sp), target_freshness=0.99,
                              min_ms=HOUR, max_ms=10 * HOUR)
    assert out.collect()[0]["recrawl_ms"] == 10 * HOUR


def test_single_exchange_plan(spark, visits):
    from supercrawler_spark.crawler import plan_str
    plan = plan_str(RC.change_rate(visits))
    # the lag window and the per-url agg share the url partitioning:
    # exactly one Exchange node in the whole estimate (the formatted
    # plan names each node twice — tree line + detail header)
    import re
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1


def test_bad_target_raises(spark, visits):
    with pytest.raises(ValueError):
        RC.recrawl_interval(RC.change_rate(visits), target_freshness=1.0)
