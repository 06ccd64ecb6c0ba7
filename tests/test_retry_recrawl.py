"""Long-horizon virtual-clock semantics: retry backoff (C9/T4), recrawl
(C10/T8), robots TTL re-fetch (T6) — engine vs oracle parity with shrunken
horizons so the schedules actually fire within a test."""

import tempfile

import pandas as pd
import pytest

from supercrawler_spark import fixtures
from supercrawler_spark.crawler import CrawlConfig, SparkCrawler
from supercrawler_spark.oracle import OracleConfig, OracleCrawler, web_pages_dict


def _mini_web():
    """3 pages: ok page linking to an error page and a missing page."""
    rows = [
        {"url": "http://h0.example/robots.txt", "host": "h0.example",
         "status_code": 200, "content_type": "text/plain", "location": None,
         "body": b"User-agent: *\nDisallow:\n", "body_image_id": None},
        {"url": "http://h0.example/index.html", "host": "h0.example",
         "status_code": 200, "content_type": "text/html", "location": None,
         "body": b'<a href="/err.html">x</a><a href="/gone.html">y</a>',
         "body_image_id": None},
        {"url": "http://h0.example/err.html", "host": "h0.example",
         "status_code": 500, "content_type": "text/html", "location": None,
         "body": b"boom", "body_image_id": None},
    ]
    pdf = pd.DataFrame(rows, columns=fixtures.WEB_PAGES_COLUMNS)
    pdf["status_code"] = pdf["status_code"].astype("int32")
    return pdf


def run_pair(spark, web_pdf, seeds, max_cycles=60, **kw):
    wd = tempfile.mkdtemp()
    cr = SparkCrawler(spark, spark.createDataFrame(web_pdf), wd,
                      CrawlConfig(**kw))
    cr.seed(seeds)
    cr.crawl(max_cycles=max_cycles)
    ora = OracleCrawler(web_pages_dict(web_pdf), OracleConfig(**kw))
    ora.seed(seeds)
    res = ora.crawl(max_rounds=max_cycles)
    return cr, res


def test_retry_backoff_fires_and_matches_oracle(spark):
    """initial_retry=2 intervals → the 500 page is retried with doubling
    backoff; crawl order must match the oracle exactly through retries."""
    web = _mini_web()
    cr, res = run_pair(spark, web, ["http://h0.example/index.html"],
                       budget=2, order_mode="random",
                       initial_retry_ms=2000.0, max_idle_skip_ms=30000.0,
                       max_cycles=12)
    assert cr.crawl_order == res.crawl_order
    # the error page appears multiple times in the crawl order (retries)
    errs = [u for _, _, u in cr.crawl_order if u.endswith("/err.html")]
    assert len(errs) >= 3
    pdf = cr.frontier_pdf().set_index("url")
    row = pdf.loc["http://h0.example/err.html"]
    assert row["error_code"] == "HTTP_ERROR"
    assert row["num_errors"] == len(errs)
    ora_row = res.rows["http://h0.example/err.html"]
    assert ora_row.num_errors == int(row["num_errors"])


def test_recrawl_horizon_fires(spark):
    """recrawl_ms small → successful pages get crawled again; parity."""
    web = _mini_web()
    cr, res = run_pair(spark, web, ["http://h0.example/index.html"],
                       budget=2, order_mode="random",
                       recrawl_ms=6000.0, initial_retry_ms=1e12,
                       max_idle_skip_ms=30000.0, max_cycles=10)
    assert cr.crawl_order == res.crawl_order
    idx = [u for _, _, u in cr.crawl_order if u.endswith("/index.html")]
    assert len(idx) >= 2  # re-crawled after the 6s horizon


def test_robots_ttl_refetch(spark):
    """robots TTL smaller than the crawl span → robots re-fetched; the
    robots URL is only enqueued once (insertIfNotExists no-op); parity."""
    web = _mini_web()
    cr, res = run_pair(spark, web, ["http://h0.example/index.html"],
                       budget=1, order_mode="random",
                       robots_cache_ttl_ms=3000.0, recrawl_ms=4000.0,
                       initial_retry_ms=1e12, max_idle_skip_ms=20000.0,
                       max_cycles=8)
    assert cr.crawl_order == res.crawl_order
    robots_rows = [u for _, _, u in cr.crawl_order if u.endswith("robots.txt")]
    assert len(robots_rows) >= 1
    assert cr.seen_urls() == res.seen_urls()
