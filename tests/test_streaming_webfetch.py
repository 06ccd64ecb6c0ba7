"""Structured Streaming ops + the production HTTP fetch stage (stubbed)."""

import gzip

import pytest
from pyspark.sql import functions as F

from supercrawler_spark import streaming, webfetch


def test_windowed_event_counts_equals_batch(spark, sf_dir):
    path = f"{sf_dir}/events.parquet"
    out = streaming.windowed_event_counts(spark, path).toPandas()
    batch = (spark.read.parquet(path)
             .groupBy(F.date_trunc("day", "ts").alias("d"), "event_type")
             .agg(F.count(F.lit(1)).alias("n_events"),
                  F.round(F.sum("value"), 2).alias("total_value"))
             .select(F.col("d").cast("timestamp").cast("long").alias("window_start"),
                     "event_type", "n_events", "total_value")
             .toPandas())
    key = ["window_start", "event_type"]
    a = out.sort_values(key).reset_index(drop=True)
    b = batch.sort_values(key).reset_index(drop=True)
    assert len(a) == len(b) > 0
    assert (a["n_events"].to_numpy() == b["n_events"].to_numpy()).all()
    assert abs(a["total_value"].to_numpy() - b["total_value"].to_numpy()).max() < 1e-6


def test_stream_crawl_metrics(spark):
    import tempfile

    from supercrawler_spark import fixtures
    from supercrawler_spark.crawler import CrawlConfig, SparkCrawler
    seeds, web, _ = fixtures.make_web_fixture(n_hosts=1, pages_per_host=3)
    wd = tempfile.mkdtemp()
    cr = SparkCrawler(spark, spark.createDataFrame(web), wd,
                      CrawlConfig(budget=8, checkpoint_every=1))
    cr.seed(list(seeds["url"]))
    cr.crawl(max_cycles=30)
    out = streaming.stream_crawl_metrics(spark, f"{wd}/metrics").collect()[0]
    assert out["total_fetched"] == len(cr.crawl_order)
    assert out["total_new_urls"] == len(cr.seen_urls()) - len(seeds)


def test_fetch_stage_shapes_and_errors(spark):
    """Stub transport: verifies schema, gzip-like binary passthrough,
    redirect surfacing, and failure → NULL status (REQUEST_ERROR path)."""
    pages = {
        "http://a.example/ok": (200, "text/html; charset=utf-8", None,
                                b"<a href='/x'>x</a>"),
        "http://a.example/gz": (200, "application/gzip", None,
                                gzip.compress(b"<urlset></urlset>")),
        "http://a.example/redir": (301, "text/html", "http://a.example/ok", b""),
    }

    def stub_transport(session, url, ua, follow, timeout):
        assert ua.startswith("Mozilla/5.0")
        if url not in pages:
            raise ConnectionError("refused")
        return pages[url]

    batch = spark.createDataFrame(
        [(i, u) for i, u in enumerate(list(pages) + ["http://a.example/dead"])],
        ["batch_idx", "url"])
    out = {r["url"]: r for r in
           webfetch.fetch_stage(batch, transport=stub_transport).collect()}
    assert out["http://a.example/ok"]["f_status"] == 200
    assert bytes(out["http://a.example/gz"]["f_body"])[:2] == b"\x1f\x8b"
    assert out["http://a.example/redir"]["f_location"] == "http://a.example/ok"
    assert out["http://a.example/dead"]["f_status"] is None
