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


def test_streaming_dedup_equals_batch_distinct(spark, sf_dir):
    path = f"{sf_dir}/documents.parquet"
    got = {r["content_hash"] for r in
           streaming.streaming_dedup_hashes(spark, path).collect()}
    want = {r["h"] for r in spark.read.parquet(path)
            .select(F.md5("text").alias("h")).distinct().collect()}
    assert got == want


def test_stateful_user_counts_equals_batch(spark, sf_dir):
    path = f"{sf_dir}/events.parquet"
    got = {r["user_id"]: r["n_events"] for r in
           streaming.stateful_user_counts(spark, path).collect()}
    want = {r["user_id"]: r["n"] for r in spark.read.parquet(path)
            .groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == want


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

    def stub_transport(session, url, options):
        assert options["headers"]["User-Agent"].startswith("Mozilla/5.0")
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


def test_fetch_stage_request_opts_and_callable_ua(spark):
    """Reference parity: opts.request merges into every HTTP call
    (Crawler.js:382-394, test Crawler.spec.js:701-723) and userAgent may be
    a function of the URL (Crawler.js:30-34, spec:202-216)."""
    import json

    def stub_transport(session, url, options):
        # runs on executors — surface the merged options via the body
        return (200, "application/json", None, json.dumps(options).encode())

    batch = spark.createDataFrame(
        [(0, "http://a.example/p1"), (1, "http://b.example/p2")],
        ["batch_idx", "url"])
    rows = webfetch.fetch_stage(
        batch,
        user_agent=lambda u: f"bot-for-{u.split('/')[2]}",
        request_opts={"headers": {"X-Custom": "yes"},
                      "timeout": 5.0, "verify": False},
        transport=stub_transport).collect()
    assert len(rows) == 2
    seen = {r["url"]: json.loads(bytes(r["f_body"])) for r in rows}
    opts_a = seen["http://a.example/p1"]
    # callable UA consulted per URL
    assert opts_a["headers"]["User-Agent"] == "bot-for-a.example"
    assert seen["http://b.example/p2"]["headers"]["User-Agent"] == "bot-for-b.example"
    # custom headers deep-merge with defaults; scalars override
    assert opts_a["headers"]["X-Custom"] == "yes"
    assert opts_a["timeout"] == 5.0 and opts_a["verify"] is False
    assert opts_a["allow_redirects"] is False


def test_merge_request_options_nested():
    merged = webfetch.merge_request_options(
        {"headers": {"User-Agent": "ua"}, "timeout": 30.0},
        {"headers": {"Accept": "text/html"}, "timeout": 1.0})
    assert merged == {"headers": {"User-Agent": "ua", "Accept": "text/html"},
                      "timeout": 1.0}
    # no request_opts → defaults unchanged, and a copy (no aliasing)
    base = {"headers": {"User-Agent": "ua"}}
    out = webfetch.merge_request_options(base, None)
    out["headers"]["X"] = "y"
    assert "X" not in base["headers"]
    # fully recursive like lodash _.merge (Crawler.js:382-394): two-level
    # nested defaults merge instead of being clobbered
    deep = webfetch.merge_request_options(
        {"proxies": {"http": {"host": "p", "port": 80}},
         "headers": {"User-Agent": "ua"}},
        {"proxies": {"http": {"port": 8080}, "https": {"host": "s"}}})
    assert deep["proxies"]["http"] == {"host": "p", "port": 8080}
    assert deep["proxies"]["https"] == {"host": "s"}
    assert deep["headers"] == {"User-Agent": "ua"}
    # user-side nested dicts are copied too
    user = {"proxies": {"http": {"port": 1}}}
    out2 = webfetch.merge_request_options({}, user)
    out2["proxies"]["http"]["port"] = 2
    assert user["proxies"]["http"]["port"] == 1


def test_streaming_link_ingest_equals_batch_dedup(spark, tmp_path):
    """Streaming frontier ingestion: three overlapping link files (one per
    micro-batch, maxFilesPerTrigger=1) against a static seen set — the
    admitted set must equal the batch dropDuplicates+anti-join, with
    repeats across micro-batches admitted exactly once."""
    import pandas as pd

    from supercrawler_spark.streaming import streaming_link_ingest

    seen_urls = [f"http://h{i % 7}.example/seen{i}" for i in range(200)]
    seen_df = spark.createDataFrame([(u,) for u in seen_urls], ["url"])

    links_dir = str(tmp_path / "links")
    out_dir = str(tmp_path / "frontier_delta")
    import os
    os.makedirs(links_dir)
    # batch 0: 50 seen + 50 new; batch 1: repeats 25 of batch 0's new + 50
    # fresh; batch 2: pure repeats (must admit nothing)
    b0 = seen_urls[:50] + [f"http://h{i % 7}.example/new{i}" for i in range(50)]
    b1 = [f"http://h{i % 7}.example/new{i}" for i in range(25)] + \
         [f"http://h{i % 7}.example/fresh{i}" for i in range(50)]
    b2 = b0[:30] + b1[:30]
    for i, urls in enumerate((b0, b1, b2)):
        pd.DataFrame({"url": urls}).to_parquet(
            f"{links_dir}/cycle{i}.parquet", index=False)

    got = streaming_link_ingest(spark, links_dir, seen_df, out_dir,
                                max_files_per_trigger=1)
    got_urls = sorted(r["url"] for r in got.collect())

    all_links = spark.createDataFrame([(u,) for u in b0 + b1 + b2], ["url"])
    want = sorted(r["url"] for r in
                  all_links.dropDuplicates(["url"])
                  .join(seen_df, "url", "left_anti").collect())
    assert got_urls == want          # exact, incl. cross-batch repeats
    assert len(got_urls) == len(set(got_urls)) == 100

def test_streaming_link_ingest_all_seen_returns_empty(spark, tmp_path):
    """Every candidate already seen → no micro-batch writes out_dir; the
    final read must return an empty url frame, not raise PATH_NOT_FOUND
    (ADVICE r3)."""
    import pandas as pd

    from supercrawler_spark.streaming import streaming_link_ingest

    seen_urls = [f"http://h{i % 3}.example/s{i}" for i in range(40)]
    seen_df = spark.createDataFrame([(u,) for u in seen_urls], ["url"])
    links_dir = str(tmp_path / "links")
    out_dir = str(tmp_path / "delta")
    import os
    os.makedirs(links_dir)
    pd.DataFrame({"url": seen_urls[:30]}).to_parquet(
        f"{links_dir}/cycle0.parquet", index=False)
    got = streaming_link_ingest(spark, links_dir, seen_df, out_dir)
    assert got.count() == 0
    assert [f.name for f in got.schema.fields] == ["url"]
