"""End-to-end crawl equivalence vs the pure-Python reference simulator.

north_rule: identical crawl ordering and URL-seen set under the same seed
list and politeness budget; resumable from checkpoint.
"""

import math
import tempfile

import pytest

from supercrawler_spark import fixtures
from supercrawler_spark.crawler import CrawlConfig, SparkCrawler
from supercrawler_spark.oracle import OracleConfig, OracleCrawler, web_pages_dict


@pytest.fixture(scope="module")
def small_web(spark):
    seeds, web, images = fixtures.make_web_fixture(n_hosts=2, pages_per_host=3)
    return seeds, web, spark.createDataFrame(web)


def run_pair(spark, seeds, web_pdf, web_df, budget, mode, max_cycles=100,
             **kw):
    wd = tempfile.mkdtemp()
    cfg = CrawlConfig(budget=budget, order_mode=mode, **kw)
    cr = SparkCrawler(spark, web_df, wd, cfg)
    cr.seed(list(seeds["url"]))
    cr.crawl(max_cycles=max_cycles)
    ora = OracleCrawler(web_pages_dict(web_pdf),
                        OracleConfig(budget=budget, order_mode=mode, **kw))
    ora.seed(list(seeds["url"]))
    res = ora.crawl(max_rounds=max_cycles)
    return cr, res


def assert_parity(cr, res, check_order=True):
    if check_order:
        assert cr.crawl_order == res.crawl_order
    assert cr.seen_urls() == res.seen_urls()
    eng = {}
    for _, r in cr.frontier_pdf().iterrows():
        s = r["status_code"]
        s = None if (s is None or (isinstance(s, float) and math.isnan(s))) else int(s)
        eng[r["url"]] = (s, r["error_code"], int(r["num_errors"]))
    ora = {u: (st, ec, ne) for u, (st, ec, em, ne) in res.final_states().items()}
    assert eng == ora


def test_batch_budget_parity(spark, small_web):
    seeds, web_pdf, web_df = small_web
    cr, res = run_pair(spark, seeds, web_pdf, web_df, budget=8, mode="random")
    assert_parity(cr, res)


def test_fifo_parity(spark, small_web):
    seeds, web_pdf, web_df = small_web
    cr, res = run_pair(spark, seeds, web_pdf, web_df, budget=4, mode="fifo")
    assert_parity(cr, res)


def test_sequential_reference_order(spark):
    """budget=1 == the reference's one-URL-at-a-time loop exactly."""
    seeds, web_pdf, images = fixtures.make_web_fixture(n_hosts=1, pages_per_host=3)
    web_df = spark.createDataFrame(web_pdf)
    cr, res = run_pair(spark, seeds, web_pdf, web_df, budget=1, mode="random",
                       max_cycles=60)
    assert_parity(cr, res)


def test_decay_priority_parity(spark, small_web):
    """RedisUrlList hostname-balancing decay scores (A1): flooding hosts
    drain later; engine (applyInPandas recurrence) == oracle (sequential)."""
    seeds, web_pdf, web_df = small_web
    cr, res = run_pair(spark, seeds, web_pdf, web_df, budget=4, mode="decay",
                       virtual_start_ms=1e12)
    assert_parity(cr, res)
    assert cr.host_delay  # state carried
    # oracle's host_delay must match the engine's final state
    ora = OracleCrawler(web_pages_dict(web_pdf),
                        OracleConfig(budget=4, order_mode="decay",
                                     virtual_start_ms=1e12))
    ora.seed(list(seeds["url"]))
    ora.crawl(max_rounds=100)
    for h in cr.host_delay:
        d_e, l_e = cr.host_delay[h]
        d_o, l_o = ora.host_delay[h]
        assert abs(d_e - d_o) < 1e-9 and l_e == l_o


def test_per_host_cap_parity(spark, small_web):
    seeds, web_pdf, web_df = small_web
    cr, res = run_pair(spark, seeds, web_pdf, web_df, budget=6, mode="random",
                       per_host_cap=2)
    assert_parity(cr, res)


def test_salted_pop_identical_to_unsalted(spark, small_web):
    """O12 skew guard: the two-stage salted pop returns EXACTLY the same
    crawl as the plain per-host window (per-host top-cap is contained in
    the union of per-salt top-caps) — and thus still matches the oracle."""
    seeds, web_pdf, web_df = small_web
    cr, res = run_pair(spark, seeds, web_pdf, web_df, budget=6, mode="random",
                       per_host_cap=2, host_salt_buckets=4)
    assert_parity(cr, res)


def test_adaptive_exec_parity(spark, small_web):
    """AQE on (the hot-host skew-join config for huge budgets) must not
    change results — guards the adaptive_exec knob against plan-semantics
    drift. (Engine-only knob: the oracle has no AQE notion.)"""
    seeds, web_pdf, web_df = small_web
    wd = tempfile.mkdtemp()
    try:
        cr = SparkCrawler(spark, web_df, wd,
                          CrawlConfig(budget=8, order_mode="random",
                                      adaptive_exec=True))
        cr.seed(list(seeds["url"]))
        cr.crawl(max_cycles=100)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
    ora = OracleCrawler(web_pages_dict(web_pdf),
                        OracleConfig(budget=8, order_mode="random"))
    ora.seed(list(seeds["url"]))
    res = ora.crawl(max_rounds=100)
    assert_parity(cr, res)


def test_robots_disabled_parity(spark, small_web):
    seeds, web_pdf, web_df = small_web
    cr, res = run_pair(spark, seeds, web_pdf, web_df, budget=8, mode="random",
                       robots_enabled=False)
    assert_parity(cr, res)
    # with robots off, /private/ pages get crawled
    assert any("/private/" in u for u in cr.seen_urls()
               if not cr.frontier_pdf().empty)


def test_robots_policy_matrix(spark):
    """6 hosts cycle through robots status 200/200/404/500/600/410
    (fixtures) — Crawler.js:469-491 policy."""
    seeds, web_pdf, images = fixtures.make_web_fixture(n_hosts=6, pages_per_host=2)
    web_df = spark.createDataFrame(web_pdf)
    cr, res = run_pair(spark, seeds, web_pdf, web_df, budget=16, mode="random")
    assert_parity(cr, res)
    pdf = cr.frontier_pdf()
    by_host = {}
    for _, r in pdf.iterrows():
        if r["url"].endswith("/index.html"):
            by_host[r["url"].split("/")[2]] = r["error_code"]
    # robots 200/404/410 hosts crawl fine; 500 (no ignore flag) and 600 deny
    assert by_host["host0.example"] is None
    assert by_host["host2.example"] is None          # 404 → allow-all
    assert by_host["host5.example"] is None          # 410 → allow-all
    assert by_host["host3.example"] == "ROBOTS_NOT_ALLOWED"  # 500
    assert by_host["host4.example"] == "ROBOTS_NOT_ALLOWED"  # 600


def test_robots_ignore_server_error(spark):
    seeds, web_pdf, images = fixtures.make_web_fixture(n_hosts=6, pages_per_host=2)
    web_df = spark.createDataFrame(web_pdf)
    cr, res = run_pair(spark, seeds, web_pdf, web_df, budget=16, mode="random",
                       robots_ignore_server_error=True)
    assert_parity(cr, res)
    pdf = cr.frontier_pdf()
    host3 = {r["url"]: r["error_code"] for _, r in pdf.iterrows()
             if "host3.example" in r["url"]}
    assert host3["http://host3.example/index.html"] is None


def test_resume_equals_uninterrupted(spark, small_web):
    seeds, web_pdf, web_df = small_web
    wd = tempfile.mkdtemp()
    cfg = CrawlConfig(budget=8, order_mode="random", checkpoint_every=1)
    c1 = SparkCrawler(spark, web_df, wd, cfg)
    c1.seed(list(seeds["url"]))
    c1.crawl(max_cycles=3)
    c2 = SparkCrawler(spark, web_df, wd, cfg)
    assert c2.resume()
    c2.crawl(max_cycles=100)

    wd3 = tempfile.mkdtemp()
    c3 = SparkCrawler(spark, web_df, wd3, cfg)
    c3.seed(list(seeds["url"]))
    c3.crawl(max_cycles=100)
    cols = ["url", "status_code", "error_code", "num_errors", "seq"]
    a = c2.frontier_pdf()[cols].sort_values("url").reset_index(drop=True)
    b = c3.frontier_pdf()[cols].sort_values("url").reset_index(drop=True)
    assert a.equals(b)


def test_image_payload_invariants(spark, small_web):
    """Crawled image bodies decode to pixels matching the images fixture:
    PSNR >= 40 dB lossy / exact lossless + caption equality (input_hint)."""
    import numpy as np

    from supercrawler_spark import imaging

    seeds, web_pdf, web_df = small_web
    _, _, images = fixtures.make_web_fixture(n_hosts=2, pages_per_host=3)
    wd = tempfile.mkdtemp()
    cr = SparkCrawler(spark, web_df, wd, CrawlConfig(budget=8))
    cr.seed(list(seeds["url"]))
    cr.crawl(max_cycles=100)
    crawled = {u for u in cr.seen_urls() if "/media/photo-" in u}
    assert crawled, "gallery links should have been discovered"
    img_by_id = {r["image_id"]: r for _, r in images.iterrows()}
    rows = web_pdf[web_pdf["body_image_id"].notna() & web_pdf["url"].isin(crawled)]
    assert len(rows) > 0
    for _, r in rows.iterrows():
        fix = img_by_id[r["body_image_id"]]
        got_px, w, h, fmt = imaging.decode_image(bytes(r["body"]))
        ref_px = imaging.synth_pixels(fix["image_id"], fix["w"], fix["h"])
        assert (w, h) == (fix["w"], fix["h"])
        if fmt == "png":
            assert np.array_equal(got_px, ref_px)
        else:
            assert imaging.psnr(got_px, ref_px) >= 40.0
        assert fix["caption"] == f"synthetic caption {int(fix['image_id'][4:])} for {fix['image_id']}"


def test_distributed_seq_assignment_parity(spark, small_web):
    """Forcing the range-partitioned offset seq scheme on EVERY cycle
    (seq_partition_threshold=0) yields bit-identical crawl order and
    frontier seqs vs the flat-window path — the sitemap-dump scale path
    has the same semantics."""
    seeds, web, web_df = small_web
    results = []
    for threshold in (0, 1 << 30):
        wd = tempfile.mkdtemp()
        cr = SparkCrawler(spark, web_df, wd,
                          CrawlConfig(budget=6, order_mode="random",
                                      seq_partition_threshold=threshold))
        cr.seed(list(seeds["url"]))
        cr.crawl(max_cycles=60)
        pdf = cr.frontier_pdf()
        results.append((cr.crawl_order,
                        list(pdf["url"]), list(pdf["seq"])))
    assert results[0][0] == results[1][0]  # identical crawl order
    assert results[0][1] == results[1][1]  # identical url-by-seq order
    assert results[0][2] == results[1][2]  # identical dense seqs


def test_decay_resume_and_table_carried_host_state(spark, small_web):
    """Decay (RedisUrlList) mode: per-host delay state survives kill/resume
    via the snapshot host_delay TABLE, the manifest JSON carries no
    O(hosts) entry, and the resumed crawl equals the uninterrupted one."""
    import json
    import os

    seeds, web_pdf, web_df = small_web

    def cfg():
        return CrawlConfig(budget=4, order_mode="decay",
                           virtual_start_ms=1e12, checkpoint_every=1)

    wd_a = tempfile.mkdtemp()
    c_a = SparkCrawler(spark, web_df, wd_a, cfg())
    c_a.seed(list(seeds["url"]))
    c_a.crawl(max_cycles=60)

    wd_b = tempfile.mkdtemp()
    c_b1 = SparkCrawler(spark, web_df, wd_b, cfg())
    c_b1.seed(list(seeds["url"]))
    c_b1.crawl(max_cycles=2)
    assert c_b1._host_delay_base is not None  # table committed
    # manifest meta holds only scalars — no host map
    with open(os.path.join(wd_b, "snapshots", "manifest.json")) as f:
        manifest = json.load(f)
    assert "host_delay" not in manifest["meta"]
    assert "host_delay" in manifest["tables"]

    c_b2 = SparkCrawler(spark, web_df, wd_b, cfg())
    assert c_b2.resume()
    # state restored lazily from the table, not the manifest
    looked = c_b2._host_delay_lookup(
        [h for h in {u.split("/")[2] for _, _, u in c_b1.crawl_order}])
    assert looked  # decayed hosts present in the table
    c_b2.crawl(max_cycles=100)

    assert c_b2.crawl_order == c_a.crawl_order[len(c_b1.crawl_order):]
    assert c_b2.seen_urls() == c_a.seen_urls()
    cols = ["url", "next_fetch_time", "num_errors", "seq"]
    a = c_a.frontier_pdf()[cols].sort_values("url").reset_index(drop=True)
    b = c_b2.frontier_pdf()[cols].sort_values("url").reset_index(drop=True)
    assert a.equals(b)

def _stub_transport_from_web(web_pdf):
    """Picklable stub transport serving the fixture web — the http-mode
    analog of the fetch join's web_pages lookup. Raises on unknown URLs
    (connection failure), returns (status, content_type, location, body)
    otherwise."""
    pages = {rec["url"]: (int(rec["status_code"]), rec.get("content_type"),
                          rec.get("location"), rec.get("body"))
             for rec in web_pdf.to_dict("records")}

    def transport(session, url, options):
        if url not in pages:
            raise ConnectionError(f"no route to {url}")
        return pages[url]

    return transport


def test_http_fetch_mode_parity(spark, small_web):
    """fetch_mode="http" driving the full loop through webfetch.fetch_stage
    (mapInPandas HTTP kernel, stub transport serving the fixture web) must
    produce an identical crawl to the fetch-join path: same crawl order,
    same seen set, same final per-url states vs the oracle."""
    seeds, web_pdf, web_df = small_web
    transport = _stub_transport_from_web(web_pdf)
    wd = tempfile.mkdtemp()
    cfg = CrawlConfig(budget=8, order_mode="random", fetch_mode="http",
                      fetch_transport=transport)
    cr_http = SparkCrawler(spark, None, wd, cfg)  # no web table at all
    cr_http.seed(list(seeds["url"]))
    cr_http.crawl(max_cycles=100)

    cr_join, res = run_pair(spark, seeds, web_pdf, web_df, budget=8,
                            mode="random")
    assert cr_http.crawl_order == cr_join.crawl_order
    assert cr_http.seen_urls() == cr_join.seen_urls()
    assert_parity(cr_http, res)


def test_collect_events_off_no_per_url_driver_rows(spark, small_web):
    """O13 (scale posture): a listener-less crawl (collect_events=False)
    keeps every per-URL row executor-resident — the driver may collect
    scalars and host-bounded robots/decay rows only, never the popped
    batch, the outcome fold, or any frontier-shaped frame. Final crawl
    state must still exactly match the oracle (the executor-side upsert
    delta / crawl_log derivation is the same lineage, minus the
    driver round-trip)."""
    from pyspark.sql import DataFrame

    seeds, web_pdf, web_df = small_web
    wd = tempfile.mkdtemp()
    cfg = CrawlConfig(budget=8, order_mode="random", collect_events=False)
    cr = SparkCrawler(spark, web_df, wd, cfg)
    cr.seed(list(seeds["url"]))

    collected = []
    orig_collect, orig_topandas = DataFrame.collect, DataFrame.toPandas

    def spy_c(self):
        collected.append(self.schema)
        return orig_collect(self)

    def spy_p(self):
        collected.append(self.schema)
        return orig_topandas(self)

    DataFrame.collect, DataFrame.toPandas = spy_c, spy_p
    try:
        cr.crawl(max_cycles=100)
    finally:
        DataFrame.collect, DataFrame.toPandas = orig_collect, orig_topandas

    # per-URL frames are recognizable by their columns: the popped batch /
    # outcome fold carry batch_idx, frontier rows carry seq, fetch rows
    # carry f_body. (Robots fetches collect url/status/body rows — they
    # are PER-HOST, allowed by the contract, and carry none of these.)
    leaked = [s for s in collected
              if any(f.name in ("batch_idx", "seq", "f_body")
                     for f in s.fields)]
    assert not leaked, f"per-URL frames crossed the driver: {leaked}"
    assert cr.crawl_order == []  # events opted out — nothing materialized

    ora = OracleCrawler(web_pages_dict(web_pdf),
                        OracleConfig(budget=8, order_mode="random"))
    ora.seed(list(seeds["url"]))
    res = ora.crawl(max_rounds=100)
    assert_parity(cr, res, check_order=False)
