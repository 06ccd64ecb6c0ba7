"""The engine must behave identically under a session WITHOUT Arrow.

The driver harness builds its own SparkSession (Arrow off by default); in
round 1 the upsert delta went through pandas, which coerced a None+int
IntegerType column to float64 and crashed createDataFrame
(FIELD_DATA_TYPE_UNACCEPTABLE). All driver-side local frames now build from
tuples (crawler.local_df), so a full crawl — seed, pop, upsert, robots,
log flush, snapshot — must run green with Arrow disabled.
"""

import tempfile

import pytest

from supercrawler_spark import fixtures
from supercrawler_spark.crawler import CrawlConfig, SparkCrawler
from supercrawler_spark.oracle import OracleConfig, OracleCrawler, web_pages_dict

ARROW_KEY = "spark.sql.execution.arrow.pyspark.enabled"


@pytest.fixture()
def arrow_off(spark):
    prev = spark.conf.get(ARROW_KEY)
    spark.conf.set(ARROW_KEY, "false")
    yield spark
    spark.conf.set(ARROW_KEY, prev)


def test_crawl_parity_without_arrow(arrow_off):
    spark = arrow_off
    seeds, web, _ = fixtures.make_web_fixture(n_hosts=2, pages_per_host=3)
    wd = tempfile.mkdtemp()
    cfg = CrawlConfig(budget=8, order_mode="random")
    cr = SparkCrawler(spark, spark.createDataFrame(web), wd, cfg)
    cr.seed(list(seeds["url"]))
    cr.crawl(max_cycles=30)

    ora = OracleCrawler(web_pages_dict(web),
                        OracleConfig(budget=8, order_mode="random"))
    ora.seed(list(seeds["url"]))
    res = ora.crawl(max_rounds=30)

    assert cr.crawl_order == res.crawl_order
    assert cr.seen_urls() == res.seen_urls()
    # error/status columns survived the tuple path with exact types
    pdf = cr.frontier_pdf()
    ora_states = {u: st for u, (st, ec, em, ne) in res.final_states().items()}
    for _, r in pdf.iterrows():
        s = r["status_code"]
        s = None if s is None or (isinstance(s, float) and s != s) else int(s)
        assert s == ora_states[r["url"]]
