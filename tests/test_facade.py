"""Reference-compatible API facade: handlers, events, url list semantics."""

import pytest

from supercrawler_spark import fixtures
from supercrawler_spark.facade import Crawler
from supercrawler_spark.handlers import html_link_parser, robots_parser, sitemaps_parser


@pytest.fixture(scope="module")
def web_df(spark):
    _, web, _ = fixtures.make_web_fixture(n_hosts=2, pages_per_host=3)
    return spark.createDataFrame(web), web


def test_full_event_stream_and_custom_handler(spark, web_df):
    df, web_pdf = web_df
    events = []

    def custom_handler(body, url, content_type):
        # runs inside executors; observable via the links it contributes
        if url.endswith("/index.html"):
            return [f"http://{url.split('/')[2]}/from-custom-handler.html"]
        return "not-a-list"  # coerced to [] (Crawler.spec.js:964-980)

    crawler = (Crawler(spark, df, interval=1000, concurrent_requests_limit=8,
                       url_list="db")
               .add_handler("text/html", html_link_parser())
               .add_handler("text/plain", robots_parser())
               .add_handler(["application/xml", "application/x-gzip"],
                            sitemaps_parser())
               .add_handler(custom_handler))  # one-arg wildcard form
    for ev in ("crawlurl", "crawledurl", "redirect", "httpError",
               "urllistempty", "urllistcomplete"):
        crawler.on(ev, lambda *a, _ev=ev: events.append((_ev, a)))

    crawler.get_url_list().insert_if_not_exists("http://host0.example/index.html")
    crawler.queue_url("http://host1.example/index.html")
    crawler.start(max_cycles=50)

    kinds = [e for e, _ in events]
    assert "crawlurl" in kinds and "crawledurl" in kinds
    assert kinds[-2:] == ["urllistempty", "urllistcomplete"]
    # redirect event carries (url, location) — Crawler.js:246-249
    redirects = [a for e, a in events if e == "redirect"]
    assert any(a[0].endswith("/redirect") and a[1] for a in redirects)
    # httpError carries (statusCode, url)
    http_errs = [a for e, a in events if e == "httpError"]
    assert any(a[0] == 404 for a in http_errs)
    # the wildcard custom handler's links entered the frontier and were
    # crawled (REQUEST_ERROR since absent from the fixture web)
    custom_urls = {u for u in crawler.engine.seen_urls()
                   if "from-custom-handler" in u}
    assert len(custom_urls) == 2
    # crawledurl argument shape: (url, errorCode, statusCode, errorMessage)
    cu = [a for e, a in events if e == "crawledurl"]
    ok = [a for a in cu if a[1] is None and a[2] == 200]
    denied = [a for a in cu if a[1] == "ROBOTS_NOT_ALLOWED"]
    assert ok and denied
    assert "not allowed to be crawled" in denied[0][3]


def test_handlers_error_event_discards_links(spark, web_df):
    df, _ = web_df
    errors = []

    def boom(body, url, content_type):
        raise ValueError("kaboom")

    crawler = (Crawler(spark, df, concurrent_requests_limit=4, url_list="fifo",
                       robots_enabled=False)
               .add_handler("text/html", html_link_parser())
               .add_handler("text/html", boom)
               .on("handlersError", lambda msg: errors.append(msg)))
    crawler.queue_url("http://host0.example/index.html")
    crawler.start(max_cycles=10)
    assert errors and "A handlers error occured. kaboom" in errors[0]
    # the page's links were discarded → only the seed is in the frontier
    assert crawler.engine.seen_urls() == {"http://host0.example/index.html"}


def test_stop_from_listener(spark, web_df):
    df, _ = web_df
    crawler = (Crawler(spark, df, concurrent_requests_limit=2, url_list="db")
               .add_handler("text/html", html_link_parser()))
    counted = []
    def on_crawled(*a):
        counted.append(a)
        if len(counted) >= 2:
            crawler.stop()
    crawler.on("crawledurl", on_crawled)
    crawler.queue_url("http://host0.example/index.html")
    crawler.start(max_cycles=50)
    assert 2 <= len(counted) <= 4  # stopped after the in-flight cycle


def test_redis_url_list_mode(spark, web_df):
    df, _ = web_df
    crawler = (Crawler(spark, df, concurrent_requests_limit=6, url_list="redis")
               .add_handler("text/html", html_link_parser()))
    crawler.queue_url("http://host0.example/index.html")
    crawler.queue_url("http://host1.example/index.html")
    crawler.start(max_cycles=30)
    assert len(crawler.engine.seen_urls()) > 10
    assert crawler.engine.host_delay  # decay state maintained
