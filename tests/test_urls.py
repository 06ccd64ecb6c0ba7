"""URL primitives — parity pins from the reference's own test fixtures."""

from supercrawler_spark import urls


def test_sha1_pinned_fixtures():
    # /root/reference/test/DbUrlList.spec.js:222,267-277
    assert urls.sha1_hex("https://example.com") == \
        "327c3fda87ce286848a574982ddd0b7c7487f816"
    assert urls.sha1_hex("https://example.com/page2.html") == \
        "cf1b134e852ef25837ff7ed5888684a8f5213213"


def test_resolve_cases():
    # /root/reference/test/handlers/htmlLinkParser.spec.js resolution cases
    assert urls.resolve("https://example2.com/index", "https://example.com/test") \
        == "https://example.com/test"
    assert urls.resolve("https://example.com/my/page.html", "page2.html") \
        == "https://example.com/my/page2.html"
    assert urls.resolve("https://example.com/my/page.html", "/page2.html") \
        == "https://example.com/page2.html"
    # redirect resolution (Crawler.spec.js:412-444)
    assert urls.resolve("http://example.com/redirect", "/landing.html") \
        == "http://example.com/landing.html"
    assert urls.resolve("http://example.com/redirect", "http://other.com/x") \
        == "http://other.com/x"
    # non-hierarchical schemes pass through
    assert urls.resolve("http://example.com/", "javascript:alert('x')") \
        == "javascript:alert('x')"
    assert urls.resolve("http://example.com/", "mailto:a@b.c") == "mailto:a@b.c"


def test_canonicalize_drops_fragment_keeps_query():
    # htmlLinkParser.js:47-53: protocol+auth+host+pathname+search, no fragment
    assert urls.canonicalize("https://example.com/101?q=str#frag") \
        == "https://example.com/101?q=str"
    assert urls.canonicalize("http://example.com") == "http://example.com/"
    assert urls.canonicalize("http://user:pw@example.com:8080/x?a=1#f") \
        == "http://user:pw@example.com:8080/x?a=1"
    assert urls.canonicalize("javascript:alert('x')") is None
    assert urls.canonicalize("mailto:a@b.c") is None
    assert urls.canonicalize("HTTP://EXAMPLE.com/Path") == "http://example.com/Path"


def test_robots_url_per_protocol_host_port():
    # Crawler.js:511-526
    assert urls.robots_url("http://example.com/a/b?c=1") == "http://example.com/robots.txt"
    assert urls.robots_url("https://example.com:8080/a") == "https://example.com:8080/robots.txt"


def test_content_type_matching():
    # Crawler.js:341-356 + tests :742-914
    assert urls.content_type_matches("*", "anything/else")
    assert urls.content_type_matches("text/html", "text/html")
    assert not urls.content_type_matches("text/html", "text/plain")
    assert urls.content_type_matches("text", "text/html")          # prefix with / boundary
    assert not urls.content_type_matches("text", "textual/x")
    assert urls.content_type_matches(["a/b", "c/d"], "c/d")
    assert not urls.content_type_matches(["a/b", "c/d"], "c/e")


def test_normalize_content_type():
    assert urls.normalize_content_type("text/html; charset=utf-8", "http://x/") == "text/html"
    # extension fallback (Crawler.js:240)
    assert urls.normalize_content_type(None, "http://x/page.html") == "text/html"
    assert urls.normalize_content_type("", "http://x/sitemap.xml") == "application/xml"
    assert urls.normalize_content_type(None, "http://x/photo.jpg") == "image/jpeg"
    assert urls.normalize_content_type(None, "http://x/noext") == "application/octet-stream"


def test_deterministic_priority_in_unit_range():
    vals = [urls.deterministic_priority(f"http://h{i}.example/p{i}") for i in range(200)]
    assert all(0.0 <= v < 1.0 for v in vals)
    assert len(set(vals)) > 190  # well-scattered
