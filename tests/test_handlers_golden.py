"""Handler kernels vs the reference's golden input→output pairs.

Every expected list below is copied verbatim from the reference mocha tests
(/root/reference/test/handlers/*.spec.js) — byte-identical link lists,
identical ordering.
"""

import gzip

from supercrawler_spark.handlers import (HandlerRegistry, HandlersError,
                                         html_link_parser, robots_parser,
                                         sitemaps_parser)


def make_html(links):
    html = "<html><head></head><body>"
    for link in links:
        html += f'<a href="{link}">anchor</a>'
    html += "</body>"
    return html.encode()


# ---- htmlLinkParser (htmlLinkParser.spec.js:17-163) -----------------------

def test_absolute_url():
    hlp = html_link_parser()
    assert hlp(make_html(["https://example.com/test"]),
               "https://example2.com/index") == ["https://example.com/test"]


def test_relative_url():
    hlp = html_link_parser()
    assert hlp(make_html(["page2.html"]), "https://example.com/my/page.html") \
        == ["https://example.com/my/page2.html"]


def test_root_relative_url():
    hlp = html_link_parser()
    assert hlp(make_html(["/page2.html"]), "https://example.com/my/page.html") \
        == ["https://example.com/page2.html"]


def test_multiple_urls():
    hlp = html_link_parser()
    assert hlp(make_html(["/page2.html", "page3.html", "https://example2.com/55"]),
               "https://example.com/my/page.html") == [
        "https://example.com/page2.html",
        "https://example.com/my/page3.html",
        "https://example2.com/55",
    ]


def test_ignores_javascript_urls():
    hlp = html_link_parser()
    assert hlp(make_html(["javascript:alert('test')"]),
               "https://example.com/my/page.html") == []


def test_hostname_restriction():
    hlp = html_link_parser(hostnames=["example.com"])
    assert hlp(make_html(["/page2.html", "page3.html",
                          "https://example.com/101?q=str",
                          "https://example2.com/55"]),
               "https://example.com/my/page.html") == [
        "https://example.com/page2.html",
        "https://example.com/my/page3.html",
        "https://example.com/101?q=str",
    ]


def test_link_rel_alternate():
    hlp = html_link_parser()
    html = '<link href="/index-es/" hreflang="es" rel="alternate">'
    assert hlp(html.encode(), "http://example.com") == ["http://example.com/index-es/"]


def test_link_rel_stylesheet_excluded():
    hlp = html_link_parser()
    html = '<link href="styles.css" type="text/css" rel="stylesheet">'
    assert hlp(html.encode(), "http://example.com") == []


def test_url_filter():
    hlp = html_link_parser(url_filter=lambda url, page: "page1" not in url)
    assert hlp(make_html(["page1.html", "page2.html"]), "http://example.com") \
        == ["http://example.com/page2.html"]


def test_area_links():
    # selector includes area[href] (htmlLinkParser.js:21)
    hlp = html_link_parser()
    html = '<area href="/map-target.html">'
    assert hlp(html.encode(), "http://example.com") == ["http://example.com/map-target.html"]


def test_fragment_dropped():
    hlp = html_link_parser()
    assert hlp(make_html(["/p.html#section2"]), "http://example.com") \
        == ["http://example.com/p.html"]


# ---- robotsParser (robotsParser.spec.js:19-68) -----------------------------

ROBOTS_TXT = "\n".join([
    "User-agent: *",
    "Disallow: /test/",
    "",
    "Sitemap: http://subdomain.example.com/sitemap_index_1.xml",
])


def test_robots_absolute_sitemap():
    rb = robots_parser()
    assert rb(ROBOTS_TXT.encode(), "http://example.com/robots.txt") == [
        "http://subdomain.example.com/sitemap_index_1.xml"]


def test_robots_relative_sitemap():
    rb = robots_parser()
    txt = ROBOTS_TXT + "\nSitemap: /sitemap_index.xml"
    assert rb(txt.encode(), "http://example.com/robots.txt") == [
        "http://subdomain.example.com/sitemap_index_1.xml",
        "http://example.com/sitemap_index.xml",
    ]


def test_robots_url_filter():
    rb = robots_parser(url_filter=lambda u, p: "sitemap_index.xml" not in u)
    txt = ROBOTS_TXT + "\nSitemap: /sitemap_index.xml"
    assert rb(txt.encode(), "http://example.com/robots.txt") == [
        "http://subdomain.example.com/sitemap_index_1.xml"]


def test_robots_empty():
    rb = robots_parser()
    assert rb(b"", "http://example.com/robots.txt") == []


def test_robots_not_robots_path():
    rb = robots_parser()
    assert rb(ROBOTS_TXT.encode(), "http://example.com/Iamnotarobots.txt") == []


# ---- sitemapsParser (sitemapsParser.spec.js:12-219) ------------------------

SITEMAPINDEX = "\n".join([
    '<?xml version="1.0" encoding="UTF-8"?>',
    '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">',
    "<sitemap>",
    "<loc>http://example.com/sitemap.xml.gz</loc>",
    "<lastmod>2015-07-17T18:16:02.754-07:00</lastmod>",
    "</sitemap>",
    "<sitemap>",
    "<loc>http://example.com/sitemap-de.xml.gz</loc>",
    "<lastmod>2015-07-17T18:16:02.754-07:00</lastmod>",
    "</sitemap>",
    "</sitemapindex>",
])

# NOTE the trailing "]" — the reference fixture is malformed XML and its
# lenient parser accepts it (sitemapsParser.spec.js:36); ours must too.
URLSET = "\n".join([
    '<?xml version="1.0" encoding="UTF-8"?>',
    '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9" '
    'xmlns:xhtml="http://www.w3.org/1999/xhtml" >',
    "<url>",
    "<loc>https://example.com/home.html</loc>",
    "</url>",
    "</urlset>]",
])

URLSET_ALT = "\n".join([
    '<?xml version="1.0" encoding="UTF-8"?>',
    '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9" '
    'xmlns:xhtml="http://www.w3.org/1999/xhtml" >',
    "<url>",
    "<loc>https://example.com/home.html</loc>",
    '<xhtml:link rel="alternate" hreflang="de" href="https://example.com/home-de.html" />',
    "</url>",
    "</urlset>]",
])


def test_sitemapindex():
    sp = sitemaps_parser()
    assert sp(SITEMAPINDEX.encode(), "http://example.com/sitemap_index.xml") == [
        "http://example.com/sitemap.xml.gz",
        "http://example.com/sitemap-de.xml.gz",
    ]


def test_not_a_sitemap():
    sp = sitemaps_parser()
    assert sp(b"<html><body><h1>I'm not a sitemap</h1></body></html>",
              "http://example.com/sitemap_index.xml") == []


def test_urlset():
    sp = sitemaps_parser()
    assert sp(URLSET.encode(), "http://example.com/sitemap_index.xml") == [
        "https://example.com/home.html"]


def test_urlset_alternate():
    sp = sitemaps_parser()
    assert sp(URLSET_ALT.encode(), "http://example.com/sitemap_index.xml") == [
        "https://example.com/home.html",
        "https://example.com/home-de.html",
    ]


def test_sitemap_url_filter():
    sp = sitemaps_parser(url_filter=lambda u, p: "de" not in u)
    assert sp(URLSET_ALT.encode(), "http://example.com/sitemap_index.xml") == [
        "https://example.com/home.html"]
    sp2 = sitemaps_parser(url_filter=lambda u, p: "de" not in u)
    assert sp2(SITEMAPINDEX.encode(), "http://example.com/sitemap_index.xml") == [
        "http://example.com/sitemap.xml.gz"]


def test_gzipped_sitemap():
    sp = sitemaps_parser()
    buf = gzip.compress(URLSET.encode())
    assert sp(buf, "http://example.com/sitemap_index.xml",
              "application/x-gzip") == ["https://example.com/home.html"]
    assert sp(buf, "http://example.com/sitemap_index.xml",
              "application/gzip") == ["https://example.com/home.html"]


def test_gzip_type_as_string_and_array():
    buf = gzip.compress(URLSET.encode())
    sp = sitemaps_parser(gzip_content_types="arbitrary/gzip")
    assert sp(buf, "http://e.com/s.xml", "arbitrary/gzip") == [
        "https://example.com/home.html"]
    sp = sitemaps_parser(gzip_content_types=["arbitrary/gzip", "esoteric/gzip"])
    assert sp(buf, "http://e.com/s.xml", "esoteric/gzip") == [
        "https://example.com/home.html"]


def test_gzip_disabled_with_empty_list():
    sp = sitemaps_parser(gzip_content_types=[])
    assert sp(URLSET.encode(), "http://e.com/s.xml", "application/gzip") == [
        "https://example.com/home.html"]


# ---- registry (Crawler.js:135-148, 330-368) --------------------------------

def test_registry_routing_and_order():
    calls = []

    def make(name, links):
        def h(body, url, ct):
            calls.append(name)
            return links
        return h

    reg = HandlerRegistry()
    reg.add("text/html", make("html", ["http://a/1"]))
    reg.add("text", make("prefix", ["http://a/2"]))
    reg.add(["text/html", "x/y"], make("array", ["http://a/3"]))
    reg.add("*", make("star", ["http://a/4"]))
    reg.add("image", make("image", ["http://a/5"]))

    links = reg.fire(b"", "http://page/", "text/html; charset=utf-8")
    assert calls == ["html", "prefix", "array", "star"]
    assert links == ["http://a/1", "http://a/2", "http://a/3", "http://a/4"]


def test_registry_one_arg_wildcard_form():
    reg = HandlerRegistry()
    reg.add(lambda body, url, ct: ["http://x/"])
    assert reg.fire(b"", "http://p/", "anything/else") == ["http://x/"]


def test_registry_non_array_coerced():
    # Crawler.spec.js:964-980
    reg = HandlerRegistry()
    reg.add("*", lambda body, url, ct: "not-a-list")
    assert reg.fire(b"", "http://p/", "text/html") == []


def test_registry_handler_error():
    # Crawler.spec.js:982-1020 — error discards ALL links for the page
    reg = HandlerRegistry()
    reg.add("*", lambda body, url, ct: ["http://kept/"])

    def boom(body, url, ct):
        raise ValueError("test error string")

    reg.add("*", boom)
    try:
        reg.fire(b"", "http://p/", "text/html")
        raise AssertionError("expected HandlersError")
    except HandlersError as exc:
        assert "A handlers error occured. test error string" in str(exc)
