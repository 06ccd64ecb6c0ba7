"""robots.txt parser — `robots-parser` npm semantics."""

from supercrawler_spark.robots import RobotsTxt, extract_sitemaps, is_allowed

UA = "Mozilla/5.0 (compatible; supercrawler/1.0)"


def test_basic_disallow():
    txt = "User-agent: *\nDisallow: /private/"
    assert is_allowed(txt, "http://example.com/public/a.html", UA)
    assert not is_allowed(txt, "http://example.com/private/a.html", UA)


def test_empty_robots_allows_all():
    assert is_allowed("", "http://example.com/anything", UA)


def test_multiple_user_agent_lines_share_group():
    # /root/reference/test/Crawler.spec.js:506-523
    txt = "\n".join([
        "User-agent: firstbot",
        "User-agent: supercrawler",
        "Disallow: /blocked/",
        "",
        "User-agent: *",
        "Disallow: /other/",
    ])
    assert not is_allowed(txt, "http://example.com/blocked/x", "supercrawler/1.0")
    assert is_allowed(txt, "http://example.com/other/x", "supercrawler/1.0")
    assert not is_allowed(txt, "http://example.com/other/x", "randombot/2.0")


def test_longest_match_wins_allow_ties():
    txt = "\n".join([
        "User-agent: *",
        "Disallow: /shop/",
        "Allow: /shop/public/",
    ])
    assert not is_allowed(txt, "http://e.com/shop/x", UA)
    assert is_allowed(txt, "http://e.com/shop/public/x", UA)


def test_wildcards_and_anchor():
    txt = "User-agent: *\nDisallow: /*.pdf$"
    assert not is_allowed(txt, "http://e.com/docs/file.pdf", UA)
    assert is_allowed(txt, "http://e.com/docs/file.pdfx", UA)


def test_disallow_all():
    txt = "User-agent: *\nDisallow: /"
    assert not is_allowed(txt, "http://e.com/", UA)
    assert not is_allowed(txt, "http://e.com/a", UA)


def test_sitemap_extraction_order_preserved():
    txt = "\n".join([
        "User-agent: *",
        "Disallow: /test/",
        "",
        "Sitemap: http://subdomain.example.com/sitemap_index_1.xml",
        "Sitemap: /sitemap_index.xml",
    ])
    assert extract_sitemaps(txt) == [
        "http://subdomain.example.com/sitemap_index_1.xml",
        "/sitemap_index.xml",
    ]


def test_query_included_in_path_match():
    txt = "User-agent: *\nDisallow: /search?q="
    assert not is_allowed(txt, "http://e.com/search?q=x", UA)
    assert is_allowed(txt, "http://e.com/search", UA)


def test_case_insensitive_fields():
    txt = "USER-AGENT: *\nDISALLOW: /x/\nSITEMAP: http://e.com/s.xml"
    r = RobotsTxt(txt)
    assert not r.is_allowed("http://e.com/x/1", UA)
    assert r.get_sitemaps() == ["http://e.com/s.xml"]
