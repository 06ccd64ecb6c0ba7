"""Builtin content handlers (link-extraction UDTF kernels) + handler registry.

These are the pure-Python kernels the Spark engine maps over Arrow record
batches via ``mapInPandas`` — one row (page) in, many rows (links) out.
They reproduce the reference handlers byte-for-byte on the reference's own
golden tests:

- html_link_parser: /root/reference/lib/handlers/htmlLinkParser.js
  (cheerio selector ``a[href], link[href][rel=alternate], area[href]``,
   resolve → protocol filter → hostname filter → canonical format
   (fragment dropped) → urlFilter)
- robots_parser: /root/reference/lib/handlers/robotsParser.js
  (``Sitemap:`` directives on /robots.txt pages only, resolved)
- sitemaps_parser: /root/reference/lib/handlers/sitemapsParser.js
  (optional gunzip; sitemapindex>sitemap>loc, urlset>url>loc,
   urlset>url>xhtml:link[rel=alternate] — concatenated IN THAT ORDER)

The reference parses its sitemap tests with a *lenient* HTML parser
(cheerio), and its fixtures are actually malformed XML (trailing ``]``,
/root/reference/test/handlers/sitemapsParser.spec.js:36) — so we use a
lenient regex extractor rather than a strict XML parser, which also avoids
per-row DOM cost (the reference made the same trade for speed,
sitemapsParser.js:58-60 / README changelog 0.9.1).

A handler is ``fn(body: bytes, url: str, content_type: str) -> list[str]``.
The registry pairs each with a content-type pattern per Crawler.js:341-356.
"""

from __future__ import annotations

import gzip as gzip_mod
import html as html_mod
import re
from html.parser import HTMLParser

from . import robots as robots_mod
from . import urls as urls_mod

DEFAULT_GZIP_CONTENT_TYPES = ("application/x-gzip", "application/gzip")


# --------------------------------------------------------------------------
# P1: HTML link parser
# --------------------------------------------------------------------------

class _LinkCollector(HTMLParser):
    """Collects hrefs matching ``a[href], link[href][rel=alternate],
    area[href]`` in document order (htmlLinkParser.js:21)."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.hrefs: list[str] = []

    def handle_starttag(self, tag, attrs):
        d = {}
        for k, v in attrs:
            if k not in d:
                d[k] = v
        href = d.get("href")
        if href is None:
            return
        if tag in ("a", "area"):
            self.hrefs.append(href)
        elif tag == "link" and d.get("rel") == "alternate":
            self.hrefs.append(href)

    # void elements like <link>/<area> may appear self-closed
    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)


def extract_html_links(body, page_url: str, hostnames=None, url_filter=None) -> list[str]:
    """Kernel of the reference htmlLinkParser handler."""
    if isinstance(body, (bytes, bytearray)):
        text = bytes(body).decode("utf-8", errors="replace")
    else:
        text = body
    collector = _LinkCollector()
    collector.feed(text)
    out = []
    for href in collector.hrefs:
        absolute = urls_mod.resolve(page_url, href)
        canon = urls_mod.canonicalize(absolute)  # None for non-http(s)
        if canon is None:
            continue
        if hostnames is not None and urls_mod.hostname_of(absolute) not in hostnames:
            continue
        out.append(canon)
    if url_filter is not None:
        out = [u for u in out if url_filter(u, page_url)]
    return out


def html_link_parser(hostnames=None, url_filter=None):
    """Handler factory mirroring ``htmlLinkParser(opts)``."""

    def handler(body, url, content_type=None):
        return extract_html_links(body, url, hostnames=hostnames, url_filter=url_filter)

    handler.__name__ = "htmlLinkParser"
    return handler


# --------------------------------------------------------------------------
# P2: robots.txt sitemap extractor
# --------------------------------------------------------------------------

def extract_robots_sitemaps(body, page_url: str, url_filter=None) -> list[str]:
    if urls_mod.path_of(page_url) != "/robots.txt":
        return []  # robotsParser.js:27-29
    if isinstance(body, (bytes, bytearray)):
        text = bytes(body).decode("utf-8", errors="replace")
    else:
        text = body
    out = [urls_mod.resolve(page_url, s) for s in robots_mod.extract_sitemaps(text)]
    if url_filter is not None:
        out = [u for u in out if url_filter(u, page_url)]
    return out


def robots_parser(url_filter=None):
    def handler(body, url, content_type=None):
        return extract_robots_sitemaps(body, url, url_filter=url_filter)

    handler.__name__ = "robotsParser"
    return handler


# --------------------------------------------------------------------------
# P3: sitemap XML parser
# --------------------------------------------------------------------------

_SITEMAP_BLOCK_RE = re.compile(r"<sitemap[\s>].*?</sitemap\s*>", re.DOTALL | re.IGNORECASE)
_URL_BLOCK_RE = re.compile(r"<url[\s>].*?</url\s*>", re.DOTALL | re.IGNORECASE)
_LOC_RE = re.compile(r"<loc\s*>(.*?)</loc\s*>", re.DOTALL | re.IGNORECASE)
_XHTML_LINK_RE = re.compile(r"<xhtml:link\b[^>]*>", re.IGNORECASE)
_ATTR_RE = re.compile(r"([a-zA-Z_:][-a-zA-Z0-9_:.]*)\s*=\s*(\"[^\"]*\"|'[^']*')")
_SITEMAPINDEX_RE = re.compile(r"<sitemapindex[\s>]", re.IGNORECASE)
_URLSET_RE = re.compile(r"<urlset[\s>]", re.IGNORECASE)


def _attrs_of(tag_text: str) -> dict:
    return {k.lower(): v[1:-1] for k, v in _ATTR_RE.findall(tag_text)}


def extract_sitemap_links(
    body,
    page_url: str,
    content_type: str | None = None,
    url_filter=None,
    gzip_content_types=DEFAULT_GZIP_CONTENT_TYPES,
) -> list[str]:
    """Kernel of the reference sitemapsParser handler. Order matters:
    sitemapindex locs, then urlset locs, then xhtml:link alternates
    (sitemapsParser.js:81)."""
    raw = bytes(body) if isinstance(body, (bytes, bytearray)) else str(body).encode()
    if content_type is not None and content_type in tuple(gzip_content_types):
        raw = gzip_mod.decompress(raw)
    text = raw.decode("utf-8", errors="replace")

    sitemap_urls: list[str] = []
    if _SITEMAPINDEX_RE.search(text):
        for block in _SITEMAP_BLOCK_RE.findall(text):
            m = _LOC_RE.search(block)
            if m:
                sitemap_urls.append(html_mod.unescape(m.group(1).strip()))

    url_urls: list[str] = []
    link_urls: list[str] = []
    if _URLSET_RE.search(text):
        for block in _URL_BLOCK_RE.findall(text):
            m = _LOC_RE.search(block)
            if m:
                url_urls.append(html_mod.unescape(m.group(1).strip()))
        for tag in _XHTML_LINK_RE.findall(text):
            attrs = _attrs_of(tag)
            if attrs.get("rel") == "alternate" and attrs.get("href"):
                link_urls.append(html_mod.unescape(attrs["href"]))

    out = sitemap_urls + url_urls + link_urls
    if url_filter is not None:
        out = [u for u in out if url_filter(u, page_url)]
    return out


def sitemaps_parser(url_filter=None, gzip_content_types=None):
    """Handler factory mirroring ``sitemapsParser(opts)`` including the
    string/array/[] forms of gzipContentTypes (sitemapsParser.js:33-38)."""
    if isinstance(gzip_content_types, str):
        gz = (gzip_content_types,)
    elif gzip_content_types is None:
        gz = DEFAULT_GZIP_CONTENT_TYPES
    else:
        gz = tuple(gzip_content_types)

    def handler(body, url, content_type=None):
        return extract_sitemap_links(
            body, url, content_type=content_type, url_filter=url_filter, gzip_content_types=gz
        )

    handler.__name__ = "sitemapsParser"
    return handler


# --------------------------------------------------------------------------
# P4: handler registry (addHandler API — Crawler.js:135-148)
# --------------------------------------------------------------------------

class HandlerRegistry:
    """Ordered (content_type_pattern, handler) registry.

    ``add('*', fn)`` / ``add(['a/b','c/d'], fn)`` / ``add('text', fn)`` /
    one-arg wildcard form ``add(fn)`` — all per the reference ``addHandler``.
    Handlers fire in registration order; results concatenate (Crawler.js:
    341-367); a non-list return is coerced to []; an exception marks the
    page HANDLERS_ERROR and discards ALL its links (Crawler.js:250-255).
    """

    def __init__(self):
        self._handlers: list[tuple[object, object]] = []

    def add(self, content_type, handler=None):
        if handler is None:
            content_type, handler = "*", content_type
        self._handlers.append((content_type, handler))
        return self

    def __len__(self):
        return len(self._handlers)

    def fire(self, body, url: str, content_type: str) -> list[str]:
        """Run all matching handlers; raises HandlersError on any failure."""
        ct = (content_type or "").split(";", 1)[0]
        links: list[str] = []
        for pattern, fn in self._handlers:
            if not urls_mod.content_type_matches(pattern, ct):
                continue
            try:
                result = fn(body, url, ct)
            except Exception as exc:  # → HANDLERS_ERROR (Crawler.js:250-255)
                raise HandlersError(f"A handlers error occured. {exc}") from exc
            if not isinstance(result, list):
                result = []
            links.extend(result)
        return links


class HandlersError(Exception):
    pass


def default_registry(hostnames=None, url_filter=None) -> HandlerRegistry:
    """The registry used by the engine's e2e tests: html links on text/html,
    robots sitemap extraction on text/plain, sitemap XML on xml + gzip types
    (mirrors the reference README's recommended setup)."""
    reg = HandlerRegistry()
    reg.add("text/html", html_link_parser(hostnames=hostnames, url_filter=url_filter))
    reg.add("text/plain", robots_parser(url_filter=url_filter))
    reg.add(
        ["application/xml", "text/xml", "application/x-gzip", "application/gzip"],
        sitemaps_parser(url_filter=url_filter),
    )
    return reg
