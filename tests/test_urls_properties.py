"""Property-based tests (hypothesis) for the URL primitives — pure-Python
driver-side functions, so hundreds of generated cases run in milliseconds.
The golden vectors in tests/test_urls.py pin REFERENCE parity on known
inputs; these pin the algebraic invariants the crawl engine relies on for
ANY url the generator can produce (canonicalize idempotent + fragment-free,
robots_url shape, priority range/determinism, resolve absorption)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from supercrawler_spark import urls

label = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789-", min_size=1,
                max_size=8).filter(lambda s: not s.startswith("-")
                                   and not s.endswith("-"))
host = st.builds(lambda parts: ".".join(parts),
                 st.lists(label, min_size=2, max_size=3))
pathseg = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789._-", min_size=0,
                  max_size=8)
path = st.builds(lambda segs: "/" + "/".join(segs),
                 st.lists(pathseg, min_size=0, max_size=3))
query = st.one_of(st.just(""), st.builds(lambda s: "?" + s, pathseg))
fragment = st.one_of(st.just(""), st.builds(lambda s: "#" + s, pathseg))
scheme = st.sampled_from(["http", "https"])
port = st.one_of(st.just(""), st.sampled_from([":80", ":443", ":8080"]))

urls_st = st.builds(lambda sc, h, po, pa, q, f: f"{sc}://{h}{po}{pa}{q}{f}",
                    scheme, host, port, path, query, fragment)


@settings(max_examples=300, deadline=None)
@given(urls_st)
def test_canonicalize_idempotent_and_fragment_free(u):
    c = urls.canonicalize(u)
    assert c is not None
    assert "#" not in c                       # fragments always dropped
    assert urls.canonicalize(c) == c          # idempotent


@settings(max_examples=300, deadline=None)
@given(urls_st)
def test_robots_url_shape(u):
    r = urls.robots_url(u)
    assert r.endswith("/robots.txt")
    # same scheme+authority as the page url (Crawler.js:511-526)
    assert r == f"{urls.parse(u).scheme}://{urls.parse(u).host}/robots.txt"
    assert urls.hostname_of(r) == urls.hostname_of(u)
    assert urls.robots_url(r) == r            # idempotent


@settings(max_examples=300, deadline=None)
@given(urls_st)
def test_deterministic_priority_range_and_stability(u):
    p = urls.deterministic_priority(u)
    assert 0.0 <= p < 1.0
    assert urls.deterministic_priority(u) == p  # pure function


@settings(max_examples=300, deadline=None)
@given(urls_st, urls_st)
def test_resolve_absorbs_absolute_href(base, href):
    """Resolving an ABSOLUTE href against any base yields the href itself
    (Node url.resolve semantics — the redirect-target path relies on it)."""
    out = urls.resolve(base, href)
    assert urls.canonicalize(out) == urls.canonicalize(href)


@settings(max_examples=300, deadline=None)
@given(urls_st, pathseg.filter(lambda s: s != ""))
def test_resolve_relative_keeps_authority(base, rel):
    out = urls.resolve(base, rel)
    assert urls.hostname_of(out) == urls.hostname_of(base)


@settings(max_examples=200, deadline=None)
@given(urls_st)
def test_sha1_matches_url_hash_contract(u):
    assert len(urls.sha1_hex(u)) == 40
    int(urls.sha1_hex(u), 16)  # valid hex
