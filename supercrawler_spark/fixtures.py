"""Deterministic synthetic web fixtures (FIXTURES.md §1-4), seed 42.

Generates the three crawl input tables as pandas DataFrames (converted to
Spark DataFrames / parquet by callers):

- ``seeds(seq, url)``
- ``web_pages(url, host, status_code, content_type, location, body,
  body_image_id)`` — the synthetic web; the fetch stage is an equi-join
  against it (SURVEY.md S4/J5). A URL absent from it → REQUEST_ERROR,
  matching a connection failure (/root/reference/lib/Crawler.js:396-399).
- ``images(image_id, bytes, w, h, fmt, caption, phash)`` — BASELINE.json
  input_hint payload table.

The page graph exercises every reference behavior: robots Disallow rules and
``Sitemap:`` directives, robots status policy (200/404/410/500/600 hosts —
Crawler.js:469-491), redirect chains absolute+relative (Crawler.js:246-249),
sitemapindex/urlset/gzipped sitemaps, javascript:/mailto: noise links,
``link rel=alternate`` + ``area`` selectors (htmlLinkParser.js:21),
duplicate links (dedup hits), dead links (REQUEST_ERROR), HTTP 4xx/5xx, and
image leaf pages with binary payloads.
"""

from __future__ import annotations

import gzip as gzip_mod

import numpy as np
import pandas as pd

from . import imaging

WEB_PAGES_COLUMNS = [
    "url", "host", "status_code", "content_type", "location", "body", "body_image_id",
]


def _page(url, host, status=200, ct="text/html", location=None, body=b"", image_id=None):
    return {
        "url": url, "host": host, "status_code": status, "content_type": ct,
        "location": location, "body": body, "body_image_id": image_id,
    }


def _html(links, extra="") -> bytes:
    parts = ["<html><head></head><body>"]
    for link in links:
        parts.append(f'<a href="{link}">anchor</a>')
    parts.append(extra)
    parts.append("</body></html>")
    return "".join(parts).encode()


def _urlset(urls, alternates=()) -> bytes:
    rows = ['<?xml version="1.0" encoding="UTF-8"?>',
            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9" '
            'xmlns:xhtml="http://www.w3.org/1999/xhtml">']
    for u in urls:
        rows.append(f"<url><loc>{u}</loc></url>")
    for u in alternates:
        rows.append(f'<url><xhtml:link rel="alternate" hreflang="de" href="{u}"/></url>')
    rows.append("</urlset>")
    return "\n".join(rows).encode()


def _sitemapindex(urls) -> bytes:
    rows = ['<?xml version="1.0" encoding="UTF-8"?>',
            '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">']
    for u in urls:
        rows.append(f"<sitemap><loc>{u}</loc></sitemap>")
    rows.append("</sitemapindex>")
    return "\n".join(rows).encode()


def make_images(n: int = 8, seed: int = 42) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        image_id = f"img-{i:04d}"
        w = int(rng.integers(24, 64))
        h = int(rng.integers(24, 64))
        fmt = "png" if i % 2 == 0 else "jpeg"
        px = imaging.synth_pixels(image_id, w, h)
        rows.append({
            "image_id": image_id,
            "bytes": imaging.encode_image(px, fmt),
            "w": w, "h": h, "fmt": fmt,
            "caption": f"synthetic caption {i} for {image_id}",
            "phash": imaging.phash64(px),
        })
    return pd.DataFrame(rows)


def make_videos(n: int = 4, n_frames: int = 12, seed: int = 42) -> pd.DataFrame:
    """Synthetic video payloads: a container of length-prefixed encoded
    frames (b'SVID' + u32 frame count + [u32 len | frame bytes]*). Each
    frame is the deterministic image codec's output, so frame-sampling
    stages are fully verifiable without a real video decoder."""
    import struct
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        video_id = f"vid-{i:04d}"
        w = int(rng.integers(24, 48))
        h = int(rng.integers(24, 48))
        frames = []
        for f in range(n_frames):
            px = imaging.synth_pixels(f"{video_id}-f{f}", w, h)
            frames.append(imaging.encode_image(px, "png"))
        blob = b"SVID" + struct.pack("<I", n_frames) + b"".join(
            struct.pack("<I", len(fb)) + fb for fb in frames)
        rows.append({"video_id": video_id, "bytes": blob,
                     "n_frames": n_frames, "w": w, "h": h,
                     "caption": f"synthetic clip {i} for {video_id}"})
    return pd.DataFrame(rows)


def make_audio(n: int = 8, sample_rate: int = 16000) -> pd.DataFrame:
    """Synthetic audio payloads: REAL PCM16 mono WAV files (stdlib ``wave``
    writer — no external codecs), each a pure sine with an integer number
    of cycles so RMS is exactly amplitude/sqrt(2) up to 16-bit quantization.
    Deterministic: clip i has n_samples = sr + i*1000, amplitude
    0.1 + 0.05*(i%8), frequency (20+i) cycles per buffer."""
    import io
    import wave

    rows = []
    for i in range(n):
        n_samples = sample_rate + i * 1000
        amp = 0.1 + 0.05 * (i % 8)
        cycles = 20 + i
        t = np.arange(n_samples, dtype=np.float64)
        sig = amp * np.sin(2 * np.pi * cycles * t / n_samples)
        pcm = np.clip(np.round(sig * 32767), -32768, 32767).astype("<i2")
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sample_rate)
            w.writeframes(pcm.tobytes())
        rows.append({"audio_id": f"aud-{i:04d}", "bytes": buf.getvalue(),
                     "sample_rate": sample_rate, "n_samples": n_samples,
                     "caption": f"synthetic clip {i} for aud-{i:04d}"})
    return pd.DataFrame(rows)


def make_web_fixture(n_hosts: int = 4, pages_per_host: int = 6, n_images: int = 8,
                     seed: int = 42):
    """Returns (seeds_df, web_pages_df, images_df) as pandas DataFrames."""
    rng = np.random.default_rng(seed)
    images = make_images(n_images, seed=seed)
    pages: list[dict] = []
    hosts = [f"host{i}.example" for i in range(n_hosts)]

    for hi, host in enumerate(hosts):
        base = f"http://{host}"
        # --- robots.txt: policy matrix across hosts (Crawler.js:469-491) ---
        robots_status = [200, 200, 404, 500, 600, 410][hi % 6]
        robots_lines = ["User-agent: *", "Disallow: /private/"]
        if hi % 2 == 0:
            robots_lines.append(f"Sitemap: {base}/sitemap.xml")
        robots_body = "\n".join(robots_lines).encode()
        if robots_status == 200:
            pages.append(_page(f"{base}/robots.txt", host, 200, "text/plain",
                               body=robots_body))
        else:
            pages.append(_page(f"{base}/robots.txt", host, robots_status,
                               "text/plain", body=b""))

        # --- index page with the full selector zoo ---
        page_urls = [f"{base}/page{i}.html" for i in range(1, pages_per_host)]
        noise = ["javascript:alert('x')", "mailto:someone@example.com"]
        cross = [f"http://{hosts[(hi + 1) % n_hosts]}/page1.html"]
        dupes = [page_urls[0]] if page_urls else []
        extra_tags = (
            f'<link href="/alt-{hi}/" hreflang="es" rel="alternate">'
            f'<link href="styles.css" rel="stylesheet">'
            f'<area href="/area-{hi}.html">'
            f'<a href="/page1.html#frag">frag dup</a>'
        )
        pages.append(_page(f"{base}/index.html", host, 200,
                           "text/html; charset=utf-8",
                           body=_html(page_urls + noise + cross + dupes, extra_tags)))
        pages.append(_page(f"{base}/alt-{hi}/", host, 200, "text/html",
                           body=_html([])))
        pages.append(_page(f"{base}/area-{hi}.html", host, 200, "text/html",
                           body=_html([])))

        # --- page tree: each page links to the next, some to private/dead ---
        for i in range(1, pages_per_host):
            links = []
            if i + 1 < pages_per_host:
                links.append(f"page{i + 1}.html")
            if i == 1:
                links.append("/private/secret.html")  # robots-disallowed
                links.append("/missing.html")          # dead link → REQUEST_ERROR... removed from web
            if i == 2:
                links.append("/redirect")
                links.append("/notfound.html")
            status = 200
            pages.append(_page(f"{base}/page{i}.html", host, status,
                               "text/html", body=_html(links)))

        pages.append(_page(f"{base}/private/secret.html", host, 200, "text/html",
                           body=_html([])))
        pages.append(_page(f"{base}/notfound.html", host, 404, "text/html",
                           body=b"gone"))
        # redirect chain: absolute then relative location (Crawler tests :412-444)
        pages.append(_page(f"{base}/redirect", host, 301, "text/html",
                           location=f"{base}/redirect2"))
        pages.append(_page(f"{base}/redirect2", host, 302, "text/html",
                           location="/landing.html"))
        pages.append(_page(f"{base}/landing.html", host, 200, "text/html",
                           body=_html([])))

        # --- sitemaps: index → urlset (+ one gzipped host) ---
        if hi % 2 == 0:
            child = f"{base}/sitemap-pages.xml"
            if hi % 4 == 0:
                child_gz = f"{base}/sitemap-extra.xml.gz"
                pages.append(_page(f"{base}/sitemap.xml", host, 200, "application/xml",
                                   body=_sitemapindex([child, child_gz])))
                gz_body = gzip_mod.compress(_urlset([f"{base}/from-gz-sitemap.html"]))
                pages.append(_page(child_gz, host, 200, "application/x-gzip",
                                   body=gz_body))
                pages.append(_page(f"{base}/from-gz-sitemap.html", host, 200,
                                   "text/html", body=_html([])))
            else:
                pages.append(_page(f"{base}/sitemap.xml", host, 200, "application/xml",
                                   body=_sitemapindex([child])))
            pages.append(_page(child, host, 200, "application/xml",
                               body=_urlset(
                                   [f"{base}/from-sitemap-{k}.html" for k in range(2)],
                                   alternates=[f"{base}/from-sitemap-alt.html"])))
            for k in range(2):
                pages.append(_page(f"{base}/from-sitemap-{k}.html", host, 200,
                                   "text/html", body=_html([])))
            pages.append(_page(f"{base}/from-sitemap-alt.html", host, 200,
                               "text/html", body=_html([])))

        # --- image leaves: binary payload, extension-based mime fallback ---
        for k in range(2):
            img = images.iloc[(hi * 2 + k) % len(images)]
            ext = "png" if img["fmt"] == "png" else "jpg"
            url = f"{base}/media/photo-{k}.{ext}"
            pages.append(_page(url, host, 200,
                               None if k == 0 else f"image/{img['fmt']}",
                               body=bytes(img["bytes"]), image_id=img["image_id"]))
        img_links = [f"/media/photo-{k}.{'png' if images.iloc[(hi*2+k) % len(images)]['fmt']=='png' else 'jpg'}"
                     for k in range(2)]
        pages.append(_page(f"{base}/gallery.html", host, 200, "text/html",
                           body=_html(img_links)))

    web_pages = pd.DataFrame(pages, columns=WEB_PAGES_COLUMNS)
    web_pages = web_pages.drop_duplicates(subset=["url"], keep="first").reset_index(drop=True)
    # sanity: body as bytes, status as int32-able
    web_pages["status_code"] = web_pages["status_code"].astype("int32")

    seed_urls = [f"http://{h}/index.html" for h in hosts]
    seed_urls += [f"http://{hosts[0]}/gallery.html"]
    seeds = pd.DataFrame({"seq": np.arange(len(seed_urls), dtype=np.int64),
                          "url": seed_urls})
    return seeds, web_pages, images


def make_bench_web(n_hosts: int = 500, pages_per_host: int = 20,
                   links_per_page: int = 30, filler_kb: int = 4,
                   seed: int = 42):
    """Large uniform synthetic web for throughput/scaling benches:
    every host gets an allow-all robots.txt and a chain/cross-host page
    graph with duplicate + dead links. Returns (seeds_pdf, web_pages_pdf).
    Bodies carry ~filler_kb of text so the parse kernel does realistic
    per-page work."""
    rng = np.random.default_rng(seed)
    # filler with realistic entropy (compresses ~3-5x like real HTML, not
    # 20x) so parquet split sizing reflects true data volume
    vocab = np.array([f"w{i:04d}" for i in range(4096)])
    words_per_page = filler_kb * 1024 // 6
    pages = []
    for hi in range(n_hosts):
        host = f"bench{hi}.example"
        base = f"http://{host}"
        pages.append(_page(f"{base}/robots.txt", host, 200, "text/plain",
                           body=b"User-agent: *\nDisallow:\n"))
        host_fill = vocab[rng.integers(0, len(vocab),
                                       size=(pages_per_host, words_per_page))]
        for p in range(pages_per_host):
            filler = "<p>" + " ".join(host_fill[p]) + "</p>"
            links = []
            for j in range(links_per_page):
                target = (p * 7 + j) % pages_per_host
                if j % 5 == 4:  # cross-host
                    th = (hi + j) % n_hosts
                    links.append(f"http://bench{th}.example/p{target}.html")
                elif j % 7 == 6:  # duplicate of first link
                    links.append(f"/p{(p * 7) % pages_per_host}.html")
                else:
                    links.append(f"/p{target}.html")
            body = _html(links, filler)
            pages.append(_page(f"{base}/p{p}.html", host, 200, "text/html",
                               body=body))
    web = pd.DataFrame(pages, columns=WEB_PAGES_COLUMNS)
    web["status_code"] = web["status_code"].astype("int32")
    seeds = pd.DataFrame({
        "seq": np.arange(n_hosts, dtype=np.int64),
        "url": [f"http://bench{hi}.example/p0.html" for hi in range(n_hosts)],
    })
    return seeds, web


def make_seed_frontier(n: int, n_hosts: int = 1000, seed: int = 42) -> pd.DataFrame:
    """Large synthetic seed list for frontier/pop/dedup benches (stand-in for
    the 10^10-URL target, parameterized by scale)."""
    i = np.arange(n, dtype=np.int64)
    hosts = (i * 2654435761 % n_hosts)  # Knuth multiplicative scatter
    urls = np.char.add(
        np.char.add("http://host", hosts.astype(str)),
        np.char.add(".example/page", i.astype(str)),
    )
    return pd.DataFrame({"seq": i, "url": urls})
