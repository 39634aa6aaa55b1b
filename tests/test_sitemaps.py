"""Sitemap XML parsing vs a pure-Python regex mirror, over urlset,
sitemapindex, entity-escaped urls, missing lastmod, attributes on
tags, malformed tails, and empty bodies."""

from __future__ import annotations

import re

from efficient_graph_algorithms_spark.operators.sitemaps import parse_sitemaps

BODIES = {
    "h1": (
        '<?xml version="1.0"?>\n'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
        "<url><loc>https://h1/p1</loc><lastmod>2026-01-02</lastmod></url>\n"
        "<url><loc> https://h1/p2?a=1&amp;b=2 </loc></url>\n"
        "<url><changefreq>daily</changefreq></url>\n"  # no loc: dropped
        "</urlset>"
    ),
    "h2": (
        "<sitemapindex>"
        "<sitemap><loc>https://h2/s0.xml</loc>"
        "<lastmod>2026-02-03T04:05:06Z</lastmod></sitemap>"
        "<sitemap><loc>https://h2/s1.xml</loc></sitemap>"
        "</sitemapindex>"
    ),
    "h3": (
        '<urlset><url data-x="1"><loc>https://h3/&lt;odd&gt;</loc></url>'
        "<url><loc>https://h3/trunc"  # truncated body: entry unclosed
    ),
    "h4": "",
    "h5": "not xml at all",
}


def mirror(body: str):
    out = []
    for pat, kind in (
        (r"(?s)<url(?:\s[^>]*)?>(.*?)</url>", "url"),
        (r"(?s)<sitemap(?:\s[^>]*)?>(.*?)</sitemap>", "sitemap"),
    ):
        for e in re.findall(pat, body or ""):
            m = re.search(r"(?s)<loc[^>]*>\s*(.*?)\s*</loc>", e)
            if not m:
                continue
            url = m.group(1)
            for ent, ch in (
                ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                ("&apos;", "'"), ("&amp;", "&"),
            ):
                url = url.replace(ent, ch)
            if not url:
                continue
            lm = re.search(r"(?s)<lastmod[^>]*>\s*(.*?)\s*</lastmod>", e)
            out.append((kind, url, lm.group(1) if lm and lm.group(1) else None))
    return out


def test_sitemaps_match_mirror(spark):
    df = spark.createDataFrame(
        list(BODIES.items()), "host string, sitemap_xml string"
    )
    got = sorted(
        (r["host"], r["kind"], r["url"], r["lastmod"])
        for r in parse_sitemaps(df).collect()
    )
    want = sorted(
        (h, k, u, lm) for h, b in BODIES.items() for k, u, lm in mirror(b)
    )
    assert got == want


def test_sitemaps_expected_rows(spark):
    df = spark.createDataFrame(
        list(BODIES.items()), "host string, sitemap_xml string"
    )
    rows = {
        (r["host"], r["url"]): (r["kind"], r["lastmod"])
        for r in parse_sitemaps(df).collect()
    }
    assert rows[("h1", "https://h1/p1")] == ("url", "2026-01-02")
    # whitespace stripped, &amp; unescaped
    assert rows[("h1", "https://h1/p2?a=1&b=2")] == ("url", None)
    assert rows[("h2", "https://h2/s0.xml")] == ("sitemap", "2026-02-03T04:05:06Z")
    assert rows[("h2", "https://h2/s1.xml")] == ("sitemap", None)
    # attribute on <url>, entity-escaped angle brackets
    assert rows[("h3", "https://h3/<odd>")] == ("url", None)
    # the truncated entry, no-loc entry, empty and non-xml bodies yield nothing
    assert len(rows) == 5
