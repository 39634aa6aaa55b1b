"""Sitemap XML parsing (sitemaps.org protocol) — the crawl-discovery
path the robots ``Sitemap:`` directive points at.

Both document kinds are handled: ``<urlset>`` bodies yield page
entries (kind ``url``), ``<sitemapindex>`` bodies yield child-sitemap
entries (kind ``sitemap``) that the frontier fetches and feeds back
through this same operator.  Per entry the ``<loc>`` url (with the
five standard XML entities unescaped — the protocol REQUIRES urls to
be entity-escaped, so ``&amp;`` in query strings is the norm, not an
edge case) and the optional ``<lastmod>`` stamp (useful for
recrawl scheduling against the snapshot-diff operator).

Deliberately regex-based rather than an XML parser, matching the
engine's href-extraction philosophy (`functions/extract.py`): real
crawl sitemaps are frequently truncated or slightly malformed, and a
salvaging scan beats a strict parser that rejects the whole body.
Everything is JVM whole-stage codegen: regexp_extract_all per body,
higher-order transform/filter over the element arrays, one explode —
no Python in the path.  Bodies are protocol-capped at 50 MB / 50k
entries, so the per-row fan-out is bounded by protocol, not data.

No counterpart in ``reference src/ega``; engine extension in the
§2.12 web-pipeline family (robots/frontier/redirects siblings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# element bodies; [\s>] after the tag name so <urlset>/<sitemapindex>
# never match their entry tags
_URL_ELEM = r"(?s)<url(?:\s[^>]*)?>(.*?)</url>"
_SMAP_ELEM = r"(?s)<sitemap(?:\s[^>]*)?>(.*?)</sitemap>"
_LOC = r"(?s)<loc[^>]*>\s*(.*?)\s*</loc>"
_LASTMOD = r"(?s)<lastmod[^>]*>\s*(.*?)\s*</lastmod>"


def _unescape(c):
    # &amp; strictly LAST so double-escaped text is not double-unescaped
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&apos;", "'"),
        ("&amp;", "&"),
    ):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def parse_sitemaps(
    sitemaps: DataFrame,
    host_col: str = "host",
    xml_col: str = "sitemap_xml",
) -> DataFrame:
    """(host, kind, url, lastmod) — one row per ``<url>`` entry
    (kind ``url``) and per ``<sitemapindex>`` child (kind
    ``sitemap``); ``lastmod`` is NULL when absent.  Entries without a
    ``<loc>`` are dropped."""
    s = F.coalesce(F.col(xml_col), F.lit(""))

    def entries(elem_pat: str, kind: str):
        return F.transform(
            F.regexp_extract_all(s, F.lit(elem_pat), F.lit(1)),
            lambda e: F.struct(
                F.lit(kind).alias("kind"),
                _unescape(F.regexp_extract(e, _LOC, 1)).alias("url"),
                F.nullif(F.regexp_extract(e, _LASTMOD, 1), F.lit("")).alias(
                    "lastmod"
                ),
            ),
        )

    both = F.concat(entries(_URL_ELEM, "url"), entries(_SMAP_ELEM, "sitemap"))
    return (
        sitemaps.select(
            F.col(host_col).alias("host"), F.explode(both).alias("e")
        )
        .where(F.col("e.url") != "")
        .select("host", "e.kind", "e.url", "e.lastmod")
    )
