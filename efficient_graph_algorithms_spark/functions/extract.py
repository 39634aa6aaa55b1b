"""HTML → text / href extraction.

The per-row invariant from the task's input hint: *byte-identical
extracted text per url*. We guarantee it by having exactly ONE pure
Python extractor (`extract_text`, `extract_hrefs`) used everywhere —
by the synthetic pages generator (so pages.text == extract_text(html)
by construction), by the NumPy oracle, and inside the Arrow pandas
UDFs below. No locale, no encoding drift (explicit utf-8 with
errors='replace'), no version-dependent parser.

The reference's analogous step is mesh→adjacency extraction
(``reference src/ega/util/mesh_utils.py:41-73``): source payload in,
edge list out. Here payload = html bytes, edges = normalized hrefs.

All Spark-side application is vectorized (Arrow scalar pandas_udf over
batches) — never per-row Python UDFs.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

_TITLE_RE = re.compile(r"<title[^>]*>(.*?)</title>", re.S | re.I)
_P_RE = re.compile(r"<p[^>]*>(.*?)</p>", re.S | re.I)
_A_RE = re.compile(r"<a\b[^>]*>(.*?)</a>", re.S | re.I)
_HREF_RE = re.compile(r"""<a\b[^>]*?href\s*=\s*["']([^"']+)["']""", re.S | re.I)
_ANCHOR_PAIR_RE = re.compile(
    r"""<a\b[^>]*?href\s*=\s*["']([^"']+)["'][^>]*>(.*?)</a>""", re.S | re.I
)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"[ \t\r\f\v]+")


def _clean(fragment: str) -> str:
    """Strip inner tags and collapse horizontal whitespace."""
    return _WS_RE.sub(" ", _TAG_RE.sub(" ", fragment)).strip()


def extract_text(html: bytes | str) -> str:
    """Visible text of a page: title, <p> bodies, <a> anchor texts.

    Joined with single '\\n' separators — a stable, order-preserving,
    byte-deterministic rule.
    """
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    parts: list[str] = []
    m = _TITLE_RE.search(html)
    if m:
        t = _clean(m.group(1))
        if t:
            parts.append(t)
    for m2 in _P_RE.finditer(html):
        t = _clean(m2.group(1))
        if t:
            parts.append(t)
    for m3 in _A_RE.finditer(html):
        t = _clean(m3.group(1))
        if t:
            parts.append(t)
    return "\n".join(parts)


def normalize_url(url: str) -> str:
    """Canonical url form: lowercase scheme+authority, strip fragment,
    strip trailing slash (but keep a bare authority's root)."""
    url = url.strip()
    if "#" in url:
        url = url.split("#", 1)[0]
    if "://" in url:
        scheme, rest = url.split("://", 1)
        if "/" in rest:
            host, path = rest.split("/", 1)
            url = scheme.lower() + "://" + host.lower() + "/" + path
        else:
            url = scheme.lower() + "://" + rest.lower()
    if url.endswith("/") and url.count("/") > 3:
        url = url.rstrip("/")
    return url


def extract_hrefs(html: bytes | str, base_url: str | None = None) -> list[str]:
    """All normalized absolute hrefs in document order (duplicates kept;
    dedup is a relational decision downstream, not the extractor's)."""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    out: list[str] = []
    for m in _HREF_RE.finditer(html):
        href = m.group(1).strip()
        if not href:
            continue
        if "://" not in href and base_url:
            base = base_url.rsplit("/", 1)[0]
            href = base + "/" + href.lstrip("/")
        out.append(normalize_url(href))
    return out


def extract_anchor_pairs(
    html: bytes | str, base_url: str | None = None
) -> list[tuple[str, str]]:
    """(normalized href, cleaned anchor text) pairs in document order —
    the anchor-text signal of web search/quality pipelines. Same href
    strip/normalize rules as `extract_hrefs`; anchor text cleaned like
    `extract_text`'s fragments (inner tags stripped, horizontal
    whitespace collapsed) and may be ''."""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    out: list[tuple[str, str]] = []
    for m in _ANCHOR_PAIR_RE.finditer(html):
        href = m.group(1).strip()
        if not href:
            continue
        if "://" not in href and base_url:
            base = base_url.rsplit("/", 1)[0]
            href = base + "/" + href.lstrip("/")
        out.append((normalize_url(href), _clean(m.group(2))))
    return out


# --- Arrow-vectorized Spark UDFs (batch pandas in, batch pandas out) -------

@F.pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(extract_text)


@F.pandas_udf(ArrayType(StringType()))
def extract_hrefs_udf(html: pd.Series) -> pd.Series:
    return html.map(extract_hrefs)


@F.pandas_udf(
    ArrayType(
        StructType(
            [
                StructField("href", StringType()),
                StructField("text", StringType()),
            ]
        )
    )
)
def extract_anchor_pairs_udf(html: pd.Series) -> pd.Series:
    return html.map(
        lambda h: [{"href": a, "text": t} for a, t in extract_anchor_pairs(h)]
    )


# --- JVM-side href extraction (whole-stage-codegen hot path) ---------------
#
# Same semantics as `extract_hrefs(html, base_url=None)` re-expressed as
# built-in column expressions, so the biggest scan of the pipeline (regex
# over every page's full html) never leaves the JVM — no Arrow transfer,
# no Python worker. `extract_hrefs` stays the oracle: a pytest asserts
# element-exact equality on the synthetic corpus plus adversarial html.
#
# Parity envelope (documented, tested): byte streams that are valid UTF-8
# decode identically. All \s uses carry the (?U) flag so Java's
# whitespace class is Unicode-aware like Python's — both the \s* around
# `href=` in the match pattern (an NBSP there would otherwise be missed
# only by the JVM path) and the strip step (Python str.strip() strips
# exotic Unicode spaces). One residual gap (?U) does NOT close: Python's
# re \s / str.strip() also treat U+001C-001F (file/group/record/unit
# separators) as whitespace while Java's White_Space property excludes
# them — hence the explicit [\s\x1c-\x1f] class everywhere below.

_WS_CLS = r"[\s\x1c-\x1f]"
_HREF_SQL_PAT = (
    r"""(?siU)<a\b[^>]*?href""" + _WS_CLS + r"""*=""" + _WS_CLS
    + r"""*["']([^"']+)["']"""
)
_STRIP_PAT = rf"(?U)^{_WS_CLS}+|{_WS_CLS}+$"


def _normalize_url_col(u):
    """Column-expression mirror of `normalize_url` (same steps, same order)."""
    u = F.regexp_replace(u, _STRIP_PAT, "")
    u = F.substring_index(u, "#", 1)
    scheme = F.substring_index(u, "://", 1)
    rest = F.substring(u, F.length(scheme) + 4, F.length(u))
    host = F.substring_index(rest, "/", 1)
    path = F.substring(rest, F.length(host) + 2, F.length(u))
    with_auth = F.when(
        rest.contains("/"),
        F.concat(F.lower(scheme), F.lit("://"), F.lower(host), F.lit("/"), path),
    ).otherwise(F.concat(F.lower(scheme), F.lit("://"), F.lower(rest)))
    u = F.when(u.contains("://"), with_auth).otherwise(u)
    n_slash = F.length(u) - F.length(F.regexp_replace(u, "/", ""))
    return F.when(
        u.endswith("/") & (n_slash > 3), F.regexp_replace(u, "/+$", "")
    ).otherwise(u)


_ANCHOR_ELEM_SQL_PAT = (
    r"""(?siU)<a\b[^>]*?href""" + _WS_CLS + r"""*=""" + _WS_CLS
    + r"""*["']([^"']+)["'][^>]*>(.*?)</a>"""
)
# Python's _WS_RE is [ \t\r\f\v]+ where \v is U+000B only; Java's \v is
# the whole VERTICAL-whitespace class, so spell it \x0B explicitly.
_HORIZ_WS_SQL = r"[ \t\r\f\x0B]+"


def extract_anchor_pairs_expr(html) -> "F.Column":
    """array<struct<href,text>> — JVM mirror of `extract_anchor_pairs`
    (no base_url, like extract_hrefs_expr): extract whole <a> elements
    (group 0), then per element re-apply the same two-group pattern for
    the href (strip + normalize) and the anchor text (inner tags → ' ',
    horizontal whitespace collapsed, Python-strip ends). Empty-href
    anchors are dropped; empty TEXT is kept, as the oracle does."""
    s = F.decode(html, "UTF-8")
    elems = F.regexp_extract_all(s, F.lit(_ANCHOR_ELEM_SQL_PAT), F.lit(0))
    href_of = lambda e: F.regexp_replace(  # noqa: E731
        F.regexp_extract(e, _ANCHOR_ELEM_SQL_PAT, 1), _STRIP_PAT, ""
    )
    text_of = lambda e: F.regexp_replace(  # noqa: E731
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_extract(e, _ANCHOR_ELEM_SQL_PAT, 2),
                r"<[^>]+>",
                " ",
            ),
            _HORIZ_WS_SQL,
            " ",
        ),
        _STRIP_PAT,
        "",
    )
    kept = F.filter(elems, lambda e: href_of(e) != F.lit(""))
    return F.transform(
        kept,
        lambda e: F.struct(
            _normalize_url_col(href_of(e)).alias("href"),
            text_of(e).alias("text"),
        ),
    )


def extract_hrefs_expr(html) -> "F.Column":
    """array<string> of normalized absolute hrefs in document order —
    JVM equivalent of ``extract_hrefs_udf`` (absolute-href corpus; the
    relative-resolution branch lives only in the Python oracle, which the
    Spark path has never exercised: ``raw_link_pairs`` passes no base)."""
    s = F.decode(html, "UTF-8")
    raw = F.regexp_extract_all(s, F.lit(_HREF_SQL_PAT), F.lit(1))
    stripped = F.transform(raw, lambda h: F.regexp_replace(h, _STRIP_PAT, ""))
    nonempty = F.filter(stripped, lambda h: h != F.lit(""))
    return F.transform(nonempty, _normalize_url_col)
