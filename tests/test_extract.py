"""Extraction invariants: byte-identical text per url, partition-count
invariance, generator determinism."""

from __future__ import annotations

import numpy as np

from efficient_graph_algorithms_spark.functions.extract import (
    extract_hrefs,
    extract_text,
    normalize_url,
)
from efficient_graph_algorithms_spark.sources.pages import pages_df, pages_pandas


def test_extract_text_pure():
    html = b'<html><head><title>T</title></head><body><p>hello  world</p><a href="https://x.example/a#frag">L</a></body></html>'
    assert extract_text(html) == "T\nhello world\nL"
    assert extract_text(html) == extract_text(html.decode())
    assert extract_hrefs(html) == ["https://x.example/a"]


def test_normalize_url():
    assert normalize_url("HTTPS://Host.EXample/Path#x") == "https://host.example/Path"
    assert normalize_url("https://h.example/p/") == "https://h.example/p"
    assert normalize_url("https://h.example/") == "https://h.example/"


def test_generator_text_matches_extractor(tiny_pages_pd):
    for html, text in zip(tiny_pages_pd["html"], tiny_pages_pd["text"]):
        assert extract_text(html) == text


def test_generator_deterministic():
    a = pages_pandas(100, seed=42)
    b = pages_pandas(100, seed=42)
    assert a.equals(b)
    c = pages_pandas(100, seed=7)
    assert not a["html"].equals(c["html"])


def test_generator_shape(tiny_pages_pd):
    p = tiny_pages_pd
    assert list(p.columns) == ["url", "warc_ts", "html", "text", "lang"]
    assert p["url"].is_unique
    assert set(p["lang"]) <= {"en", "de", "fr"}
    # ~2% dangling pages
    n_dangling = sum(1 for h in p["html"] if b"<a " not in h)
    assert 0 < n_dangling < len(p) * 0.1


def test_spark_generation_matches_pandas_any_partitioning(spark, tiny_pages_pd):
    for parts in (2, 7):
        sdf = pages_df(spark, 300, seed=42, partitions=parts).orderBy("url").toPandas()
        pdf = tiny_pages_pd.sort_values("url").reset_index(drop=True)
        assert list(sdf["url"]) == list(pdf["url"])
        assert [bytes(x) for x in sdf["html"]] == [bytes(x) for x in pdf["html"]]
        assert list(sdf["text"]) == list(pdf["text"])


def test_spark_udf_extraction_byte_identical(spark, tiny_pages_pd):
    from efficient_graph_algorithms_spark.functions.extract import extract_text_udf
    import pyspark.sql.functions as F

    sdf = pages_df(spark, 300, seed=42, partitions=3)
    bad = sdf.where(extract_text_udf(F.col("html")) != F.col("text")).count()
    assert bad == 0


def test_hub_skew_exists():
    """A few targets should carry orders of magnitude more in-links."""
    from tests.conftest import edges_from_pages_pd

    _, edges = edges_from_pages_pd(pages_pandas(2000, seed=42))
    counts = np.bincount(edges[:, 1])
    assert counts.max() >= 20 * max(1.0, counts.mean())


def test_jvm_href_expr_matches_python_oracle(spark, tiny_pages_pd):
    """extract_hrefs_expr (pure column expressions, whole-stage codegen)
    must be element-exact vs the Python oracle — synthetic corpus plus
    adversarial html the generator never emits."""
    import pyspark.sql.functions as F

    from efficient_graph_algorithms_spark.functions.extract import (
        extract_hrefs,
        extract_hrefs_expr,
    )

    adversarial = [
        b"<a href='https://A.Example/X/'>single-quoted + trailing slash</a>",
        b'<a class="x" HREF="https://h.example/p#frag">attr-order, caps</a>',
        b'<a href="  https://pad.example/q  ">padded</a>',
        b'<a href="">empty</a><a href="https://ok.example/r">after-empty</a>',
        b'<a\nhref="https://multi.example/line">newline in tag</a>',
        b'no links at all',
        b'<a href="relative/path">relative (kept verbatim, no base)</a>',
        b'<a href="https://dup.example/s">1</a><a href="https://dup.example/s">2</a>',
        "<a href='https://uni.example/café'>unicode</a>".encode(),
        b'<a data-href="https://no.example/skip">not an href attr</a>'
        b'<a href="https://yes.example/t">real</a>',
        # NBSP around `=` and inside the quotes: Python \s / str.strip()
        # are Unicode-aware, so the JVM pattern must carry (?U)
        "<a href\u00a0=\u00a0'https://nbsp.example/u'>nbsp eq</a>".encode(),
        "<a href='\u00a0https://nbsp2.example/v\u00a0'>nbsp padded</a>".encode(),
        # U+001C-001F are whitespace to Python's re \s / str.strip() but
        # NOT to Java's (?U)\s (White_Space property) - the JVM pattern
        # must match them explicitly or the two paths emit different urls
        b"<a href='\x1chttps://Ctrl.example/w\x1f'>ctrl padded</a>",
        b"<a href\x1c=\x1d'https://ctrl2.example/x'>ctrl eq</a>",
    ]
    rows = [(u, bytes(h)) for u, h in zip(tiny_pages_pd["url"], tiny_pages_pd["html"])]
    rows += [(f"adv{i}", h) for i, h in enumerate(adversarial)]
    df = spark.createDataFrame(rows, "url string, html binary").repartition(5)
    got = {
        r["url"]: list(r["hrefs"])
        for r in df.select("url", extract_hrefs_expr(F.col("html")).alias("hrefs")).collect()
    }
    for url, html in rows:
        assert got[url] == extract_hrefs(html), url
