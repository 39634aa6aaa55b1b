"""Anchor-text extraction: JVM expression path vs the pure-Python
oracle, element-exact, plus the term-count operator."""

from __future__ import annotations

import pyspark.sql.functions as F

from efficient_graph_algorithms_spark.functions.extract import (
    extract_anchor_pairs,
)
from efficient_graph_algorithms_spark.sources.edges import (
    anchor_term_counts,
    raw_anchor_pairs,
)

ADVERSARIAL = [
    b"<a href='https://A.Example/X/'>Mixed <b>bold</b> text</a>",
    b'<a class="x" HREF="https://h.example/p#frag">attr-order, caps</a>',
    b'<a href="  https://pad.example/q  ">  padded\thref and text </a>',
    b'<a href="">empty href dropped</a><a href="https://ok.example/r"></a>',
    b'<a\nhref="https://multi.example/line">newline\nin text</a>',
    b"no links at all",
    b'<a href="https://dup.example/s">one</a><a href="https://dup.example/s">two</a>',
    "<a href='https://uni.example/café'>café anchor</a>".encode(),
    b'<a href="https://attrs.example/t" rel="nofollow" target="_blank">with attrs</a>',
    b'<a href="https://nest.example/u"><span class="s">nested <i>tags</i></span></a>',
]


def test_pure_extractor_closed_forms():
    got = extract_anchor_pairs(
        b'<a href="https://x.example/A#f" rel="y">  Hello <b>World</b> </a>'
        b'<a href="">skip</a><a href=\'https://y.example/b/\'></a>'
    )
    assert got == [
        ("https://x.example/A", "Hello World"),
        ("https://y.example/b", ""),
    ]


def test_jvm_anchor_expr_matches_python_oracle(spark, tiny_pages_pd):
    htmls = list(tiny_pages_pd["html"]) + ADVERSARIAL
    urls = [f"u{i}" for i in range(len(htmls))]
    pages = spark.createDataFrame(
        list(zip(urls, htmls)), "url string, html binary"
    )
    want = []
    for u, h in zip(urls, htmls):
        for href, text in extract_anchor_pairs(h):
            want.append((u, href, text))
    for jvm in (True, False):
        got = [
            (r["src_url"], r["dst_url"], r["anchor"])
            for r in raw_anchor_pairs(pages, jvm=jvm)
            .orderBy("src_url", "dst_url", "anchor")
            .collect()
        ]
        assert got == sorted(want), f"jvm={jvm}"


def test_anchor_term_counts_closed_form(spark):
    pages = spark.createDataFrame(
        [
            (
                "p1",
                b'<a href="https://t.example/a">Best Spark Guide</a>'
                b'<a href="https://t.example/b"></a>',
            ),
            ("p2", b'<a href="https://t.example/a">spark guide</a>'),
        ],
        "url string, html binary",
    )
    got = {
        (r["dst_url"], r["term"]): r["n"]
        for r in anchor_term_counts(pages).collect()
    }
    assert got == {
        ("https://t.example/a", "best"): 1,
        ("https://t.example/a", "spark"): 2,
        ("https://t.example/a", "guide"): 2,
    }
