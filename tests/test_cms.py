"""Count-min sketch vs a pure-Python mirror (same portable md5 hash)."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from efficient_graph_algorithms_spark.functions.hashing import md5_60bit
from efficient_graph_algorithms_spark.operators.cms import (
    cms_build,
    cms_estimate,
    cms_heavy_hitters,
    corpus_terms,
)

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the log"),
    (2, "cat and dog and cat"),
    (3, None),  # null text must contribute nothing
    (4, "  The   CAT\tsat  "),  # normalization: lower + whitespace collapse
    (5, ""),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def py_terms():
    import re

    out = []
    for _, t in DOCS:
        norm = re.sub(r"\s+", " ", (t or "").strip().lower())
        out += [w for w in norm.split(" ") if w]
    return out


def py_sketch(depth, width):
    sk = {(d, b): 0 for d in range(depth) for b in range(width)}
    for term in py_terms():
        for d in range(depth):
            sk[(d, md5_60bit(f"cms{d}:{term}") % width)] += 1
    return sk


def test_sketch_matches_python_mirror(spark):
    depth, width = 3, 16
    got = {
        (r["d"], r["bucket"]): r["cnt"]
        for r in cms_build(_docs(spark), depth=depth, width=width).collect()
    }
    assert got == py_sketch(depth, width)
    assert len(got) == depth * width  # fixed shape, zeros included


def test_estimates_dominate_exact_counts(spark):
    depth, width = 3, 8  # tiny width → collisions guaranteed
    docs = _docs(spark)
    sketch = cms_build(docs, depth=depth, width=width)
    exact = Counter(py_terms())
    cands = spark.createDataFrame([(t,) for t in exact], "term string")
    est = {
        r["term"]: r["estimate"]
        for r in cms_estimate(sketch, cands, width=width).collect()
    }
    assert set(est) == set(exact)
    for t, c in exact.items():
        assert est[t] >= c  # CMS never undercounts
    # python mirror of the min-over-rows estimate agrees exactly
    sk = py_sketch(depth, width)
    for t in exact:
        want = min(sk[(d, md5_60bit(f"cms{d}:{t}") % width)] for d in range(depth))
        assert est[t] == want


def test_heavy_hitters_no_false_negatives(spark):
    docs = _docs(spark)
    sketch = cms_build(docs, depth=3, width=8)
    hh = cms_heavy_hitters(docs, sketch, min_count=3, width=8).collect()
    got = {r["term"]: (r["estimate"], r["exact"]) for r in hh}
    exact = Counter(py_terms())
    true_heavy = {t for t, c in exact.items() if c >= 3}
    assert true_heavy <= set(got)  # sketch filter keeps every true hitter
    for t, (e, x) in got.items():
        assert x == exact[t] and e >= x


def test_wide_sketch_is_exact(spark):
    """With width ≫ distinct terms and no collisions, estimate == exact."""
    docs = _docs(spark)
    sketch = cms_build(docs, depth=4, width=4096)
    exact = Counter(py_terms())
    cands = spark.createDataFrame([(t,) for t in exact], "term string")
    est = {
        r["term"]: r["estimate"]
        for r in cms_estimate(sketch, cands, width=4096).collect()
    }
    assert est == dict(exact)


def test_null_and_empty_docs_contribute_nothing(spark):
    n = corpus_terms(
        _docs(spark).where(F.col("doc_id").isin(3, 5))
    ).count()
    assert n == 0


def test_bad_params_raise(spark):
    with pytest.raises(ValueError, match="depth and width"):
        cms_build(_docs(spark), depth=0, width=8)
