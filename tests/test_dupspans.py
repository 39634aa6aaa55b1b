"""Duplicated-span metrics: pure-Python oracle + edge cases + plan shape."""

import re
from collections import Counter

import pytest

from efficient_graph_algorithms_spark.operators.dupspans import dup_span_stats

DOCS = [
    (1, "a b c d e f"),  # shares window 'a b c d' with doc 2
    (2, "x y a b c d q"),
    (3, "short doc"),  # < width tokens -> 0 windows
    (4, None),
    (5, ""),
    (6, "p q p q p q p q"),  # within-doc repeated window counts
    (7, "u v w x y z zz"),  # all windows unique -> frac 0
]
W = 4


def _oracle(docs, width, min_count):
    wins = []
    for doc_id, text in docs:
        toks = re.sub(r"\s+", " ", (text or "").lower()).strip().split(" ")
        if text is None or not text.strip():
            toks = []
        if len(toks) >= width:
            for i in range(len(toks) - width + 1):
                wins.append((doc_id, " ".join(toks[i : i + width])))
    counts = Counter(w for _, w in wins)
    out = {}
    for doc_id, _ in docs:
        mine = [w for d, w in wins if d == doc_id]
        nd = sum(1 for w in mine if counts[w] >= min_count)
        out[doc_id] = (
            len(mine),
            nd,
            round(nd / len(mine), 6) if mine else 0.0,
        )
    return out


def test_matches_pure_python_oracle(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_windows"], r["n_dup_windows"], r["dup_window_frac"])
        for r in dup_span_stats(docs, width=W, min_count=2).collect()
    }
    assert got == _oracle(DOCS, W, 2)
    # the cross-doc shared window is found on both sides
    assert got[1] == (3, 1, 0.333333) and got[2] == (4, 1, 0.25)
    # short/NULL/empty docs keep a 0-row
    assert got[3] == (0, 0, 0.0) and got[4] == (0, 0, 0.0) and got[5] == (0, 0, 0.0)
    # within-doc repeats are corpus duplication: 'p q p q' x3 of 5 wins,
    # 'q p q p' x2 -> every window duplicated
    assert got[6] == (5, 5, 1.0)
    assert got[7][2] == 0.0


def test_exact_duplicate_docs_hit_frac_one(spark):
    base = [(1, "one two three four five six seven eight nine ten")]
    docs = spark.createDataFrame(
        base + [(100001, base[0][1])], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["dup_window_frac"]
        for r in dup_span_stats(docs, width=8, min_count=2).collect()
    }
    assert got == {1: 1.0, 100001: 1.0}


def test_min_count_validation_and_plan(spark):
    docs = spark.createDataFrame(DOCS[:2], "doc_id long, text string")
    with pytest.raises(ValueError):
        dup_span_stats(docs, min_count=1)
    plan = (
        dup_span_stats(docs, width=W)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
