"""Boilerplate line removal: pure-Python oracle + edge cases + plan shape."""

import re

import pytest

from efficient_graph_algorithms_spark.operators.boilerplate import (
    hot_lines,
    remove_boilerplate_lines,
)

DOCS = [
    # (doc_id, text)
    (1, "unique alpha\nHome | About\nunique beta"),
    (2, "HOME  |  about\nsecond body"),  # normalizes to the same footer key
    (3, "home | about\nthird body\nhome | about"),  # within-doc repeat
    (4, None),  # NULL text -> one empty line, kept
    (5, ""),  # empty text -> one empty line, kept
    (6, "home | about"),  # doc that is ONLY boilerplate -> clean_text ''
    (7, "rare pair\nbody seven"),
    (8, "rare pair\nbody eight"),  # 'rare pair' count 2 < min_count 3
    (9, "gap\n\nafter gap"),  # interior empty line survives
]


def _norm(line: str) -> str:
    return re.sub(r"\s+", " ", line.lower()).strip()


def _oracle(docs, min_count):
    lines = []
    for doc_id, text in docs:
        for pos, line in enumerate((text or "").split("\n")):
            lines.append((doc_id, pos, line, _norm(line)))
    counts: dict[str, int] = {}
    for _, _, _, k in lines:
        if k:
            counts[k] = counts.get(k, 0) + 1
    hot = {k for k, c in counts.items() if c >= min_count}
    out = {}
    for doc_id, _ in docs:
        mine = [x for x in lines if x[0] == doc_id]
        kept = [x for x in mine if x[3] not in hot]
        out[doc_id] = (
            len(mine),
            len(mine) - len(kept),
            "\n".join(line for _, _, line, _ in sorted(kept, key=lambda x: x[1])),
        )
    return out, hot


def test_matches_pure_python_oracle(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_lines"], r["n_removed"], r["clean_text"])
        for r in remove_boilerplate_lines(docs, min_count=3).collect()
    }
    want, hot = _oracle(DOCS, 3)
    assert got == want
    # the footer key is hot (count 5 across docs 1,2,3,3,6); rare isn't
    assert hot == {"home | about"}
    # spot-check the semantics the docstring promises
    assert got[1] == (3, 1, "unique alpha\nunique beta")
    assert got[3] == (3, 2, "third body")  # within-doc repeats both go
    assert got[4] == (1, 0, "")  # NULL text kept as one empty line
    assert got[6] == (1, 1, "")  # all-content-removed doc keeps a row
    assert got[7][1] == 0 and "rare pair" in got[7][2]  # below threshold
    assert got[9] == (3, 0, "gap\n\nafter gap")  # empty line never removed


def test_hot_lines_inspection_face(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["key"]: r["c"] for r in hot_lines(docs, min_count=3).collect()}
    assert got == {"home | about": 5}
    # threshold 2 also surfaces the rare pair
    got2 = {r["key"]: r["c"] for r in hot_lines(docs, min_count=2).collect()}
    assert got2 == {"home | about": 5, "rare pair": 2}


def test_min_count_validation(spark):
    docs = spark.createDataFrame(DOCS[:2], "doc_id long, text string")
    with pytest.raises(ValueError):
        remove_boilerplate_lines(docs, min_count=1)
    with pytest.raises(ValueError):
        hot_lines(docs, min_count=0)


def test_no_cartesian_in_plan(spark):
    """The anti-join against the hot set must stay an equi-join."""
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = remove_boilerplate_lines(docs, min_count=3)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
