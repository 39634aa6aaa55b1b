"""Feature hashing vs a pure-Python mirror (same portable md5 hashes)."""

from __future__ import annotations

import re
from collections import defaultdict

import pytest

from efficient_graph_algorithms_spark.functions.hashing import md5_60bit
from efficient_graph_algorithms_spark.operators.hashvec import (
    hashed_feature_norms,
    hashed_features,
)

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "dog Dog  DOG"),
    (2, None),
    (3, "collision test collision test"),
    (4, ""),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def py_features(dim, signed=True):
    out = defaultdict(int)
    for did, t in DOCS:
        norm = re.sub(r"\s+", " ", (t or "").strip().lower())
        for term in norm.split(" "):
            if not term:
                continue
            b = md5_60bit(f"hv:{term}") % dim
            s = (md5_60bit(f"hvs:{term}") % 2) * 2 - 1 if signed else 1
            out[(did, b)] += s
    return {k: v for k, v in out.items() if v != 0}


@pytest.mark.parametrize("dim,signed", [(16, True), (16, False), (4096, True)])
def test_matches_python_mirror(spark, dim, signed):
    got = {
        (r["doc_id"], r["dim"]): r["value"]
        for r in hashed_features(_docs(spark), dim=dim, signed=signed).collect()
    }
    assert got == py_features(dim, signed)


def test_norms_and_nnz(spark):
    dim = 32
    feats = hashed_features(_docs(spark), dim=dim)
    norms = {
        r["doc_id"]: (r["nnz"], r["sq_norm"])
        for r in hashed_feature_norms(feats).collect()
    }
    want = defaultdict(lambda: [0, 0])
    for (did, _), v in py_features(dim).items():
        want[did][0] += 1
        want[did][1] += v * v
    assert norms == {k: tuple(v) for k, v in want.items()}
    assert 2 not in norms and 4 not in norms  # null/empty docs vanish


def test_unsigned_matches_plain_counts(spark):
    """signed=False at huge dim = exact per-term counts scattered."""
    got = hashed_features(_docs(spark), dim=1 << 20, signed=False).collect()
    vals = sorted(r["value"] for r in got if r["doc_id"] == 0)
    assert vals == [1, 1, 1, 1, 2]  # cat/sat/on/mat=1, the=2


def test_bad_dim_raises(spark):
    with pytest.raises(ValueError, match="dim"):
        hashed_features(_docs(spark), dim=0)
