"""Co-citation / bibliographic coupling vs a pure-Python oracle."""

from __future__ import annotations

from collections import Counter
from itertools import combinations

import numpy as np
import pytest

from efficient_graph_algorithms_spark.operators.cocite import (
    cocitation_pairs,
    cocitation_topk,
    coupling_pairs,
)


def _random_edges(spark, n=60, m=400, seed=17):
    rng = np.random.default_rng(seed)
    pairs = {
        (int(a), int(b))
        for a, b in zip(rng.integers(0, n, m), rng.integers(0, n, m))
        if a != b
    }
    return spark.createDataFrame(sorted(pairs), "src long, dst long"), sorted(pairs)


def _oracle(pairs, key_idx, min_count, cap):
    by_key: dict[int, set[int]] = {}
    for e in pairs:
        by_key.setdefault(e[key_idx], set()).add(e[1 - key_idx])
    cnt: Counter = Counter()
    for items in by_key.values():
        if cap is not None and len(items) > cap:
            continue
        for a, b in combinations(sorted(items), 2):
            cnt[(a, b)] += 1
    return {p: c for p, c in cnt.items() if c >= min_count}


def test_cocitation_matches_oracle(spark):
    edges, pairs = _random_edges(spark)
    got = {
        (r["a"], r["b"]): r["n_common"]
        for r in cocitation_pairs(edges, min_count=2, degree_cap=None).collect()
    }
    assert got == _oracle(pairs, 0, 2, None)


def test_coupling_matches_oracle_with_cap(spark):
    edges, pairs = _random_edges(spark, seed=23)
    got = {
        (r["a"], r["b"]): r["n_common"]
        for r in coupling_pairs(edges, min_count=2, degree_cap=8).collect()
    }
    assert got == _oracle(pairs, 1, 2, 8)


def test_topk_total_order_deterministic(spark):
    edges, pairs = _random_edges(spark, seed=5)
    out, info = cocitation_topk(edges, k=10, min_count=1, degree_cap=None)
    rows = [(r["a"], r["b"], r["n_common"]) for r in out.collect()]
    want = sorted(
        ((a, b, c) for (a, b), c in _oracle(pairs, 0, 1, None).items()),
        key=lambda t: (-t[2], t[0], t[1]),
    )[:10]
    assert rows == want
    assert info["mode"] == "cocitation"
    with pytest.raises(ValueError):
        cocitation_topk(edges, mode="nope")


def test_mirror_pairs(spark):
    """Two sources sharing 3 identical texts pair with n_common=3;
    normalization-insensitive (fingerprint60 is whitespace/case
    collapsed); singletons and sub-threshold overlaps drop out."""
    from efficient_graph_algorithms_spark.operators.cocite import mirror_pairs

    rows = [
        (0, "alpha beta gamma", "s1"), (1, "delta epsilon", "s1"),
        (2, "zeta eta", "s1"),
        (10, "Alpha  Beta   GAMMA", "s2"),     # normalized dup of 0
        (11, "delta epsilon", "s2"), (12, "zeta eta", "s2"),
        (20, "alpha beta gamma", "s3"),        # only ONE shared with s1/s2
        (21, "unique to s3", "s3"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        (r["a"], r["b"]): r["n_common"]
        for r in mirror_pairs(docs, min_shared=2).collect()
    }
    assert got == {("s1", "s2"): 3}


def test_topk_counts_capped_keys(spark):
    # hub 0 links to 5 targets; cap 3 drops it — info reports the count
    edges = spark.createDataFrame(
        [(0, t) for t in range(1, 6)] + [(7, 1), (7, 2), (8, 1), (8, 2)],
        "src long, dst long",
    )
    out, info = cocitation_topk(edges, k=10, min_count=2, degree_cap=3)
    assert info["n_capped_keys"] == 1
    assert {(r.a, r.b, r.n_common) for r in out.collect()} == {(1, 2, 2)}
    _, info0 = cocitation_topk(edges, k=10, min_count=2, degree_cap=None)
    assert info0["n_capped_keys"] == 0
