"""Deterministic corpus sampling vs a pure-Python oracle."""

from __future__ import annotations

import hashlib

import pytest

from efficient_graph_algorithms_spark.operators.sampling import (
    hash_sample,
    rate_threshold,
    sample_hash60,
    stratified_sample,
)


def _h60(seed: int, doc_id: int) -> int:
    return int(hashlib.md5(f"smpl:{seed}:{doc_id}".encode()).hexdigest()[:15], 16)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, ["the cat sat on the mat with the dog and it was good",
             "der hund und die katze sind nicht mit das haus und der",
             "le chat et le chien sont dans la maison avec les amis et",
             "zzz qqq xxx"][i % 4])
        for i in range(400)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hash_sample_matches_python_oracle(spark, docs):
    got = sorted(r["doc_id"] for r in hash_sample(docs, 0.3, seed=9).collect())
    want = sorted(i for i in range(400) if _h60(9, i) < rate_threshold(0.3))
    assert got == want
    assert 0 < len(got) < 400  # neither empty nor trivial


def test_hash_sample_stable_under_repartitioning(spark, docs):
    a = sorted(r["doc_id"] for r in hash_sample(docs, 0.5, seed=1).collect())
    b = sorted(
        r["doc_id"]
        for r in hash_sample(docs.repartition(13, "text"), 0.5, seed=1).collect()
    )
    assert a == b  # pure function of (id, seed): partitioning-independent


def test_hash_sample_rate_bounds(spark, docs):
    assert hash_sample(docs, 1.0, seed=3).count() == 400
    assert hash_sample(docs, 0.0, seed=3).count() == 0
    with pytest.raises(ValueError):
        rate_threshold(1.5)


def test_stratified_sample_per_stratum_rates(spark, docs):
    """Each stratum is gated by ITS OWN threshold: the kept set per
    language equals the python oracle with that language's rate."""
    rates = {"en": 0.8, "de": 0.2, "fr": 0.5}
    out = stratified_sample(docs, rates, default_rate=0.1, seed=5).collect()
    # recover each doc's stratum via the operator itself at rate 1.0 (keeps all)
    langs = {
        r["doc_id"]: r["stratum"]
        for r in stratified_sample(docs, {}, default_rate=1.0, seed=5).collect()
    }
    want = sorted(
        i
        for i in range(400)
        if _h60(5, i) < rate_threshold(rates.get(langs[i], 0.1))
    )
    assert sorted(r["doc_id"] for r in out) == want
    # strata are real: at least two distinct languages present in the keep set
    assert len({r["stratum"] for r in out}) >= 2


def test_cap_per_key_matches_python_oracle(spark):
    from efficient_graph_algorithms_spark.operators.sampling import cap_per_key

    rows = [(i, f"src{i % 7}", f"text {i}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = sorted(
        (r["doc_id"], r["source"])
        for r in cap_per_key(df, "source", 5, seed=3).collect()
    )
    by_key: dict[str, list[int]] = {}
    for i, s, _ in rows:
        by_key.setdefault(s, []).append(i)
    want = sorted(
        (i, s)
        for s, ids in by_key.items()
        for i in sorted(ids, key=lambda x: (_h60(3, x), x))[:5]
    )
    assert got == want
    # every key capped exactly (all keys have >5 members here)
    from collections import Counter

    assert set(Counter(s for _, s in got).values()) == {5}


def test_cap_per_key_stable_under_repartitioning(spark):
    from efficient_graph_algorithms_spark.operators.sampling import cap_per_key

    rows = [(i, f"s{i % 3}", "t") for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    a = sorted(r["doc_id"] for r in cap_per_key(df, "source", 7).collect())
    b = sorted(
        r["doc_id"]
        for r in cap_per_key(df.repartition(11, "doc_id"), "source", 7).collect()
    )
    assert a == b


def test_cap_per_key_monotone_in_n(spark):
    """Quota monotonicity: the kept set at cap n is a subset of the
    kept set at any larger cap (rank order is fixed by (hash, id)), so
    raising a per-domain budget only ADDS documents — the same
    stability property the rate gate has."""
    from efficient_graph_algorithms_spark.operators.sampling import cap_per_key

    rows = [(i, f"s{i % 5}", "t") for i in range(150)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    kept = {
        n: {r["doc_id"] for r in cap_per_key(df, "source", n, seed=2).collect()}
        for n in (0, 3, 10, 30, 100)
    }
    assert kept[0] == set()
    assert kept[3] <= kept[10] <= kept[30] <= kept[100]
    assert len(kept[3]) == 15 and len(kept[10]) == 50  # 5 keys x min(n, 30)
