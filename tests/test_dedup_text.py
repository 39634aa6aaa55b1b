"""Dedup + text-analysis operators vs pure-Python/NumPy oracles."""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from efficient_graph_algorithms_spark.functions.hashing import md5_60bit, minhash_seeds
from efficient_graph_algorithms_spark.operators.dedup import (
    MINHASH_K,
    SHINGLE_W,
    exact_duplicates,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingles,
    simhash_fingerprints,
    simhash_pairs,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),
    (2, "completely different text with no overlap here at all"),
    (3, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
    (4, "The  Quick  Brown Fox jumps over the lazy dog"),  # normalized dup of 0
    (5, "short"),
]


def _norm(t: str) -> str:
    return re.sub(r"\s+", " ", t.strip().lower())


def _shingles(t: str) -> set[str]:
    w = _norm(t).split(" ")
    if len(w) < SHINGLE_W:
        return {" ".join(w)}
    return {" ".join(w[i : i + SHINGLE_W]) for i in range(len(w) - SHINGLE_W + 1)}


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_shingles_match_python(spark, docs_df):
    got = {
        (r["id"], r["shingle"]) for r in shingles(docs_df).collect()
    }
    exp = {(i, s) for i, t in DOCS for s in _shingles(t)}
    assert got == exp


def test_exact_duplicates(spark, docs_df):
    groups = exact_duplicates(docs_df).collect()
    assert len(groups) == 1
    g = groups[0]
    assert g["n_dups"] == 3 and g["keep_id"] == 0  # 0, 3, 4 normalize equal
    assert g["fp"] == md5_60bit(_norm(DOCS[0][1]))


def test_ngram_jaccard_oracle(spark, docs_df):
    got = {(r["a"], r["b"]): r["jaccard"] for r in ngram_jaccard_pairs(docs_df, threshold=0.0).collect()}
    # brute-force oracle over all pairs sharing >=1 shingle
    ids = [i for i, _ in DOCS]
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            sa, sb = _shingles(DOCS[x][1]), _shingles(DOCS[y][1])
            inter = len(sa & sb)
            if inter == 0:
                assert (x, y) not in got
            else:
                j = round(inter / len(sa | sb), 6)
                assert got[(x, y)] == pytest.approx(j, abs=1e-9)


def test_minhash_signature_oracle(spark, docs_df):
    seeds = minhash_seeds(MINHASH_K, 42)
    sig = minhash_signatures(docs_df).collect()
    got = {(r["id"], r["perm"]): r["minhash"] for r in sig}
    for i, t in DOCS:
        hs = [md5_60bit(s) for s in _shingles(t)]
        for p, seed in enumerate(seeds):
            assert got[(i, p)] == min(h ^ seed for h in hs)


def test_minhash_finds_exact_dups(spark, docs_df):
    pairs = {(r["a"], r["b"]): r["sig_sim"] for r in minhash_lsh_pairs(docs_df, threshold=0.5).collect()}
    assert pairs[(0, 3)] == 1.0 and pairs[(0, 4)] == 1.0 and pairs[(3, 4)] == 1.0
    # near-dup 0 vs 1 share most shingles; should be found with high sim
    assert (0, 1) in pairs


def test_simhash_oracle(spark, docs_df):
    got = {r["id"]: r["simhash"] for r in simhash_fingerprints(docs_df).collect()}
    for i, t in DOCS:
        toks = [w for w in _norm(t).split(" ") if w]
        votes = np.zeros(60, dtype=np.int64)
        for tok in toks:
            h = md5_60bit(tok)
            for b in range(60):
                votes[b] += 1 if (h >> b) & 1 else -1
        exp = sum(1 << b for b in range(60) if votes[b] > 0)
        assert got[i] == exp


def test_simhash_pairs_identical_docs(spark, docs_df):
    pairs = {(r["a"], r["b"]): r["hamming"] for r in simhash_pairs(docs_df, max_hamming=3).collect()}
    assert pairs[(0, 3)] == 0 and pairs[(0, 4)] == 0


# --- text features -----------------------------------------------------------

def test_text_features_python_parity(spark):
    from efficient_graph_algorithms_spark.functions.text import (
        fingerprint60,
        lang_id,
        quality_score,
        token_count,
    )

    rows = [
        (0, "The cat and the dog play in the garden of the house."),
        (1, "Der Hund und die Katze spielen in der Stadt und das ist gut."),
        (2, "Le chat et le chien jouent dans les jardins et la maison est belle."),
        (3, "xyzzy plugh qwerty"),
        (4, ""),
        (5, "   "),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            token_count(F.col("text")).alias("tc"),
            lang_id(F.col("text")).alias("lang"),
            quality_score(F.col("text")).alias("q"),
            fingerprint60(F.col("text")).alias("fp"),
        ).collect()
    }
    assert out[0]["lang"] == "en"
    assert out[1]["lang"] == "de"
    assert out[2]["lang"] == "fr"
    assert out[3]["lang"] == "und"
    assert out[4]["tc"] == 0 and out[5]["tc"] == 0
    assert out[0]["tc"] == len(rows[0][1].split())
    for i, t in rows:
        assert out[i]["fp"] == md5_60bit(re.sub(r"\s+", " ", t.strip().lower()))
        assert 0 <= out[i]["q"] <= 1000


def test_quality_score_monotone_in_length(spark):
    from efficient_graph_algorithms_spark.functions.text import quality_score

    rows = [(0, "the and of to a " * 2), (1, "the and of to a " * 40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["q"] for r in df.select("doc_id", quality_score(F.col("text")).alias("q")).collect()}
    assert got[1] > got[0]


def test_dedup_clusters_transitive(spark):
    """Pair tables are not transitive; clusters must be. Chain
    0~1, 1~2 plus island pair 5~6: reps are the component minima and
    exactly one doc per cluster is kept."""
    from efficient_graph_algorithms_spark.operators.dedup import dedup_clusters

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(8)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6)], "a long, b long"
    )
    out = {
        r["doc_id"]: (r["rep_id"], r["keep"])
        for r in dedup_clusters(spark, docs, pairs=pairs).collect()
    }
    assert out == {
        0: (0, 1), 1: (0, 0), 2: (0, 0),   # chain collapses to min 0
        3: (3, 1), 4: (4, 1),              # unpaired keep themselves
        5: (5, 1), 6: (5, 0), 7: (7, 1),
    }


def test_dedup_clusters_keep_counts(spark, docs_df):
    """End-to-end on the shared fixture: every doc appears exactly once,
    keeps = number of distinct clusters, and every rep is kept."""
    from efficient_graph_algorithms_spark.operators.dedup import dedup_clusters

    rows = dedup_clusters(spark, docs_df, threshold=0.5).collect()
    assert sorted(r["doc_id"] for r in rows) == sorted(d[0] for d in DOCS)
    reps = {r["rep_id"] for r in rows}
    kept = {r["doc_id"] for r in rows if r["keep"] == 1}
    assert reps == kept


def test_dedup_clusters_no_pairs(spark):
    """A corpus with no near-dups: every doc keeps itself (the CC loop
    degenerates gracefully on an empty pair graph)."""
    from efficient_graph_algorithms_spark.operators.dedup import dedup_clusters

    docs = spark.createDataFrame(
        [(i, f"totally unique text {i}") for i in range(5)],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([], "a long, b long")
    rows = sorted(
        (r["doc_id"], r["rep_id"], r["keep"])
        for r in dedup_clusters(spark, docs, pairs=pairs).collect()
    )
    assert rows == [(i, i, 1) for i in range(5)]
