"""BM25 ranking and Naive Bayes classification vs pure-Python oracles."""

from __future__ import annotations

import math
import re
from collections import Counter

from efficient_graph_algorithms_spark.operators.bm25 import bm25_topk
from efficient_graph_algorithms_spark.operators.classifier import nb_classify


def _norm_tokens(text: str) -> list[str]:
    t = re.sub(r"\s+", " ", text.strip().lower())
    return [w for w in t.split(" ") if w]


DOCS = [
    (0, "spark shuffle join spark spark"),
    (1, "join join window sort"),
    (2, "the quick brown fox jumps over the lazy dog"),
    (3, "spark window"),
    (4, ""),
    (5, "sort sort sort sort sort sort sort sort"),
    (6, "shuffle"),
]


def _bm25_oracle(docs, terms, k, k1=1.2, b=0.75):
    toks = {i: _norm_tokens(t) for i, t in docs}
    n = float(len(docs))
    avgdl = sum(len(v) for v in toks.values()) / n
    df = Counter()
    for i, tk in toks.items():
        for t in set(tk) & set(terms):
            df[t] += 1
    rows = []
    for i, tk in toks.items():
        cnt = Counter(tk)
        s, hits = 0.0, 0
        for t in sorted(set(terms)):
            tf = cnt.get(t, 0)
            if tf == 0:
                continue
            hits += 1
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(tk) / avgdl))
        if hits:
            rows.append((round(s, 6), i, hits))
    rows.sort(key=lambda r: (-r[0], r[1]))
    return [(i, h, s) for s, i, h in rows[:k]]


def test_bm25_matches_oracle(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = [
        (r["doc_id"], r["n_terms"], r["score"])
        for r in bm25_topk(docs, ["spark", "sort", "shuffle"], k=10).collect()
    ]
    assert got == _bm25_oracle(DOCS, ["spark", "sort", "shuffle"], 10)


def test_bm25_term_saturation_and_idf_ordering(spark):
    # tf saturates: doc 5 (sort x8) must NOT score 8x doc 1 (sort x1);
    # and a rarer term out-weighs a common one at equal tf.
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = {r["doc_id"]: r["score"] for r in bm25_topk(docs, ["sort"], k=10).collect()}
    assert set(rows) == {1, 5}
    assert rows[5] < 8 * rows[1]
    assert rows[5] > rows[1]


def test_bm25_rejects_empty_query(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    try:
        bm25_topk(docs, [], k=5)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


LABELED = [
    (100, "spark shuffle join window batch", 1),
    (101, "spark window agg join batch batch", 1),
    (102, "the lazy dog sleeps", 0),
    (103, "the quick brown fox", 0),
    (104, "dog fox dog the the", 0),
]


def _nb_oracle(labeled, docs, alpha=1.0):
    c = {0: Counter(), 1: Counter()}
    n = {0: 0, 1: 0}
    for _, text, y in labeled:
        n[y] += 1
        c[y].update(_norm_tokens(text))
    vocab = set(c[0]) | set(c[1])
    v = float(len(vocab))
    tot = {y: float(sum(c[y].values())) for y in (0, 1)}
    out = {}
    for i, text in docs:
        s = 0.0
        tk = _norm_tokens(text)
        for t in tk:
            s += math.log((c[1].get(t, 0) + alpha) / (tot[1] + alpha * v))
            s -= math.log((c[0].get(t, 0) + alpha) / (tot[0] + alpha * v))
        llr = round(s + math.log(n[1] / n[0]), 6)
        out[i] = (len(tk), llr, 1 if llr > 0 else 0)
    return out


def test_nb_matches_oracle(spark):
    labeled = spark.createDataFrame(LABELED, "doc_id long, text string, label int")
    score_docs = [(i, t) for i, t, _ in LABELED] + [
        (200, "spark join"),           # in-vocab, class-1 words
        (201, "the dog"),              # in-vocab, class-0 words
        (202, "completely novel words"),  # fully out-of-vocabulary
        (203, ""),                     # empty -> bare prior
    ]
    docs = spark.createDataFrame(score_docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["llr"], r["pred"])
        for r in nb_classify(labeled, docs).collect()
    }
    assert got == _nb_oracle(LABELED, score_docs)


def test_nb_separates_training_classes(spark):
    labeled = spark.createDataFrame(LABELED, "doc_id long, text string, label int")
    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in LABELED], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["pred"] for r in nb_classify(labeled, docs).collect()}
    assert got == {i: y for i, _, y in LABELED}
