"""Bigram-LM perplexity scoring vs a pure-Python oracle, including the
held-out backoff paths the self-scored parity query never exercises."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest

from efficient_graph_algorithms_spark.operators.lm import (
    score_perplexity,
    train_bigram_lm,
)

TRAIN = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat on the log"),
    (3, "a cat and a dog"),
    (4, ""),  # no bigrams, still counts toward nothing
    (5, "single"),
]
K = 0.1


def _toks(text):
    t = re.sub(r"\s+", " ", (text or "").lower()).strip()
    return t.split(" ") if t else []


def _oracle(train, score, k):
    bigrams = []
    vocab = set()
    for _, text in train:
        ws = _toks(text)
        vocab |= set(ws)
        bigrams += list(zip(ws, ws[1:]))
    c2 = Counter(bigrams)
    c1 = Counter(w1 for w1, _ in bigrams)
    v = len(vocab)
    out = {}
    for doc_id, text in score:
        ws = _toks(text)
        pairs = list(zip(ws, ws[1:]))
        s = sum(
            math.log((c2.get(p, 0) + k) / (c1.get(p[0], 0) + k * v))
            for p in pairs
        )
        out[doc_id] = (len(pairs), round(s, 9))
    return out, v


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_self_scoring_matches_oracle(spark):
    docs = _df(spark, TRAIN)
    c2, c1, v = train_bigram_lm(docs)
    want, v_want = _oracle(TRAIN, TRAIN, K)
    assert v == v_want == 10  # the cat sat on mat dog log a and single
    got = {
        r["doc_id"]: (r["n_bigrams"], round(r["sum_logp"], 9))
        for r in score_perplexity(docs, c2, c1, v, k=K).collect()
    }
    assert got == want
    assert got[4] == (0, 0.0) and got[5] == (0, 0.0)


def test_held_out_backoff_paths(spark):
    """Unseen PAIR with seen history smooths against c(w1); unseen
    HISTORY backs off to ln(1/V) exactly — both checked against the
    oracle arithmetic."""
    train = _df(spark, TRAIN)
    c2, c1, v = train_bigram_lm(train)
    held = [(10, "the mat sat"), (11, "zebra quark zebra")]
    got = {
        r["doc_id"]: (r["n_bigrams"], round(r["sum_logp"], 9))
        for r in score_perplexity(_df(spark, held), c2, c1, v, k=K).collect()
    }
    want, _ = _oracle(TRAIN, held, K)
    assert got == want
    # unseen-history doc: every bigram is exactly ln(k/(k*V)) = ln(1/V)
    assert got[11][1] == round(2 * math.log(1.0 / v), 9)


def test_perplexity_orders_fluency(spark):
    """A document made of the corpus's most common transitions must
    score lower perplexity than token salad over the same vocabulary."""
    docs = _df(spark, TRAIN)
    c2, c1, v = train_bigram_lm(docs)
    probe = [(20, "the cat sat on the mat"), (21, "mat the on cat the sat")]
    got = {
        r["doc_id"]: math.exp(-r["sum_logp"] / r["n_bigrams"])
        for r in score_perplexity(_df(spark, probe), c2, c1, v, k=K).collect()
    }
    assert got[20] < got[21]


def test_validation(spark):
    docs = _df(spark, TRAIN)
    c2, c1, v = train_bigram_lm(docs)
    with pytest.raises(ValueError):
        score_perplexity(docs, c2, c1, 0)
    with pytest.raises(ValueError):
        score_perplexity(docs, c2, c1, v, k=0.0)
