"""Bigram language-model perplexity scoring over ``documents``.

The CCNet quality-filter signal (Wenzek et al. 2020, public): score
every document's fluency under a corpus-level n-gram LM and filter or
bucket by perplexity. Scaled to a word-bigram model with add-k
smoothing here (CCNet uses a 5-gram KenLM; the pipeline shape — train
counts once, score every document against them — is identical and the
arithmetic is exactly checkable):

    p(w2 | w1) = (c(w1, w2) + k) / (c(w1) + k * V)

with c(w1) the history count (bigrams starting at w1), V the corpus
vocabulary size, and unseen histories backing off to 1/V.

Plan shape: bigram emission is scan-stage (the repetition/dupspans
array transform); training is ONE map-side-combining
``groupBy(w1, w2)`` (history counts derive from it by a second tiny
groupBy); scoring joins each doc's bigrams against the count tables —
both keyed joins are broadcast-able when the LM is small and
AQE-skew-split otherwise (hot histories ARE common words) — then one
``groupBy(doc_id)``. Nothing quadratic; the only driver scalar is V.

No reference counterpart (the reference is a graph library); part of
the engine's LLM-data-pipeline extension surface (SURVEY §2.12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from efficient_graph_algorithms_spark.operators.dedup import _tokens

DEFAULT_K = 0.1


def _bigrams(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2): every adjacent token pair per doc, all occurrences.
    Docs with < 2 tokens emit nothing."""
    base = docs.select(
        F.col(id_col).alias("id"), _tokens(F.col(text_col)).alias("_toks")
    )
    toks = F.col("_toks")
    pairs = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 2),
        lambda i: F.struct(
            F.element_at(toks, i + 1).alias("w1"),
            F.element_at(toks, i + 2).alias("w2"),
        ),
    )
    return (
        base.where(F.size(toks) >= 2)
        .select("id", F.explode(pairs).alias("bg"))
        .select("id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )


def train_bigram_lm(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame, int]:
    """Returns (pair_counts(w1, w2, c2), history_counts(w1, c1), V).
    V is the corpus vocabulary size (distinct tokens over ALL docs,
    including docs too short to emit bigrams)."""
    bg = _bigrams(docs, id_col, text_col)
    c2 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    toks = docs.select(
        F.explode(_tokens(F.col(text_col))).alias("w")
    ).where(F.col("w") != "")
    vocab = toks.select("w").distinct().count()
    return c2, c1, int(vocab)


def score_perplexity(
    docs: DataFrame,
    pair_counts: DataFrame,
    history_counts: DataFrame,
    vocab: int,
    k: float = DEFAULT_K,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_bigrams, sum_logp): add-k log-likelihood of every
    document under the bigram LM; unseen pairs smooth against their
    history, unseen histories back off to ln(1/V). Docs with < 2 tokens
    keep a row with n_bigrams 0 and sum_logp 0.0. Perplexity =
    exp(-sum_logp / n_bigrams) — derive it downstream (kept off this
    exact-parity surface because exp amplifies merge-order float noise).
    """
    if vocab < 1:
        raise ValueError("vocabulary must be >= 1")
    if k <= 0:
        raise ValueError(f"add-k smoothing needs k > 0, got {k}")
    bg = _bigrams(docs, id_col, text_col)
    scored = (
        bg.join(pair_counts, ["w1", "w2"], "left")
        .join(history_counts, "w1", "left")
        .select(
            "id",
            F.log(
                (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(float(k)))
                / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(float(k) * vocab))
            ).alias("logp"),
        )
    )
    per_doc = scored.groupBy("id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.sum("logp").alias("sum_logp"),
    )
    # alias the caller's id to a private name before joining: with
    # id_col="id" both join children would expose an "id" column and
    # the equality condition would be AMBIGUOUS_REFERENCE (the bm25
    # doc_id-alias convention)
    return (
        docs.select(F.col(id_col).alias("_doc"))
        .join(per_doc, F.col("_doc") == F.col("id"), "left")
        .select(
            F.col("_doc").alias(id_col),
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            F.coalesce(F.col("sum_logp"), F.lit(0.0)).alias("sum_logp"),
        )
    )
