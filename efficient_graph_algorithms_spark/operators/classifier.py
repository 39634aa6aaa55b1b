"""Multinomial Naive Bayes document classifier — the classic
quality-filter face of a training-data pipeline (the GPT-3/PaLM corpus
recipe trains a linear classifier on "reference quality vs crawl" and
keeps docs by score; Naive Bayes is the one-pass-trainable member of
that family, exactly checkable):

    logp(d | y) = sum over token occurrences t of
        ln( (c(t, y) + alpha) / (tot(y) + alpha * V) )
    llr(d) = [logp(d|1) + ln prior(1)] - [logp(d|0) + ln prior(0)]

with c(t, y) the token's occurrence count in class y's training split,
tot(y) the class's total token occurrences, V the training vocabulary
size (distinct tokens across both classes), and priors from training
doc counts. Tokens unseen in a class smooth to alpha/(tot+alpha*V);
tokens outside the training vocabulary entirely smooth the same way in
BOTH classes (they still shift llr when class totals differ — standard
multinomial NB).

Plan shape: training is ONE map-side-combining groupBy(w, y) over the
labeled split (class totals and V derive from it by tiny aggregates);
scoring LEFT-joins every doc's token occurrences against the two
per-class count columns (one pivoted table, broadcast-able — its size
is the training vocabulary) and finishes with one groupBy(doc_id).
Class totals/priors/V ride as a broadcast 1-row aggregate (the
HITS-norms pattern). Nothing quadratic, no UDFs; tokenization is the
engine-wide ``normalized_text`` + split convention.

No reference counterpart (the reference is a graph library); part of
the engine's LLM-data-pipeline extension surface (SURVEY §2.12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from efficient_graph_algorithms_spark.operators.dedup import _tokens

DEFAULT_ALPHA = 1.0


def _token_occurrences(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_tokens(F.col(text_col))).alias("w"),
    ).where(F.col("w") != "")


def train_nb(
    labeled: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "label",
) -> tuple[DataFrame, DataFrame]:
    """Train on (id, text, label in {0, 1}).

    Returns (counts, stats): ``counts`` is (w, c0, c1) — per-token
    occurrence counts in each class (one row per training-vocabulary
    token); ``stats`` is ONE row (tot0, tot1, n0, n1, v) — class token
    totals, class doc counts, vocabulary size.
    """
    # project the label THROUGH the explode — one scan, no shuffle join
    # back onto labeled (which would also double-count tokens of any
    # duplicated doc_id quadratically: 2x from the explode AND 2x from
    # the join match)
    toks = labeled.select(
        F.col(label_col).alias("y"),
        F.explode(_tokens(F.col(text_col))).alias("w"),
    ).where(F.col("w") != "")
    counts = (
        toks.groupBy("w")
        .agg(
            F.sum(F.when(F.col("y") == 0, 1).otherwise(0)).alias("c0"),
            F.sum(F.when(F.col("y") == 1, 1).otherwise(0)).alias("c1"),
        )
    )
    stats = counts.agg(
        F.sum("c0").cast("double").alias("tot0"),
        F.sum("c1").cast("double").alias("tot1"),
        F.count("*").cast("double").alias("v"),
    ).crossJoin(
        F.broadcast(
            labeled.agg(
                F.sum(
                    F.when(F.col(label_col) == 0, 1).otherwise(0)
                ).cast("double").alias("n0"),
                F.sum(
                    F.when(F.col(label_col) == 1, 1).otherwise(0)
                ).cast("double").alias("n1"),
            )
        )
    )
    # fail-loud prior guard (r6, ADVICE fix): a split with zero docs in
    # either class makes score_nb's log(n1/n0) infinite for EVERY doc.
    # Row-level raise_error keeps train_nb lazy (no extra job); it
    # fires the first time the stats row is actually computed.
    _chk = lambda c: F.when(  # noqa: E731 — tiny local expr builder
        F.col(c) >= 1, F.col(c)
    ).otherwise(
        F.raise_error(
            F.lit(f"train_nb: class count {c} is 0 — llr would be infinite")
        ).cast("double")
    ).alias(c)
    stats = stats.select("tot0", "tot1", "v", _chk("n0"), _chk("n1"))
    return counts, stats


def score_nb(
    docs: DataFrame,
    counts: DataFrame,
    stats: DataFrame,
    alpha: float = DEFAULT_ALPHA,
    id_col: str = "doc_id",
    text_col: str = "text",
    decimals: int = 6,
) -> DataFrame:
    """(doc_id, n_tokens, llr, pred): log-likelihood ratio of class 1
    over class 0 (including the prior term) for every doc, rounded to
    ``decimals``; pred = 1 iff llr > 0. Docs with no tokens keep a row
    scoring the bare prior ratio.
    """
    toks = _token_occurrences(docs, id_col, text_col)
    per_tok = (
        toks.join(counts, "w", "left")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (
                F.log(
                    (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(alpha))
                    / (F.col("tot1") + F.lit(alpha) * F.col("v"))
                )
                - F.log(
                    (F.coalesce(F.col("c0"), F.lit(0)) + F.lit(alpha))
                    / (F.col("tot0") + F.lit(alpha) * F.col("v"))
                )
            ).alias("d_llr"),
        )
    )
    per_doc = per_tok.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"), F.sum("d_llr").alias("s")
    )
    out = (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            F.round(
                F.coalesce(F.col("s"), F.lit(0.0))
                + F.log(F.col("n1") / F.col("n0")),
                decimals,
            ).alias("llr"),
        )
        .withColumn(
            "pred", F.when(F.col("llr") > 0, F.lit(1)).otherwise(F.lit(0))
        )
    )
    return out


def nb_classify(
    labeled: DataFrame,
    docs: DataFrame,
    alpha: float = DEFAULT_ALPHA,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "label",
    decimals: int = 6,
) -> DataFrame:
    """Train on ``labeled``, score ``docs`` — see train_nb/score_nb."""
    counts, stats = train_nb(labeled, id_col, text_col, label_col)
    return score_nb(
        docs, counts, stats, alpha=alpha, id_col=id_col,
        text_col=text_col, decimals=decimals,
    )
