"""Gopher-style repetition metrics over ``documents(doc_id, text)``.

Repetitious text (boilerplate, keyword stuffing, generation loops) is
a standard pre-training quality filter signal (Rae et al., Gopher,
appendix A1.1). Two scaled-down faces of that rule family:

- ``dup_token_frac``  — fraction of tokens that are repeats of an
  earlier token: ``1 - |distinct tokens| / |tokens|``.
- ``top_bigram_frac`` — fraction of all word bigrams taken by the
  single most frequent bigram.

Plan shape: token-level stats are pure scan-stage array expressions
(``array_distinct``/``size`` inside codegen, no shuffle). The bigram
face needs real counting (distinct-ness can't be folded into an array
expression without quadratic work), so bigrams explode into ONE
partial-aggregating groupBy(doc_id, bigram) followed by a groupBy
(doc_id) max/sum — two map-side-combining shuffles keyed by doc_id,
nothing quadratic, no skew beyond what AQE handles (a single document's
bigrams always hash to many reducers only via its own doc_id key).

No reference counterpart (the reference is a graph library); part of
the engine's LLM-data-pipeline extension surface (SURVEY §2.12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from efficient_graph_algorithms_spark.functions.text import normalized_text


def repetition_features(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_tokens, dup_token_frac, top_bigram_frac), fractions
    rounded to 6 decimals (same cross-engine convention as the dedup
    Jaccard scores). Documents with < 2 tokens get top_bigram_frac 0."""
    # empty/whitespace-only docs: split('') yields [''], so gate on the
    # normalized text being non-empty — n_tokens 0, fractions 0.0
    # (lockstep with functions/text.py's token_count empty convention)
    # NULL text behaves as '' (n_tokens 0, fractions 0.0): without the
    # coalesce the normalized==\"\" gate is NULL→false and size(NULL)=-1
    # leaks into n_tokens.
    _text = F.coalesce(F.col(text_col), F.lit(""))
    base = docs.select(
        F.col(id_col),
        F.when(
            normalized_text(_text) == "", F.array().cast("array<string>")
        )
        .otherwise(F.split(normalized_text(_text), " "))
        .alias("_toks"),
    )
    toks = F.col("_toks")
    tok_stats = base.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        F.when(F.size(toks) == 0, F.lit(0.0))
        .otherwise(
            F.round(
                F.lit(1.0) - F.size(F.array_distinct(toks)) / F.size(toks), 6
            )
        )
        .alias("dup_token_frac"),
    )
    bigrams = base.where(F.size(toks) >= 2).select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - 2),
                lambda i: F.concat_ws(
                    " ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)
                ),
            )
        ).alias("bigram"),
    )
    bigram_stats = (
        bigrams.groupBy(id_col, "bigram")
        .agg(F.count("*").alias("c"))
        .groupBy(id_col)
        .agg(F.round(F.max("c") / F.sum("c"), 6).alias("top_bigram_frac"))
    )
    return tok_stats.join(bigram_stats, id_col, "left").select(
        F.col(id_col),
        "n_tokens",
        "dup_token_frac",
        F.coalesce(F.col("top_bigram_frac"), F.lit(0.0)).alias("top_bigram_frac"),
    )
