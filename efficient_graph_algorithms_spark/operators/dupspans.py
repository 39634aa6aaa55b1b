"""Cross-document duplicated-span metrics over ``documents(doc_id, text)``.

Lee et al. 2021 ("Deduplicating Training Data Makes Language Models
Better", public) measure corpus duplication as the fraction of
token-windows that occur more than once corpus-wide — the signal
behind exact-substring dedup, distinct from within-doc repetition
(``operators/repetition.py``) and from pairwise near-dup detection
(``operators/dedup.py``). Scaled down here to width-8 windows for the
synthetic corpus (the paper uses 50-token spans).

Plan shape: window emission is a pure scan-stage array transform
(normalize → tokenize → slide; ALL occurrences, not distinct — a
window repeated inside one doc is corpus-duplication too). The hot set
is ONE map-side-combining groupBy(win) whose output is bounded by
corpus_windows / min_count; membership is a left-semi equi-join (AQE
broadcasts it when small, skew-splits when not — never a window
function over the win key, same skew argument as
``operators/boilerplate.py``); per-doc metrics are one groupBy(doc_id).
Nothing quadratic, no driver-side data path.

No reference counterpart (the reference is a graph library); part of
the engine's LLM-data-pipeline extension surface (SURVEY §2.12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from efficient_graph_algorithms_spark.operators.dedup import _tokens, token_windows

DUPSPAN_W = 8  # tokens per window (Lee et al. use 50 at full scale)


def _windows(docs: DataFrame, width: int, id_col: str, text_col: str) -> DataFrame:
    """(id, win): every width-token window per doc, all occurrences in
    document order. Docs shorter than ``width`` tokens emit nothing
    (a partial window is not a span)."""
    base = docs.select(
        F.col(id_col).alias("id"), _tokens(F.col(text_col)).alias("_toks")
    )
    toks = F.col("_toks")
    wins = token_windows(toks, width)
    return base.where(F.size(toks) >= width).select(
        "id", F.explode(wins).alias("win")
    )


def dup_span_stats(
    docs: DataFrame,
    width: int = DUPSPAN_W,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_windows, n_dup_windows, dup_window_frac) for EVERY
    input document (0/0/0.0 for docs shorter than ``width`` tokens).
    A window is duplicated when its corpus-wide occurrence count
    (including within-doc repeats) reaches ``min_count``; the fraction
    is rounded to 6 decimals (the repo's cross-engine convention)."""
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    wins = _windows(docs, width, id_col, text_col)
    hot = (
        wins.groupBy("win")
        .agg(F.count("*").alias("c"))
        .where(F.col("c") >= min_count)
        .select("win")
    )
    totals = wins.groupBy("id").agg(F.count("*").cast("long").alias("n_windows"))
    dups = (
        wins.join(hot, "win", "left_semi")
        .groupBy("id")
        .agg(F.count("*").cast("long").alias("n_dup_windows"))
    )
    perdoc = totals.join(dups, "id", "left")
    # alias the caller's id before the join: with id_col="id" both
    # children would expose "id" and the condition would be
    # AMBIGUOUS_REFERENCE (the lm.py score_perplexity fix)
    return (
        docs.select(F.col(id_col).alias("_doc"))
        .join(perdoc, F.col("_doc") == F.col("id"), "left")
        .select(
            F.col("_doc").alias(id_col),
            F.coalesce(F.col("n_windows"), F.lit(0)).alias("n_windows"),
            F.coalesce(F.col("n_dup_windows"), F.lit(0)).alias("n_dup_windows"),
            F.when(F.coalesce(F.col("n_windows"), F.lit(0)) == 0, F.lit(0.0))
            .otherwise(
                F.round(
                    F.coalesce(F.col("n_dup_windows"), F.lit(0))
                    / F.col("n_windows"),
                    6,
                )
            )
            .alias("dup_window_frac"),
        )
    )
