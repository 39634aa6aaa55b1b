"""CCNet/C4-style boilerplate LINE removal over ``documents(doc_id, text)``.

Navigation menus, cookie banners, and footer text repeat verbatim
across a crawl; the standard pre-training cleanup (CCNet, Wenzek et
al. 2020; C4, Raffel et al. 2020 — both public) drops every line whose
normalized form occurs at least ``min_count`` times in the corpus,
then reassembles each document from its surviving lines in original
order.

Plan shape (three shuffles, none quadratic, none skew-trapped):

1. ``posexplode(split(text, '\\n'))`` — scan-stage, no shuffle.
2. hot-line detection: ``groupBy(key).count() >= min_count`` — ONE
   map-side-combining shuffle of (key, partial count); the output (the
   hot set) is at most corpus_lines / min_count rows, usually tiny.
3. ``left_anti`` join of the lines against the hot set — AQE
   broadcasts the hot side when it is small and skew-splits the join
   when it is not. Deliberately NOT a ``count() over (partition by
   key)`` window: boilerplate lines are hot BY DEFINITION, and a
   window would concentrate each hot key's rows onto a single reducer
   — the exact skew this engine's salting machinery exists to avoid.
4. reassembly: ``groupBy(doc_id)`` + ``array_sort(collect_list(
   struct(pos, line)))`` — one shuffle keyed by doc_id; per-group
   state is bounded by a single document's size.

Lines whose normalized form is empty are never counted and never
removed (they are document structure, not boilerplate). NULL text
behaves as ``''`` (the ADVICE r4 convention shared with pii/repetition).

No reference counterpart (the reference is a graph library); part of
the engine's LLM-data-pipeline extension surface (SURVEY §2.12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_MIN_COUNT = 3

# one-line normalization shared with the DuckDB oracle: lowercase,
# collapse runs of whitespace, trim. Java \s and RE2 \s agree on the
# characters that can appear inside a split line (no \n remains).
_WS = r"\s+"


def _line_key(line) -> F.Column:
    return F.trim(F.regexp_replace(F.lower(line), _WS, " "))


def remove_boilerplate_lines(
    docs: DataFrame,
    min_count: int = DEFAULT_MIN_COUNT,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_lines, n_removed, clean_text): drop every line whose
    normalized form occurs >= min_count times corpus-wide (within-doc
    repeats count toward the threshold), keep original text and order
    for the survivors. Documents losing every line keep a row with
    clean_text ''."""
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")).alias(
            "pos", "line"
        ),
    ).withColumn("key", _line_key(F.col("line")))

    hot = (
        lines.where(F.col("key") != "")
        .groupBy("key")
        .agg(F.count("*").alias("c"))
        .where(F.col("c") >= min_count)
        .select("key")
    )

    totals = lines.groupBy(id_col).agg(F.count("*").cast("long").alias("n_lines"))
    # empty keys never appear in hot, so left_anti keeps them by itself
    kept = lines.join(hot, "key", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("clean_text"),
    )
    return totals.join(rebuilt, id_col, "left").select(
        F.col(id_col),
        "n_lines",
        (F.col("n_lines") - F.coalesce(F.col("n_kept"), F.lit(0))).alias("n_removed"),
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
    )


def hot_lines(
    docs: DataFrame,
    min_count: int = DEFAULT_MIN_COUNT,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(key, c): the detected boilerplate lines and their corpus-wide
    counts — the inspection face (what WOULD be removed and why)."""
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    lines = docs.select(
        F.posexplode(F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")).alias(
            "pos", "line"
        )
    )
    return (
        lines.select(_line_key(F.col("line")).alias("key"))
        .where(F.col("key") != "")
        .groupBy("key")
        .agg(F.count("*").cast("long").alias("c"))
        .where(F.col("c") >= min_count)
    )
