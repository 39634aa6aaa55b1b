"""BM25 keyword ranking over the ``documents`` corpus (Robertson &
Zaragoza 2009; the Lucene-default scoring function):

    score(d, q) = sum over t in q of
        idf(t) * tf(t, d) * (k1 + 1)
                 / (tf(t, d) + k1 * (1 - b + b * len(d) / avgdl))

    idf(t) = ln(1 + (N - df(t) + 0.5) / (df(t) + 0.5))   (always > 0)

with tf the term's occurrence count in the doc, len(d) the doc's token
count, avgdl the corpus mean length, N the corpus size, df the number
of docs containing t. Tokenization is the engine-wide convention
(``functions/text.py::normalized_text`` + split — identical to the
dedup/LM surface, so one normalized scan serves all of them).

Plan shape: the query term list is tiny and BROADCAST — corpus tokens
are filtered to query terms at scan stage, so the "inverted index" is
built only for the terms actually asked about (the pushdown that makes
keyword search cheap at corpus scale). Then: tf = one
map-side-combining groupBy(doc_id, term); df = one tiny groupBy(term);
doc lengths = one groupBy(doc_id) over the unfiltered scan; N + avgdl
ride as a broadcast 1-row aggregate (the HITS-norms pattern — no
driver round-trip); final score = one groupBy(doc_id). Nothing
quadratic, no UDFs, every join keyed and broadcast-able.

No reference counterpart (the reference is a graph library); part of
the engine's LLM-data-pipeline extension surface (SURVEY §2.12) — the
retrieval face used for corpus exploration and decontamination
triage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from efficient_graph_algorithms_spark.operators.dedup import _tokens

DEFAULT_K1 = 1.2
DEFAULT_B = 0.75


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    id_col: str = "doc_id",
    text_col: str = "text",
    decimals: int = 6,
) -> DataFrame:
    """Top-k documents by BM25 score for ``query_terms``.

    Returns (doc_id, n_terms, score): n_terms = how many distinct
    query terms the doc contains; score rounded to ``decimals`` and
    ordered by (score desc, doc_id) — a total order, deterministic
    top-k. Docs matching no query term are not returned.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    # normalize query terms exactly like the corpus tokenizer
    # (normalized_text: lower + trim + whitespace collapse, then split)
    # — a term pasted with surrounding spaces or internal whitespace
    # would otherwise match no corpus token, silently scoring zero
    import re as _re

    terms = sorted(
        {
            w
            for t in query_terms
            for w in _re.sub(r"\s+", " ", t.strip().lower()).split(" ")
            if w
        }
    )
    if not terms:
        raise ValueError("query_terms contain no tokens after normalization")

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_tokens(F.col(text_col))).alias("w"),
    ).where(F.col("w") != "")

    # Corpus scalars: N over ALL docs (even empty ones), avgdl over
    # per-doc non-empty token counts (empty docs count length 0).
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    all_dl = docs.select(F.col(id_col).alias("doc_id")).join(
        dl, "doc_id", "left"
    ).select("doc_id", F.coalesce(F.col("dl"), F.lit(0)).alias("dl"))
    stats = all_dl.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg(F.col("dl").cast("double")).alias("avgdl"),
    )

    hits = toks.where(F.col("w").isin(terms))
    tf = hits.groupBy("doc_id", "w").agg(F.count("*").alias("tf"))
    df_t = tf.groupBy("w").agg(F.count("*").alias("df"))

    scored = (
        tf.join(df_t, "w")
        .join(all_dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "w",
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * (F.col("tf") * (F.lit(k1) + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (
                        F.lit(1.0)
                        - F.lit(b)
                        + F.lit(b) * F.col("dl") / F.col("avgdl")
                    )
                )
            ).alias("s"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_terms"),
            F.round(F.sum("s"), decimals).alias("score"),
        )
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(k)
    )
