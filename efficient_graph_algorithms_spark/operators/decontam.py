"""Benchmark decontamination over a ``documents(doc_id, text)`` table.

The standard LLM-corpus hygiene step (GPT-3 appendix C / PaLM-style
13-gram overlap, scaled down to width-6 for the synthetic corpus):
flag every training document that shares at least one word-n-gram with
a benchmark/eval probe set, so contaminated documents can be dropped
or audited before training.

Plan shape (the 100 TB story): the probe side is TINY relative to the
corpus — benchmark suites are at most millions of distinct n-grams
while the corpus holds trillions — so the overlap test is a
broadcast-hash semi-join keyed on the shingle string. The corpus side
is a pure scan-stage transform (normalize → tokenize → shingle →
explode) with NO self-join and NO shuffle other than the final per-doc
count aggregate; the probe side is deduplicated once and broadcast.
Nothing here is quadratic in corpus size.

No reference counterpart (the reference is a graph library); this is
part of the engine's LLM-data-pipeline extension surface (SURVEY
§2.12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from efficient_graph_algorithms_spark.operators.dedup import shingles

DECONTAM_W = 6  # words per overlap n-gram


def decontaminate(
    docs: DataFrame,
    probes: DataFrame,
    width: int = DECONTAM_W,
    id_col: str = "doc_id",
    text_col: str = "text",
    probe_text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_hits) for every document sharing >= 1 word-``width``-
    gram with the probe set; ``n_hits`` is the number of DISTINCT
    overlapping n-grams (shingles are emitted distinct per doc, so a
    plain count is a distinct count).

    ``probes`` is any DataFrame with a ``probe_text_col`` string
    column — each row a benchmark question/answer/continuation. Probe
    texts shorter than ``width`` words contribute their full text as a
    single n-gram (same convention as dedup shingling).
    """
    # empty-string shingles are excluded on BOTH sides: a blank/null
    # probe row emits "" (the shorter-than-width path over no tokens),
    # which would "contaminate" every blank training doc — content-free
    # matches are not contamination
    doc_sh = shingles(docs, id_col=id_col, text_col=text_col, width=width).where(
        F.col("shingle") != ""
    )
    probe_sh = (
        shingles(
            probes.select(F.monotonically_increasing_id().alias("_pid"), probe_text_col),
            id_col="_pid",
            text_col=probe_text_col,
            width=width,
        )
        .where(F.col("shingle") != "")
        .select("shingle")
        .distinct()
    )
    hits = doc_sh.join(F.broadcast(probe_sh), "shingle")
    return hits.groupBy(F.col("id").alias(id_col)).agg(
        F.count("*").alias("n_hits")
    )
