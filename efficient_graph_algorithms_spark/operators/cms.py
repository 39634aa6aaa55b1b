"""Count-min sketch term statistics (heavy hitters at corpus scale).

The classic one-pass frequency sketch (Cormode & Muthukrishnan 2005,
J. Algorithms 55) — THE way to ask "which terms/urls/hosts are hot"
over a 100 TB corpus without materializing a full term dictionary:
d×w counters, term t hashes to one bucket per depth row, point
estimate = min over rows, guaranteed ≥ the true count and ≤ true +
εN with probability 1−δ (w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉).

No reference counterpart (``reference src/ega`` has no sketch layer
beyond the ANF/HyperBall family); engine extension in the §2.12
LLM-pipeline family — heavy-hitter term lists drive stopword
discovery, boilerplate vocabularies, and hot-key skew guards.

Determinism: the hash family is the engine's portable 60-bit md5
(functions/hashing.py) keyed ``cms<d>:<term>``, so the WHOLE sketch —
every counter — is a pure function of the corpus, bit-identical in
DuckDB SQL. The sketch itself is parity-checkable, not just its
estimates; the estimate face additionally certifies the CMS
overcount invariant (estimate ≥ exact) row by row.

Plan shape, build: tokenize (JVM regexp split of normalized_text,
the dedup family's convention) → explode → fan out ×depth (a
``sequence`` literal explode, no join) → ONE map-side-combining
groupBy whose result is d·w rows REGARDLESS of corpus size. Estimate:
candidates fan out ×depth and hash-join the (tiny, broadcast) sketch,
then a min-groupBy per term. Nothing quadratic, nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from efficient_graph_algorithms_spark.functions.hashing import md5_60bit_col

from efficient_graph_algorithms_spark.functions.text import normalized_text


def _h60(expr: Column) -> Column:
    """Portable 60-bit md5 hash (functions/hashing.py convention)."""
    return md5_60bit_col(expr)


def _bucket(term: Column, d: Column, width: int) -> Column:
    return _h60(
        F.concat(F.lit("cms"), d.cast("string"), F.lit(":"), term)
    ) % width


def corpus_terms(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One row per term occurrence: (term). Null-safe (null text → no
    rows, the pii.py coalesce lesson); '' tokens dropped."""
    toks = F.split(normalized_text(F.coalesce(F.col(text_col), F.lit(""))), " ")
    return (
        docs.select(F.explode(toks).alias("term"))
        .where(F.col("term") != "")
    )


def bucket_counts(
    docs: DataFrame,
    text_col: str = "text",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Non-zero CMS counters (d, bucket, cnt) — the aggregation core,
    valid on bounded AND unbounded (streaming) frames: tokenize →
    ×depth fan-out → one count aggregate. ``cms_build`` zero-fills it
    into the fixed d×w shape; `streaming/sketch.py` runs it as an
    incremental stateful aggregation."""
    if depth < 1 or width < 1:
        raise ValueError("depth and width must be >= 1")
    occ = corpus_terms(docs, text_col)
    return (
        occ.select(
            F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"),
            "term",
        )
        .select("d", _bucket(F.col("term"), F.col("d"), width).alias("bucket"))
        .groupBy("d", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cms_build(
    docs: DataFrame,
    text_col: str = "text",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Build the sketch: (d, bucket, cnt), exactly depth×width rows
    (zero counters included, so the sketch table has a fixed shape and
    unions/merges across corpus shards stay aligned)."""
    spark = docs.sparkSession
    counted = bucket_counts(docs, text_col, depth, width)
    grid = spark.range(depth).select(
        F.col("id").cast("int").alias("d")
    ).crossJoin(spark.range(width).select(F.col("id").cast("long").alias("bucket")))
    return (
        grid.join(counted, ["d", "bucket"], "left")
        .select("d", "bucket", F.coalesce("cnt", F.lit(0)).alias("cnt"))
    )


def _sketch_dims(sketch: DataFrame, width: int | None) -> tuple[int, int]:
    """(depth, width) from the sketch itself.

    The built sketch is zero-filled to the full d×w grid, so both
    dimensions are recoverable (max+1) — callers need not repeat the
    build-time width, and a REPEATED width is validated: probing a
    4096-wide sketch with width=1024 would hash into the wrong
    counters and silently break the estimate ≥ exact guarantee, so a
    width provably inconsistent with the sketch raises instead."""
    row = sketch.agg(F.max("d").alias("md"), F.max("bucket").alias("mb")).first()
    if row["md"] is None:
        raise ValueError("empty sketch")
    depth, wmin = int(row["md"]) + 1, int(row["mb"]) + 1
    if width is None:
        width = wmin
    elif width < wmin:
        raise ValueError(
            f"width={width} inconsistent with sketch (bucket {wmin - 1} present)"
        )
    return depth, width


def cms_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    term_col: str = "term",
    width: int | None = None,
) -> DataFrame:
    """CMS point estimate for each candidate term: (term, estimate).

    estimate = min over sketch rows of the term's counter — always ≥
    the term's true occurrence count. ``sketch`` is d·w rows, so the
    join side is broadcastable at any corpus scale. ``width`` is
    inferred from the (zero-filled) sketch when omitted; pass it only
    for sparse sketches (streaming bucket_counts output), where an
    inconsistent value is still rejected when provable."""
    depth, width = _sketch_dims(sketch, width)
    fan = candidates.select(F.col(term_col).alias("term")).distinct().select(
        "term",
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"),
    )
    probed = fan.select(
        "term", "d", _bucket(F.col("term"), F.col("d"), width).alias("bucket")
    )
    # LEFT join + coalesce-0 (r6, ADVICE fix): on a SPARSE sketch
    # (streaming bucket_counts output) a term whose counter row is
    # absent has true count 0 — an inner join would take min over only
    # the present counters and overstate it. Harmless for the
    # zero-filled batch build (every (d, bucket) row exists).
    return (
        probed.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("estimate"))
    )


def cms_heavy_hitters(
    docs: DataFrame,
    sketch: DataFrame,
    min_count: int,
    text_col: str = "text",
    width: int | None = None,
) -> DataFrame:
    """Terms whose CMS estimate ≥ min_count, with their exact counts:
    (term, estimate, exact). CMS ≥ exact guarantees NO false negatives
    — every true heavy hitter survives the sketch filter; the exact
    column removes the false positives caller-side. The genuine
    two-pass plan: pass 1 probes the sketch per DISTINCT term (no
    occurrence counting), pass 2 exact-counts ONLY the occurrences of
    the surviving candidates (a broadcast semi-join gate on the
    re-scan) — the full-vocabulary count the sketch exists to avoid
    never happens."""
    # referenced twice (semi-join gate + final join): persist so the
    # vocabulary-distinct + sketch-probe subtree runs once (released
    # with the session, the similarity.py semantic_dedup convention)
    cand = (
        cms_estimate(sketch, corpus_terms(docs, text_col), width=width)
        .where(F.col("estimate") >= min_count)
        .persist()
    )
    # survivors are ≤ N/min_count by the CMS bound — broadcast-sized
    exact = (
        corpus_terms(docs, text_col)
        .join(F.broadcast(cand.select("term")), "term", "left_semi")
        .groupBy("term")
        .agg(F.count("*").alias("exact"))
    )
    return cand.join(exact, "term").select("term", "estimate", "exact")


# ---------------------------------------------------------------------------
# DuckDB oracle fragments (lockstep with _bucket / corpus_terms above)
# ---------------------------------------------------------------------------

def duck_cms_bucket(term_expr: str, d_expr: str, width: int) -> str:
    return (
        f"((('0x' || substr(md5('cms' || CAST({d_expr} AS VARCHAR) || ':' || "
        f"{term_expr}), 1, 15))::BIGINT) % {width})"
    )


def duck_corpus_terms(table: str, text_col: str = "text") -> str:
    """SELECT producing one row per term occurrence from ``table``."""
    norm = (
        f"regexp_replace(lower(trim(coalesce({text_col}, ''))), '\\s+', ' ', 'g')"
    )
    return (
        f"SELECT t.term FROM {table}, "
        f"LATERAL unnest(string_split({norm}, ' ')) AS t(term) "
        f"WHERE t.term <> ''"
    )
