"""Deterministic corpus sampling for training-data pipelines.

Primitives over a ``documents(doc_id, text, ...)`` table:

- ``hash_sample``       reproducible Bernoulli(rate): keep rows whose
                        portable 60-bit hash of (seed, id) falls below
                        ``floor(rate * 2^60)`` — an exact integer
                        compare, no floats, no rand().
- ``stratified_sample`` the same threshold test with a per-stratum
                        rate (e.g. per language id) — the standard
                        corpus-mixing knob for LLM training data.

Why not ``df.sample``: Spark's sampler draws from a per-partition RNG
stream, so the kept set changes under repartitioning, AQE coalescing,
or any task retry reordering — unacceptable for a reproducible corpus.
The hash gate is a pure function of (id, seed): the same document
makes the same cut on any engine, any partitioning, any cluster size,
and the SQL oracle reproduces it bit-for-bit.

Scale shape: ZERO shuffle — the gate is a pure column expression
evaluated in the scan stage (whole-stage codegen; the md5 and the
stratum regexes are JVM built-ins), so sampling 100 TB costs one
read pass with the filter pushed to it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from efficient_graph_algorithms_spark.functions.hashing import md5_60bit_col

from efficient_graph_algorithms_spark.functions.text import lang_id

_SCALE = 1 << 60


def rate_threshold(rate: float) -> int:
    """floor(rate * 2^60) as an exact Python int — the integer gate both
    engines compare against. rate=1.0 keeps everything, 0.0 nothing."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return min(_SCALE, int(rate * _SCALE))


def sample_hash60(id_col: Column, seed: int) -> Column:
    """Portable 60-bit hash of 'smpl:<seed>:<id>' (functions/hashing.py
    md5-prefix family; same value via md5 in any engine)."""
    key = F.concat(F.lit(f"smpl:{seed}:"), id_col.cast("string"))
    return md5_60bit_col(key)


def hash_sample(
    df: DataFrame, rate: float, seed: int = 42, id_col: str = "doc_id"
) -> DataFrame:
    """Keep each row iff hash60(seed, id) < floor(rate * 2^60).
    Unbiased for unique ids (the md5 prefix is uniform on [0, 2^60))
    and a pure row-local predicate — no shuffle, no state."""
    return df.where(sample_hash60(F.col(id_col), seed) < F.lit(rate_threshold(rate)))


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    default_rate: float = 0.0,
    seed: int = 42,
    id_col: str = "doc_id",
    stratum: Column | None = None,
) -> DataFrame:
    """Per-stratum deterministic sampling. ``stratum`` defaults to
    ``lang_id(text)``; ``rates`` maps stratum value -> keep rate;
    strata not listed fall back to ``default_rate``.

    Returns the input rows that make the cut, plus the computed
    ``stratum`` column. One scan, zero shuffle: the per-row threshold
    is a CASE expression over integer literals.
    """
    st = stratum if stratum is not None else lang_id(F.col("text"))
    thr: Column = F.lit(rate_threshold(default_rate))
    for value, rate in sorted(rates.items()):
        thr = F.when(st == value, F.lit(rate_threshold(rate))).otherwise(thr)
    return docs.withColumn("stratum", st).where(
        sample_hash60(F.col(id_col), seed) < thr
    )


def cap_per_key(
    df: DataFrame,
    key_col: str,
    n: int,
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``n`` rows per ``key_col`` value — per-domain /
    per-source corpus quotas, the other standard mixing rule. Rows are
    chosen deterministically by the 60-bit hash order of (seed, id)
    with the id as tie-break, so the kept set is again a pure function
    of (ids, seed) — stable across runs, partitionings, and engines.

    Plan: one shuffle on the key + a rank within each key partition
    (row_number window). A skewed key ranks its rows in one partition,
    but carries no joins and no state beyond the running counter —
    at 10^12 docs the quota pass is shuffle-bound, not memory-bound.
    """
    from pyspark.sql import Window

    if n < 0:
        raise ValueError(f"n must be >= 0, got {n}")
    w = Window.partitionBy(key_col).orderBy(
        sample_hash60(F.col(id_col), seed), F.col(id_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n)
        .drop("_rn")
    )


def shard_hash60(id_col: Column, seed: int) -> Column:
    """Portable 60-bit hash of 'shrd:<seed>:<id>' — the deterministic
    global packing order (same value via md5 in any engine)."""
    key = F.concat(F.lit(f"shrd:{seed}:"), id_col.cast("string"))
    return md5_60bit_col(key)


def assign_shards(
    docs: DataFrame,
    tokens: Column | None = None,
    shard_tokens: int = 1 << 20,
    seed: int = 42,
    id_col: str = "doc_id",
    n_ranges: int = 32,
) -> DataFrame:
    """Pack the corpus into fixed-token training shards: (doc_id,
    n_tok, shard_id) with shard_id = floor(start_offset / shard_tokens)
    where start_offset is the EXCLUSIVE prefix sum of token counts in
    deterministic (hash, id) order — each document belongs to the shard
    its first token lands in, so every shard except the last holds at
    least shard_tokens tokens once its boundary document is counted.

    Scale shape — distributed prefix sum: a global window cumsum would
    serialize the whole corpus through ONE task, so instead the
    operator (1) range-partitions on the order key (one shuffle),
    (2) aggregates per-range token sums — n_ranges rows — and
    prefix-sums those scalars on the driver, (3) broadcasts the
    exclusive range offsets back and finishes with a window cumsum
    PER RANGE. Every stage is parallel; driver state is n_ranges
    integers. The result is independent of where the range boundaries
    fall (offsets + within-range cumsums reproduce the global cumsum
    for ANY contiguous partitioning of the order), which
    test_assign_shards_partition_invariant pins.

    ``tokens`` defaults to the whitespace token count of ``text``.
    """
    from pyspark.sql import Window

    from efficient_graph_algorithms_spark.functions.text import token_count

    if shard_tokens <= 0:
        raise ValueError(f"shard_tokens must be positive, got {shard_tokens}")
    tok = tokens if tokens is not None else token_count(F.col("text"))
    base = docs.select(
        F.col(id_col),
        tok.cast("long").alias("n_tok"),
        shard_hash60(F.col(id_col), seed).alias("_h"),
    )
    rp = (
        base.repartitionByRange(n_ranges, F.col("_h"), F.col(id_col))
        .withColumn("_pid", F.spark_partition_id())
        # eager pin: the per-range sums below and the final cumsum must
        # see the SAME range boundaries (repartitionByRange samples
        # boundaries per job otherwise)
        .localCheckpoint(eager=True)
    )
    part_sums = {
        r["_pid"]: r["s"]
        for r in rp.groupBy("_pid").agg(F.sum("n_tok").alias("s")).collect()
    }
    off, offsets = 0, []
    for pid in sorted(part_sums):
        offsets.append((pid, off))
        off += int(part_sums[pid])
    offs = docs.sparkSession.createDataFrame(
        offsets or [(0, 0)], "_pid int, _off long"
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        rp.join(F.broadcast(offs), "_pid")
        .withColumn("_cum", F.col("_off") + F.sum("n_tok").over(w))
        .select(
            F.col(id_col),
            "n_tok",
            # exact LONG division (`div`), not double `/` + floor: past
            # 2^53 cumulative tokens the double cast loses integer
            # exactness and a boundary doc could land in the wrong shard
            F.expr(f"(_cum - n_tok) div {int(shard_tokens)}")
            .cast("long")
            .alias("shard_id"),
        )
    )
