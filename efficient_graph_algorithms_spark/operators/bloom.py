"""Bloom-filter membership over key sets (crawl-dedup primitive).

Bloom 1970 — the membership sketch behind "have we crawled this url
already" / blocklist filtering when the key set has billions of
entries: k hash positions per key in an m-bit space; a candidate is
*maybe* a member iff all k of its positions are set (no false
negatives, false-positive rate ≈ (1 − e^{−kn/m})^k).

No reference counterpart; engine extension in the §2.12 family next
to the count-min sketch (operators/cms.py) — same portable 60-bit md5
hash family (`bloom<i>:<key>`), so the filter's entire bit set is a
pure function of the key set, bit-identical in DuckDB SQL.

Representation: the filter is a DataFrame of DISTINCT set bit
positions — the sparse form. For the classic dense-bitmap handoff
(e.g. exporting to a fetcher), ``n_set_bits`` and the positions
themselves are the contract; we deliberately do NOT pack into a
driver-side bitmap — at m = 2³⁵ bits the dense form is 4 GiB while
the sparse form stays a distributed table.

Plan shape, build: keys × k fan-out (sequence explode) → one
DISTINCT (= one map-side-combining shuffle), output ≤ k·n rows.
Membership: candidates × k fan-out → LEFT join onto the position set
→ per-candidate count of hits == k. Both sides are plain equi-joins
on a long key; when the filter is small Spark broadcasts it, when it
is huge the join shuffles both sides by position — exactly the right
degradation. Nothing quadratic, nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from efficient_graph_algorithms_spark.functions.hashing import md5_60bit_col


def _h60(expr: Column) -> Column:
    return md5_60bit_col(expr)


def _positions(key: Column, n_hashes: int, m_bits: int) -> Column:
    """Array of the key's n_hashes bit positions."""
    return F.array(
        *[
            (_h60(F.concat(F.lit(f"bloom{i}:"), key)) % m_bits).alias(f"p{i}")
            for i in range(n_hashes)
        ]
    )


def bloom_build(
    keys: DataFrame,
    key_col: str = "key",
    m_bits: int = 1 << 20,
    n_hashes: int = 4,
) -> DataFrame:
    """Build the filter: one row per DISTINCT set bit position
    (``pos`` long). Null keys contribute nothing."""
    if m_bits < 1 or n_hashes < 1:
        raise ValueError("m_bits and n_hashes must be >= 1")
    return (
        keys.select(F.col(key_col).cast("string").alias("k"))
        .where(F.col("k").isNotNull())
        .select(
            F.explode(_positions(F.col("k"), n_hashes, m_bits)).alias("pos")
        )
        .distinct()
    )


def bloom_contains(
    candidates: DataFrame,
    bloom: DataFrame,
    key_col: str = "key",
    m_bits: int = 1 << 20,
    n_hashes: int = 4,
) -> DataFrame:
    """Membership test: (key, maybe_member). maybe_member is true iff
    ALL n_hashes positions are set — true members always pass (the
    Bloom no-false-negative guarantee); non-members pass only on a
    k-way hash collision."""
    cand = (
        candidates.select(F.col(key_col).cast("string").alias("key"))
        .where(F.col("key").isNotNull())
        .distinct()
    )
    probes = cand.select(
        "key", F.explode(_positions(F.col("key"), n_hashes, m_bits)).alias("pos")
    )
    # distinct guard: a filter assembled by unioning built filters
    # (bloom_a.union(bloom_b)) carries duplicate positions, and a probe
    # row matching twice would push _hits past n_hashes — a false
    # NEGATIVE on a true member. bloom_build output is already
    # distinct, so this is a no-op there.
    # row-level m_bits consistency guard (r6, ADVICE fix): probing with
    # a SMALLER m_bits than build time re-hashes probes into positions
    # the built filter never set and silently yields false negatives on
    # true members. A set position >= the probe m_bits proves the
    # mismatch; raise_error keeps the check in-stream (no extra job) —
    # the cms._sketch_dims analogue of validating what is provable.
    bits = bloom.select(
        F.when(F.col("pos") < m_bits, F.col("pos"))
        .otherwise(
            F.raise_error(
                F.lit(
                    f"bloom_contains: filter has a set position >= m_bits="
                    f"{m_bits} — probe-time m_bits does not match build time"
                )
            ).cast("long")
        )
        .alias("pos")
    ).distinct()
    hits = (
        probes.join(bits.select("pos", F.lit(True).alias("_set")), "pos", "left")
        .groupBy("key")
        .agg(F.sum(F.col("_set").isNotNull().cast("int")).alias("_hits"))
    )
    return hits.select(
        "key", (F.col("_hits") == n_hashes).alias("maybe_member")
    )


# ---------------------------------------------------------------------------
# DuckDB oracle fragments (lockstep with _positions above)
# ---------------------------------------------------------------------------

def duck_bloom_positions(key_expr: str, n_hashes: int, m_bits: int) -> str:
    """SQL list literal of the key's bit positions (for unnest)."""
    parts = [
        f"((('0x' || substr(md5('bloom{i}:' || {key_expr}), 1, 15))::BIGINT)"
        f" % {m_bits})"
        for i in range(n_hashes)
    ]
    return "[" + ", ".join(parts) + "]"
