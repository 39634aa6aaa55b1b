"""Maximal independent set via parallel greedy-by-random-order (Luby
1986; Blelloch–Fineman–Shun 2012's greedy-permutation form).

Every vertex draws a fixed priority p(v) = portable 60-bit md5 hash of
its id (``functions/hashing.py`` — the same cross-engine hash the
dedup family uses, so SQL oracles reproduce it bit-exactly). Rounds
are synchronous: a live vertex enters the MIS iff (p(v), v) is
strictly smaller than (p(u), u) for every LIVE neighbor u — the
(hash, id) pair is a total order, so there are no ties and two
adjacent vertices can never both win a round. Winners' live neighbors
are removed; the loop repeats on the shrunken graph until no vertex is
live. With a fixed random order this computes exactly the sequential
greedy MIS of that order, in O(log n) synchronous rounds w.h.p. —
deterministic under any partitioning, like every operator here.

Plan shape per round: one groupBy(src) min-aggregate over the live
edge set (map-side combining — the scatter-gather shape of
pagerank/kcore), one left join of the live vertex set against those
minima, one semi-join to find winners' neighbors, two anti-joins to
shrink the edge set. State = (vertex table, live edge table), both
StateCutter-cut per round (the kcore/pagerank lineage discipline), so
memory per round is bounded by the live subgraph and the loop is
resumable-shaped. The removed set per round is the AQE-broadcast-able
side of the anti-joins.

No reference counterpart (``reference src/ega`` ships field
integrators, not symmetry-breaking primitives); engine extension in
the §2.9-additions family — MIS is the standard building block for
distributed coloring/scheduling over the link graph.
"""

from __future__ import annotations

import warnings
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from efficient_graph_algorithms_spark.plans.lineage import StateCutter

# Portable priority: identical in DuckDB as
#   ('0x' || substr(md5('mis:' || CAST(id AS VARCHAR)), 1, 15))::BIGINT
_SALT = "mis:"


def mis_priority(id_col) -> F.Column:
    from efficient_graph_algorithms_spark.functions.hashing import md5_60bit_col

    return md5_60bit_col(F.concat(F.lit(_SALT), id_col.cast("string")))


def maximal_independent_set(
    spark: SparkSession,
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_rounds: int = 100,
) -> tuple[DataFrame, dict[str, Any]]:
    """Returns (state, info).

    ``state`` is (id, cls, round): cls = 'mis' for members, 'out' for
    vertices removed as a winner's neighbor, 'live' only when
    ``max_rounds`` stopped the loop early (then info['converged'] is
    False); ``round`` is the 1-based round the vertex was decided in
    (0 for still-live rows). Vertices with no edges (only possible via
    an explicit ``vertices`` table) join the MIS in round 1.
    """
    sym = (
        edges.select("src", "dst")
        .unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    v = sym.select(F.col("src").alias("id")).distinct()
    if vertices is not None:
        v = v.unionByName(vertices.select("id")).distinct()

    info: dict[str, Any] = {"rounds": 0}
    converged = False
    with StateCutter(spark, "mis", keep=3) as cut:
        state = cut(
            v.select(
                "id",
                mis_priority(F.col("id")).alias("p"),
                F.lit("live").alias("cls"),
                F.lit(0).alias("round"),
            )
        )
        live_e = cut(sym)
        for r in range(1, max_rounds + 1):
            live_v = state.where(F.col("cls") == "live")
            mn = (
                live_e.join(
                    live_v.select(F.col("id").alias("dst"), F.col("p").alias("np")),
                    "dst",
                )
                .groupBy("src")
                .agg(F.min(F.struct(F.col("np"), F.col("dst"))).alias("mn"))
                .select(F.col("src").alias("id"), "mn")
            )
            winners = (
                live_v.join(mn, "id", "left")
                .where(
                    F.col("mn").isNull()
                    | (F.struct(F.col("p"), F.col("id")) < F.col("mn"))
                )
                .select("id")
            )
            removed = (
                live_e.join(
                    winners.select(F.col("id").alias("src")), "src", "left_semi"
                )
                .select(F.col("dst").alias("id"))
                .distinct()
            )
            # A winner is a strict local minimum, so no winner is
            # adjacent to another winner — `removed` and `winners`
            # are disjoint by construction.
            win = winners.withColumn("_w", F.lit(1))
            rem = removed.withColumn("_r", F.lit(1))
            nxt = (
                state.join(win, "id", "left")
                .join(rem, "id", "left")
                .select(
                    "id",
                    "p",
                    F.when(F.col("_w").isNotNull(), F.lit("mis"))
                    .when(F.col("_r").isNotNull(), F.lit("out"))
                    .otherwise(F.col("cls"))
                    .alias("cls"),
                    F.when(
                        F.col("_w").isNotNull() | F.col("_r").isNotNull(), F.lit(r)
                    )
                    .otherwise(F.col("round"))
                    .alias("round"),
                )
            )
            decided = winners.unionByName(removed)
            live_e = cut(
                live_e.join(
                    decided.select(F.col("id").alias("src")), "src", "left_anti"
                ).join(decided.select(F.col("id").alias("dst")), "dst", "left_anti")
            )
            state, got = cut.observe(
                nxt, n_live=F.sum(F.when(F.col("cls") == "live", 1).otherwise(0))
            )
            info["rounds"] = r
            if int(got["n_live"] or 0) == 0:
                converged = True
                break
        out = state.select("id", "cls", "round").localCheckpoint(eager=True)
    info["converged"] = converged
    if not converged:
        warnings.warn(
            f"maximal_independent_set hit max_rounds={max_rounds} with live "
            "vertices remaining — 'live' rows are undecided",
            stacklevel=2,
        )
    return out, info
