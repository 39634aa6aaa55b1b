"""Directed partition modularity of the link graph.

THE quality number for any community structure over a web graph —
"how much more intra-community linking than a degree-preserving random
rewiring would give" (Newman & Girvan 2004; directed generalization
Leicht & Newman 2008, PRL 100:118703):

    Q = (1/m) Σ_ij [A_ij − k_i_out · k_j_in / m] · δ(c_i, c_j)
      = internal/m − Σ_c dout_c · din_c / m²

It scores any partition the engine produces — LPA labels
(operators/lpa.py), connected components, the host partition behind
the host-graph contraction (operators/contract.py), k-core shells —
without re-running the clustering. No reference counterpart
(``reference src/ega`` has no partition-quality metric); engine
extension in the §2.9-additions family.

Plan shape: two equi-joins of the edge table onto the assignment
(standard gather), then three map-side-combining aggregates (global
internal count, per-community out-stub count, per-community in-stub
count) and one join over the community table — which is tiny relative
to the edge table (|C| ≤ |V| ≪ |E|). Nothing accumulates on the
driver; every sum is a sum of exact ≤2⁵³ integers in doubles, so the
result is bit-stable under any partitioning.

Conventions: the edge table is taken as given (self-loop/duplicate
hygiene is the caller's, as in triangles.py — a self-loop counts as
internal, per Leicht–Newman's A_ii term). Vertices missing from the
assignment become singleton communities (``__v<id>``) rather than
being silently dropped, so m always equals |edges| and partial
clusterings (e.g. LPA on the largest component only) score honestly.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _edge_communities(
    edges: DataFrame, assignment: DataFrame, community_col: str
) -> DataFrame:
    """edges(src, dst) ⋈ assignment(id, community) on both endpoints →
    (cs, cd) with the singleton fallback for unassigned vertices."""
    a = assignment.select(
        "id", F.col(community_col).cast("string").alias("_c")
    )
    fallback = lambda idc: F.concat(F.lit("__v"), F.col(idc).cast("string"))
    return (
        edges.select("src", "dst")
        .join(a.withColumnRenamed("id", "src"), "src", "left")
        .withColumnRenamed("_c", "_cs")
        .join(a.withColumnRenamed("id", "dst"), "dst", "left")
        .select(
            F.coalesce("_cs", fallback("src")).alias("cs"),
            F.coalesce("_c", fallback("dst")).alias("cd"),
        )
    )


def community_contributions(
    edges: DataFrame,
    assignment: DataFrame,
    community_col: str = "community",
    decimals: int = 9,
) -> DataFrame:
    """Per-community modularity decomposition: one row per community
    that touches any edge —

      (community, internal_edges, dout, din, contribution)

    with contribution = internal/m − dout·din/m² (Leicht–Newman term;
    Σ contributions = Q). dout/din are the community's out-/in-stub
    counts (directed degree sums)."""
    # ec (two joins onto the assignment) is read three times: the m
    # count and both groupBys — persist so the join subtree runs once
    # (released with the session, the semantic_dedup convention)
    ec = _edge_communities(edges, assignment, community_col).persist()
    m = ec.count()
    if m == 0:
        ec.unpersist()
        raise ValueError("modularity undefined on an empty edge set")
    douts = ec.groupBy(F.col("cs").alias("community")).agg(
        F.count("*").alias("dout"),
        F.sum((F.col("cs") == F.col("cd")).cast("long")).alias("internal_edges"),
    )
    dins = ec.groupBy(F.col("cd").alias("community")).agg(
        F.count("*").alias("din")
    )
    md = float(m)
    return (
        douts.join(dins, "community", "full")
        .select(
            "community",
            F.coalesce("internal_edges", F.lit(0)).alias("internal_edges"),
            F.coalesce("dout", F.lit(0)).alias("dout"),
            F.coalesce("din", F.lit(0)).alias("din"),
        )
        .withColumn(
            "contribution",
            F.round(
                F.col("internal_edges") / F.lit(md)
                - (F.col("dout") * F.col("din")) / F.lit(md * md),
                decimals,
            ),
        )
    )


def partition_modularity(
    edges: DataFrame,
    assignment: DataFrame,
    community_col: str = "community",
    decimals: int = 9,
) -> tuple[DataFrame, dict[str, Any]]:
    """Leicht–Newman directed modularity of a vertex partition.

    Returns (summary, info): ``summary`` is ONE row
    (modularity, m, internal_edges, n_communities); info carries the
    same numbers as plain Python (modularity unrounded) plus
    expected_internal_fraction = Σ dout·din / m².
    """
    contrib = community_contributions(edges, assignment, community_col, decimals)
    row = contrib.agg(
        F.sum("internal_edges").alias("i"),
        F.sum(F.col("dout")).alias("m"),
        F.sum(F.col("dout") * F.col("din")).alias("x"),
        F.count("*").alias("nc"),
    ).collect()[0]
    m, i, x, nc = int(row["m"]), int(row["i"]), float(row["x"]), int(row["nc"])
    q = i / m - x / (float(m) * float(m))
    spark = edges.sparkSession
    summary = spark.createDataFrame(
        [(round(q, decimals), m, i, nc)],
        "modularity double, m bigint, internal_edges bigint, n_communities bigint",
    )
    info = {
        "modularity": q,
        "m": m,
        "internal_edges": i,
        "n_communities": nc,
        "expected_internal_fraction": x / (float(m) * float(m)),
    }
    return summary, info
