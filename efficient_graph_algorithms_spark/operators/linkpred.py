"""Link prediction over the undirected link graph — Adamic–Adar,
common-neighbors, and Jaccard scores for vertex pairs that are NOT yet
edges (Liben-Nowell & Kleinberg 2003; Adamic & Adar 2003).

For a candidate pair (a, b) with common-neighbor set CN(a, b):

- common neighbors  n_common = |CN(a, b)|,
- Adamic–Adar       aa       = sum over w in CN(a, b) of 1 / ln(deg w),
- Jaccard           jaccard  = n_common / (deg a + deg b - n_common).

Plan shape: exactly the co-citation wedge self-join
(``operators/cocite.py``) run on the symmetrized adjacency — pairs of
neighbors sharing a center vertex — followed by a left-anti join
against the edge set so only NEW links are scored. The center's
Adamic–Adar weight 1/ln(deg) rides the adjacency rows into the wedge
join, so one groupBy produces both the count and the weighted sum.

Skew posture (the 100 TB question): a hub center with degree d emits
C(d, 2) candidate pairs, so centers above ``degree_cap`` are dropped
from wedge generation — the same cap as co-citation/mirror detection,
and here it is *principled* as well as necessary: Adamic–Adar was
designed to discount exactly those centers (weight 1/ln d → 0), so a
mega-hub's pairs carry near-zero score and their omission changes
rankings negligibly while bounding pair volume at sum min(d, cap)^2.
Degree-1 centers cannot form wedges and are filtered out up front,
which also keeps 1/ln(1) from ever being evaluated (ANSI mode).
Endpoint degrees for Jaccard stay UNCAPPED (true degrees); n_common/aa
are computed over the cap-filtered wedge set, and the returned info
reports how many centers the cap dropped.

No reference counterpart (``reference src/ega`` ships similarity
kernels over given graphs, not edge-formation scoring); engine
extension in the §2.9-additions family, sharing the wedge machinery of
``reference src/ega/algorithms/graph_kernels.py:109-112``'s ICN
common-neighbor statistic.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from efficient_graph_algorithms_spark.operators.triangles import simple_undirected


def adjacency_with_degree(
    edges: DataFrame, persist_und: bool = False
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(und, adj, deg): canonical undirected pairs (lo, hi), the
    symmetrized simple adjacency (id, nbr), and the undirected degree
    table (id, deg). ``persist_und`` caches the distinct pair set when
    the caller re-reads it (both adj union branches + an anti-join);
    released with the session (the semantic_dedup convention)."""
    und = simple_undirected(edges)
    if persist_und:
        und = und.persist()
    adj = und.select(F.col("lo").alias("id"), F.col("hi").alias("nbr")).unionByName(
        und.select(F.col("hi").alias("id"), F.col("lo").alias("nbr"))
    )
    deg = adj.groupBy("id").agg(F.count("*").alias("deg"))
    return und, adj, deg


def link_prediction_topk(
    edges: DataFrame,
    k: int = 20,
    min_common: int = 2,
    degree_cap: int | None = 64,
    decimals: int = 9,
) -> tuple[DataFrame, dict[str, Any]]:
    """Top-k non-edge pairs by Adamic–Adar score.

    Returns (pairs, info): ``pairs`` has columns
    (a, b, n_common, aa, jaccard) with a < b, ordered by
    (aa desc, a, b) — a total order, so the top-k is deterministic.
    Scores are rounded to ``decimals`` for cross-engine agreement and
    the rounded aa is also the sort key (ties broken by the pair id).
    ``info`` reports n_capped_centers (hub centers the cap dropped).
    """
    info: dict[str, Any] = {}
    und, adj, deg = adjacency_with_degree(edges, persist_und=True)

    # Wedge centers: degree >= 2 (a 1-degree vertex has no wedge and
    # would evaluate 1/ln(1)); degree <= cap (hub pair-volume bound).
    centers = adj.join(deg, "id").where(F.col("deg") >= 2)
    if degree_cap is not None:
        info["n_capped_centers"] = (
            deg.where(F.col("deg") > F.lit(degree_cap)).count()
        )
        centers = centers.where(F.col("deg") <= F.lit(degree_cap))
    else:
        info["n_capped_centers"] = 0
    # The AA weight rides each adjacency row into the wedge join.
    centers = centers.withColumn(
        "w_aa", F.lit(1.0) / F.log(F.col("deg").cast("double"))
    ).persist()

    x = centers.select(F.col("id").alias("_c"), F.col("nbr").alias("a"), "w_aa")
    y = centers.select(F.col("id").alias("_c"), F.col("nbr").alias("b"))
    scored = (
        x.join(y, "_c")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_common"), F.sum("w_aa").alias("aa_raw"))
        .where(F.col("n_common") >= F.lit(min_common))
    )
    # Only predict NEW links: drop pairs already present as edges.
    # (a, b) is canonical a < b, matching und's (lo, hi).
    non_edges = scored.join(
        und.select(F.col("lo").alias("a"), F.col("hi").alias("b")),
        ["a", "b"],
        "left_anti",
    )
    deg_a = deg.select(F.col("id").alias("a"), F.col("deg").alias("deg_a"))
    deg_b = deg.select(F.col("id").alias("b"), F.col("deg").alias("deg_b"))
    out = (
        non_edges.join(deg_a, "a")
        .join(deg_b, "b")
        .select(
            "a",
            "b",
            "n_common",
            F.round(F.col("aa_raw"), decimals).alias("aa"),
            F.round(
                F.col("n_common").cast("double")
                / (F.col("deg_a") + F.col("deg_b") - F.col("n_common")).cast(
                    "double"
                ),
                decimals,
            ).alias("jaccard"),
        )
        .orderBy(F.col("aa").desc(), "a", "b")
        .limit(k)
    )
    return out, info


def local_clustering(edges: DataFrame, decimals: int = 9) -> DataFrame:
    """Per-vertex local clustering coefficient (Watts & Strogatz 1998):
    lcc(v) = 2 * triangles(v) / (deg(v) * (deg(v) - 1)), 0 for deg < 2.

    Returns (id, deg, triangles, lcc) for every vertex incident to at
    least one edge, on the undirected simple graph. Composes the
    degree-ordered wedge-join triangle counts (``operators/
    triangles.py`` — oriented out-degree O(sqrt |E|)) with the degree
    table: two aggregate shuffles plus the triangle join, each the plan
    the dedicated operators already use.
    """
    from efficient_graph_algorithms_spark.operators.triangles import (
        triangles_per_vertex,
    )

    _, _, deg = adjacency_with_degree(edges)
    tri = triangles_per_vertex(edges, vertices=deg.select("id"))
    d = F.col("deg").cast("double")
    return deg.join(tri, "id").select(
        "id",
        "deg",
        "triangles",
        F.when(
            F.col("deg") >= 2,
            F.round(F.lit(2.0) * F.col("triangles") / (d * (d - F.lit(1.0))), decimals),
        )
        .otherwise(F.lit(0.0))
        .alias("lcc"),
    )
