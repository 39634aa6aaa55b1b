"""Triangle counting via degree-ordered wedge joins.

Semantics: A² common-neighbor counts (the reference's ICN kernel
numerator, ``reference src/ega/algorithms/graph_kernels.py:109-112``) —
each unordered vertex triple {a,b,c} with all three edges present
counts once globally and once per member vertex.

Plan (the classic MapReduce triangle algorithm, shuffle-optimal):
1. simple undirected edge set, canonical (lo, hi);
2. total order: rank(v) = (degree(v), v); orient every edge from
   lower-rank → higher-rank endpoint — every vertex then has
   oriented out-degree O(sqrt(|E|)), which bounds wedge count;
3. wedges: self-join oriented edges on shared source (u→a, u→b, a<b
   in rank order);
4. close wedges: semi-join (a,b) against the oriented edge set;
5. triangles counted once each; per-vertex counts via explode of the
   triple.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def simple_undirected(edges: DataFrame) -> DataFrame:
    """Canonical (lo, hi) undirected simple edges."""
    return (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("lo"), F.greatest("src", "dst").alias("hi")
        )
        .distinct()
    )


def oriented_edges(edges: DataFrame) -> DataFrame:
    """Orient each undirected edge low-rank → high-rank by (degree, id)."""
    und = simple_undirected(edges)
    deg = (
        und.select(F.col("lo").alias("id"))
        .unionByName(und.select(F.col("hi").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    e = (
        und.join(deg.withColumnRenamed("id", "lo").withColumnRenamed("deg", "deg_lo"), "lo")
        .join(deg.withColumnRenamed("id", "hi").withColumnRenamed("deg", "deg_hi"), "hi")
    )
    fwd = F.struct(F.col("deg_lo"), F.col("lo")) < F.struct(F.col("deg_hi"), F.col("hi"))
    return e.select(
        F.when(fwd, F.col("lo")).otherwise(F.col("hi")).alias("u"),
        F.when(fwd, F.col("hi")).otherwise(F.col("lo")).alias("v"),
    )


def triangle_triples(edges: DataFrame) -> DataFrame:
    """All triangles as (a, b, c) — each exactly once."""
    o = oriented_edges(edges).persist()
    e1 = o.select(F.col("u").alias("w"), F.col("v").alias("a"))
    e2 = o.select(F.col("u").alias("w"), F.col("v").alias("b"))
    wedges = e1.join(e2, "w").where(F.col("a") < F.col("b"))
    closed = wedges.join(
        o.select(F.col("u").alias("a"), F.col("v").alias("b")).unionByName(
            o.select(F.col("u").alias("b"), F.col("v").alias("a"))
        ),
        ["a", "b"],
        "left_semi",
    )
    return closed.select(F.col("w").alias("a"), F.col("a").alias("b"), F.col("b").alias("c"))


def triangle_count(edges: DataFrame) -> DataFrame:
    """Single-row DataFrame: (triangles bigint) — global count."""
    return triangle_triples(edges).agg(F.count("*").alias("triangles"))


def triangles_per_vertex(edges: DataFrame, vertices: DataFrame | None = None) -> DataFrame:
    """(id, triangles) — per-vertex membership counts; vertices not in
    any triangle get 0 when a vertex table is supplied."""
    t = triangle_triples(edges)
    per = (
        t.select(F.explode(F.array("a", "b", "c")).alias("id"))
        .groupBy("id")
        .agg(F.count("*").alias("triangles"))
    )
    if vertices is not None:
        per = vertices.select("id").join(per, "id", "left").select(
            "id", F.coalesce(F.col("triangles"), F.lit(0)).alias("triangles")
        )
    return per
