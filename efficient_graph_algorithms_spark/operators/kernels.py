"""Kernel-score queries from the reference's GraphKernel pipeline.

- ``k_step_random_walk``: x ← Pᵀx applied k times from a seed
  distribution — the reference's ``random_walk_kernel``
  (``reference src/ega/algorithms/graph_kernels.py:66-68``: column
  normalize then matrix power). Restricted to k SpMV rounds; no
  teleport/dangling redistribution (walk mass on dangling nodes is
  dropped, matching the reference's column-normalized semantics where
  dangling columns are zero after the 0/0→0 convention).
- ``heat_kernel_diffusion``: exp(-tL)·x ≈ Σ_{j≤k} (-t)^j/j! · L^j x,
  truncated-Taylor loop of SpMVs — the reference's ``heat_kernel``
  (``reference src/ega/algorithms/graph_kernels.py:101-105``:
  ``expm(-t(D-A))``) without materializing the (N,N) matrix.
- ``one_hot_seeds``: indicator field over vertices (the reference's
  ``onehot_encode``, ``graph_kernels.py:369-379``).

Each step is the engine's single gather-scatter primitive; plans stay
one-shuffle-per-round with the field table orders of magnitude smaller
than edges.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def one_hot_seeds(vertices: DataFrame, seeds: list[int], value: float = 1.0) -> DataFrame:
    """(id, value) indicator field over the vertex set."""
    return vertices.select(
        "id",
        F.when(F.col("id").isin([int(s) for s in seeds]), F.lit(value))
        .otherwise(F.lit(0.0))
        .alias("value"),
    )


def _out_transition(edges: DataFrame) -> DataFrame:
    """(src, dst, w) with w = 1/out_deg(src) — column-normalized P."""
    deg = edges.groupBy("src").agg(F.count("*").alias("d"))
    return edges.join(deg, "src").select(
        "src", "dst", (F.lit(1.0) / F.col("d")).alias("w")
    )


def k_step_random_walk(
    edges: DataFrame, field: DataFrame, k: int = 2
) -> DataFrame:
    """k rounds of x ← Pᵀx. field: (id, value). Returns (id, value)."""
    p = _out_transition(edges).persist()
    x = field
    for _ in range(k):
        x = (
            p.join(x, p["src"] == x["id"])
            .groupBy(p["dst"].alias("id"))
            .agg(F.sum(F.col("w") * F.col("value")).alias("value"))
            .localCheckpoint(eager=False)
        )
    # re-attach zero rows for vertices that received no mass
    out = field.select("id").join(x, "id", "left").select(
        "id", F.coalesce(F.col("value"), F.lit(0.0)).alias("value")
    )
    p.unpersist()
    return out


def heat_kernel_diffusion(
    edges: DataFrame,
    field: DataFrame,
    t: float = 0.5,
    k: int = 4,
    weight_col: str | None = None,
) -> DataFrame:
    """Truncated-Taylor exp(-tL)·x over the undirected simple graph.

    L = D - A. Each Taylor term needs one SpMV (A·term) plus the
    degree-scaled diagonal — all expressed as joins/aggregates.
    Returns (id, value) ≈ Σ_{j=0..k} (-t)^j/j! L^j x.

    weight_col: name of an edge weight column — L becomes the weighted
    Laplacian (D = diag of weighted degree, A = weighted adjacency);
    parallel (src, dst) duplicates keep the max weight. None → w = 1.
    """
    w_expr = F.col(weight_col) if weight_col else F.lit(1.0)
    directed = edges.select("src", "dst", w_expr.cast("double").alias("w"))
    sym = (
        directed.unionByName(
            directed.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
            )
        )
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.max("w").alias("w"))
        .persist()
    )
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.sum("w").alias("deg"))

    term = field.select("id", F.col("value").alias("tv"))
    acc = field.select("id", F.col("value").alias("value"))
    for j in range(1, k + 1):
        # L·term = deg*term - A·term
        a_term = (
            sym.join(term, sym["src"] == term["id"])
            .groupBy(sym["dst"].alias("id"))
            .agg(F.sum(F.col("w") * F.col("tv")).alias("av"))
        )
        term = (
            acc.select("id")
            .join(deg, "id", "left")
            .join(term, "id", "left")
            .join(a_term, "id", "left")
            .select(
                "id",
                (
                    F.coalesce(F.col("deg"), F.lit(0)).cast("double")
                    * F.coalesce(F.col("tv"), F.lit(0.0))
                    - F.coalesce(F.col("av"), F.lit(0.0))
                ).alias("tv"),
            )
            .localCheckpoint(eager=False)
        )
        coef = (-t) ** j / math.factorial(j)
        acc = (
            acc.join(term, "id", "left")
            .select(
                "id",
                (F.col("value") + F.lit(coef) * F.coalesce(F.col("tv"), F.lit(0.0))).alias("value"),
            )
            .localCheckpoint(eager=False)
        )
    sym.unpersist()
    return acc


def weighted_transition(edges: DataFrame, weight_col: str) -> DataFrame:
    """(src, dst, w) with w = weight / Σ weight over src — the
    row-normalized WEIGHTED transition (anchor/link weights)."""
    e = edges.select("src", "dst", F.col(weight_col).cast("double").alias("wt"))
    tot = e.groupBy("src").agg(F.sum("wt").alias("tw"))
    return e.join(tot, "src").select(
        "src", "dst", (F.col("wt") / F.col("tw")).alias("w")
    )


def damped_weighted_walk(
    edges: DataFrame,
    field: DataFrame,
    alpha: float = 0.85,
    k: int = 3,
    weight_col: str | None = None,
) -> DataFrame:
    """k pinned steps of x ← (1-α)·x₀ + α·P_wᵀx — the personalized-
    PageRank iteration over the weighted transition, the web-tier
    extension of ``k_step_random_walk`` (anchor/link-weighted ranking;
    same shape as the reference's rwr kernel, ``reference
    src/ega/algorithms/graph_kernels.py:72-79``, plus edge weights).

    weight_col None → uniform 1/out_deg (identical P to
    ``k_step_random_walk``). Walk mass entering dangling vertices is
    NOT redistributed (the reference's column-normalized convention);
    use ``operators/pagerank.py`` when full dangling/teleport PageRank
    semantics are wanted. One gather-scatter shuffle per step; the
    field table stays orders of magnitude smaller than edges.
    """
    p = (
        weighted_transition(edges, weight_col)
        if weight_col
        else _out_transition(edges)
    ).persist()
    x0 = field.select("id", F.col("value").alias("v0"))
    x = field
    for _ in range(k):
        mv = (
            p.join(x, p["src"] == x["id"])
            .groupBy(p["dst"].alias("id"))
            .agg(F.sum(F.col("w") * F.col("value")).alias("mv"))
        )
        x = (
            x0.join(mv, "id", "left")
            .select(
                "id",
                (
                    F.lit(1.0 - alpha) * F.col("v0")
                    + F.lit(alpha) * F.coalesce(F.col("mv"), F.lit(0.0))
                ).alias("value"),
            )
            .localCheckpoint(eager=False)
        )
    p.unpersist()
    return x
