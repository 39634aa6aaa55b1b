"""Approximate betweenness centrality: k-source truncated Brandes.

Engine extension (no reference counterpart — the reference is a GFI
library): the standard sampled-centrality estimator for web graphs
(Brandes 2001 dependency accumulation; Bader et al. 2007 source
sampling; radius truncation bounds the per-source ball like the
engine's truncated_closeness / ANF operators).

Two level-synchronous phases over the same edge relation:

- **forward** (shortest-path counting): per round one equi-join
  (frontier x out-edges) + one per-(source, vertex) sigma sum + one
  anti-join against the visited set — exactly the closeness BFS shape
  with a path-count column added. State is bounded by the truncated
  ball mass of the sampled sources, never |V|^2.
- **backward** (dependency accumulation): for d = deepest-1 .. 1,
  delta_d(s, v) = sum over successors w at d+1 of
  sigma_d(s, v) / sigma_{d+1}(s, w) * (1 + delta_{d+1}(s, w)) —
  one equi-join per level, same keys, run in reverse.

bc(v) = sum over sources and levels of delta (sources themselves
excluded). Each level is pinned with an eager localCheckpoint because
the backward pass re-reads every forward level (O(max_radius) pinned
DataFrames — bounded by the radius, which is the scale dial).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def betweenness(
    spark: SparkSession,
    edges: DataFrame,
    sources: DataFrame | None = None,
    max_radius: int = 2,
    directed: bool = False,
    num_partitions: int | None = None,
) -> tuple[DataFrame, dict[str, Any]]:
    """(id, bc): truncated-Brandes betweenness over the sampled
    ``sources`` (DataFrame with an ``id`` column; default = every
    vertex). Only vertices with positive accumulated dependency are
    returned; bc is rounded to 6 decimals (the cross-engine float
    convention used throughout)."""
    sp = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    if not directed:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    e = e.distinct().repartition(sp, "src").persist()
    e.count()
    try:
        verts = (
            e.select(F.col("src").alias("id"))
            .unionByName(e.select(F.col("dst").alias("id")))
            .distinct()
        )
        src_ids = (sources.select("id") if sources is not None else verts).distinct()

        info: dict[str, Any] = {"rounds": 0, "level_sizes": []}
        lvl0 = src_ids.select(
            "id", F.col("id").alias("m"), F.lit(1.0).alias("sigma")
        ).localCheckpoint(eager=True)
        levels = [lvl0]
        visited = lvl0.select("id", "m")
        for r in range(1, max_radius + 1):
            grown = (
                levels[-1]
                .join(e, levels[-1]["m"] == e["src"])
                .groupBy("id", F.col("dst").alias("m"))
                .agg(F.sum("sigma").alias("sigma"))
            )
            new = grown.join(visited, ["id", "m"], "left_anti").localCheckpoint(
                eager=True
            )
            n_new = new.count()
            info["rounds"] = r
            info["level_sizes"].append(n_new)
            if n_new == 0:
                break
            levels.append(new)
            visited = visited.unionByName(new.select("id", "m")).localCheckpoint(
                eager=True
            )
        # backward: deepest level carries delta 0 (truncation semantics)
        deepest = len(levels) - 1
        delta: DataFrame | None = None
        acc: DataFrame | None = None
        for d in range(deepest - 1, 0, -1):
            lv = levels[d + 1]
            if delta is None:
                succ = lv.select(
                    "id",
                    F.col("m").alias("w"),
                    (F.lit(1.0) / F.col("sigma")).alias("_inv"),
                )
            else:
                # LEFT join: a successor with no deeper successors has
                # delta 0 but still contributes (1 + 0)/sigma
                succ = lv.join(
                    delta.select("id", "m", F.col("delta").alias("_dl")),
                    ["id", "m"],
                    "left",
                ).select(
                    "id",
                    F.col("m").alias("w"),
                    (
                        (F.lit(1.0) + F.coalesce(F.col("_dl"), F.lit(0.0)))
                        / F.col("sigma")
                    ).alias("_inv"),
                )
            cur = (
                levels[d]
                .join(e, levels[d]["m"] == e["src"])
                .select("id", "m", "sigma", F.col("dst").alias("w"))
                .join(succ, ["id", "w"])
                .groupBy("id", "m")
                .agg(F.sum(F.col("sigma") * F.col("_inv")).alias("delta"))
            ).localCheckpoint(eager=True)
            # vertices at level d with no successors keep delta 0 — they
            # contribute nothing, so omitting their rows is equivalent
            delta = cur
            acc = cur if acc is None else acc.unionByName(cur)
        if acc is None:
            # derive the id type from the input so the empty path has
            # the same schema as a non-empty run (string-id graphs)
            _idt = edges.schema["src"].dataType.simpleString()
            out = spark.createDataFrame([], f"id {_idt}, bc double")
        else:
            out = (
                acc.groupBy(F.col("m").alias("id"))
                .agg(F.round(F.sum("delta"), 6).alias("bc"))
                .where(F.col("bc") > 0)
                .localCheckpoint(eager=True)
            )
        return out, info
    finally:
        e.unpersist()
