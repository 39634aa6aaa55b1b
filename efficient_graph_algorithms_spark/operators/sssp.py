"""Weighted single-source / multi-source shortest paths.

Level-synchronous Bellman–Ford relaxation — the distributed SSSP that
Pregel/Giraph/GraphX all ship as their canonical example, and the
weighted complement of the engine's unweighted BFS faces (truncated
closeness `operators/anf.py`, min-plus relational join). Distances
from a SEED SET (crawl entry points, trusted cores, a query page)
over non-negatively weighted links.

After r rounds the state holds exactly min-cost-over-≤r-edge paths —
so a fixed-round run has a closed unrolled form (the SQL-oracle
contract of the kcore/ktruss faces), and the fixpoint is Dijkstra's
answer. Non-negative weights keep the relaxation monotone, which is
what makes the improved==0 early-stop sound.

Plan shape per round: frontier-style state (id, dist) over REACHED
vertices only; one equi-join edges⋈state on src (the gather), one
map-side-combining min-groupBy on dst, one full-outer merge with
``least``. The improvement count rides the state-cut write as an
observe() metric (one job per round, the pagerank.py:384 pattern);
lineage is cut every round via StateCutter. State is bounded by the
reached ball, never the vertex set, until the ball saturates.

No reference counterpart in ``reference src/ega`` (its distances are
diffusion-based); engine extension in the §2.9-additions family.
"""

from __future__ import annotations

import warnings
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from efficient_graph_algorithms_spark.plans.lineage import StateCutter


def shortest_paths(
    spark: SparkSession,
    edges: DataFrame,
    sources: DataFrame,
    weight_col: str = "w",
    max_iter: int = 100,
    num_partitions: int | None = None,
) -> tuple[DataFrame, dict[str, Any]]:
    """Returns (dist(id, dist), info).

    edges: (src, dst, <weight_col>) directed, weights ≥ 0 (validated on
    the first pass — a negative weight raises). sources: (id) seed set;
    distance 0 at every seed. ``dist`` covers REACHED vertices only.
    ``max_iter`` bounds relaxation rounds; if hit, dist is exact over
    paths of ≤ max_iter edges (min-cost-bounded-hop semantics) and
    info["converged"] is False.
    """
    sp = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    w = F.col(weight_col)
    rel = (
        edges.select("src", "dst", w.alias("_w"))
        .repartition(sp, "src")
        .persist()
    )
    # null weights must fail too: null < 0 is null, so they'd slip the
    # negative check and then silently drop their edges from every
    # relaxation (dist + null is null, min() ignores it) — distances
    # would overstate while reporting converged=True
    n_neg = rel.where(
        (F.col("_w") < 0) | F.col("_w").isNull()
    ).count()  # also materializes the persist
    if n_neg:
        rel.unpersist()
        raise ValueError(
            f"{n_neg} negative or null edge weights; SSSP requires w >= 0"
        )

    state = sources.select("id").distinct().select(
        "id", F.lit(0).cast("double").alias("dist")
    )
    info: dict[str, Any] = {"rounds": 0, "improved": []}
    converged = False
    with StateCutter(spark, "sssp", keep=2) as cut:
        state = cut(state)
        for it in range(1, max_iter + 1):
            cand = (
                rel.join(state.withColumnRenamed("id", "src"), "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.min(F.col("dist") + F.col("_w")).alias("_cand"))
            )
            merged = (
                state.join(cand, "id", "full")
                .select(
                    "id",
                    F.least(
                        F.coalesce("dist", F.lit(float("inf"))),
                        F.coalesce("_cand", F.lit(float("inf"))),
                    ).alias("dist"),
                    # scratch for the convergence metric; dropped by cut
                    (
                        F.col("_cand").isNotNull()
                        & (F.col("dist").isNull() | (F.col("_cand") < F.col("dist")))
                    ).cast("long").alias("_obs_improved"),
                )
            )
            state, got = cut.observe(merged, improved=F.sum("_obs_improved"))
            info["rounds"] = it
            improved = int(got["improved"] or 0)
            info["improved"].append(improved)
            if improved == 0:
                converged = True
                break
        state = state.localCheckpoint(eager=True)  # pin before cut dir drops
    rel.unpersist()
    info["converged"] = converged
    if not converged:
        warnings.warn(
            f"shortest_paths hit max_iter={max_iter} before the fixpoint — "
            "distances are exact only over paths of <= max_iter edges",
            stacklevel=2,
        )
    return state, info
