"""Recursive Gromov-Wasserstein graph partitioning.

Semantics follow the reference's partition driver family
(``reference src/ega/algorithms/gromov_wasserstein_graphs.py``:
``estimate_target_distribution`` 731-750, ``node_cluster_assignment``
866-920, ``graph_partition`` 922-957, ``recursive_graph_partition``
960-1029; exercised by
``reference scripts/experiments/test_gromov_wasserstein.py``):

    p_t       = resample(sorted-desc p_s, dim_t points, linear interp)
    cost_t    = diag(p_t)                      (proposed cluster graph)
    T         = gromov_wasserstein_discrepancy(C_s, cost_t, p_s, p_t)
    cluster r = argmax_j T[r, j] / p_t[j]      (first max on ties)
    recurse into clusters with more than max_node_num nodes

Spark realization: node assignments live in ONE distributed
(i, leaf, p) table throughout — subgraphs are filters on it joined
back to the edge table, never driver-side materializations; the GW
solve per leaf is the distributed proximal-Sinkhorn operator with the
tiny dim_t-node target riding along as a broadcast; the target
distribution needs only the <= 2*dim_t order statistics of p within a
leaf, found with a range-repartitioned two-phase rank (no global
single-partition window). The driver holds the leaf WORK-LIST (leaf
ids + node counts, O(#leaves)) and dim_t-sized vectors — never node
data.

One deliberate deviation, shared with the NumPy mirror: the reference
sets outer_iteration = n_s per leaf; here the caller pins outer_iter
so tests and SQL oracles can fix iteration counts (pass
outer_iter=None to recover the reference's per-leaf n_s rule).
"""

from __future__ import annotations

from typing import Any

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from efficient_graph_algorithms_spark.operators.gw import (
    gromov_wasserstein_discrepancy,
)


def estimate_target_distribution(
    probs: list[DataFrame], dim_t: int = 2
) -> np.ndarray:
    """Average of each graph's descending-sorted node distribution
    linearly resampled at dim_t points on [0, 1], normalized
    (reference ``estimate_target_distribution``,
    gromov_wasserstein_graphs.py:731-750, np.interp semantics).

    Each probs entry is an (i, p) DataFrame. Only the order statistics
    at the <= 2*dim_t interpolation ranks are needed, so the plan is:
    range-repartition on p descending, per-partition row_number +
    partition-count offsets (two-phase rank — no global window), then
    filter to the needed ranks and collect that handful of rows.
    """
    x_t = np.linspace(0.0, 1.0, dim_t)
    p_t = np.zeros(dim_t)
    for df in probs:
        n = df.count()
        if n == 1:
            p_t += float(df.select("p").collect()[0][0])
            continue
        # fractional positions of the dim_t sample points in rank space
        pos = x_t * (n - 1)
        lo = np.floor(pos).astype(int)
        hi = np.ceil(pos).astype(int)
        need = sorted(set(lo.tolist()) | set(hi.tolist()))
        got = _rank_lookup(df, need)
        frac = pos - lo
        p_t += (1.0 - frac) * np.array([got[int(k)] for k in lo]) + frac * np.array(
            [got[int(k)] for k in hi]
        )
    return p_t / p_t.sum()


def _rank_lookup(df: DataFrame, need: list[int], parts: int = 32) -> dict[int, float]:
    """p values at the given 0-based ranks of the descending-p order
    (ties broken by i ascending for determinism; np.sort compares
    values only, so the tie policy is observationally irrelevant).
    Range shuffle + per-partition row_number + broadcast offsets — the
    same distributed prefix-sum shape as the training-shard packer
    (operators/sampling.py), no global single-partition window."""
    spark = df.sparkSession
    ranged = df.repartitionByRange(parts, F.desc("p"), F.asc("i")).withColumn(
        "_pid", F.spark_partition_id()
    ).persist()
    counts = {
        r["_pid"]: r["n"]
        for r in ranged.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    }
    offs = {}
    acc = 0
    for pid in sorted(counts):
        offs[pid] = acc
        acc += counts[pid]
    off_df = F.broadcast(
        spark.createDataFrame(
            [(pid, off) for pid, off in offs.items()], "_pid int, _off long"
        )
    )
    w = Window.partitionBy("_pid").orderBy(F.desc("p"), F.asc("i"))
    rows = (
        ranged.withColumn("_rn", F.row_number().over(w) - 1)
        .join(off_df, "_pid")
        .select("p", (F.col("_rn") + F.col("_off")).alias("rank"))
        .where(F.col("rank").isin([int(x) for x in need]))
        .collect()
    )
    ranged.unpersist()
    return {int(r["rank"]): float(r["p"]) for r in rows}


def node_cluster_assignment(
    trans: DataFrame, p_t: np.ndarray
) -> DataFrame:
    """(i, j, t) transport + cluster distribution -> (i, cluster):
    cluster(i) = argmax_j t / p_t[j], first max on ties (np.argmax
    semantics; reference node_cluster_assignment,
    gromov_wasserstein_graphs.py:866-920)."""
    spark = trans.sparkSession
    pt_df = F.broadcast(
        spark.createDataFrame(
            [(int(j), float(v)) for j, v in enumerate(p_t)], "j long, pc double"
        )
    )
    w = Window.partitionBy("i").orderBy(F.desc(F.col("t") / F.col("pc")), F.asc("j"))
    return (
        trans.join(pt_df, "j")
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("i", F.col("j").alias("cluster"))
    )


def graph_partition(
    spark: SparkSession,
    cost_s: DataFrame,
    p_s: DataFrame,
    dim_t: int = 2,
    p_t: np.ndarray | None = None,
    **gw_kwargs: Any,
) -> tuple[DataFrame, np.ndarray, DataFrame]:
    """Single-level GW partition (reference ``graph_partition``,
    gromov_wasserstein_graphs.py:922-957): GW against the proposed
    diag(p_t) cluster graph, then argmax cluster assignment.
    Returns (assign(i, cluster), p_t, trans(i, j, t))."""
    if p_t is None:
        p_t = estimate_target_distribution([p_s], dim_t)
    cost_t = spark.createDataFrame(
        [(int(j), int(j), float(v)) for j, v in enumerate(p_t)],
        "i long, j long, c double",
    )
    pt_df = spark.createDataFrame(
        [(int(j), float(v)) for j, v in enumerate(p_t)], "j long, p double"
    )
    trans, _, _ = gromov_wasserstein_discrepancy(
        spark, cost_s, cost_t, p_s, pt_df, **gw_kwargs
    )
    return node_cluster_assignment(trans, p_t), p_t, trans


def recursive_graph_partition(
    spark: SparkSession,
    cost_s: DataFrame,
    p_s: DataFrame,
    max_node_num: int = 200,
    dim_t: int = 2,
    max_levels: int = 64,
    outer_iter: int | None = 20,
    **gw_kwargs: Any,
) -> tuple[DataFrame, list[dict[str, Any]]]:
    """Recursive GW partition (reference ``recursive_graph_partition``,
    gromov_wasserstein_graphs.py:960-1029): split every leaf with more
    than max_node_num nodes into dim_t clusters until all leaves fit.

    cost_s: (i, j, c); p_s: (i, p). Returns (assign, leaf_log) where
    assign is (i, leaf, p) — leaf a '/'-joined cluster path string,
    p the node's probability renormalized WITHIN its leaf (the
    reference's sub_probs) — and leaf_log records per-leaf sizes per
    level. Assignments stay distributed end to end; only leaf ids and
    counts visit the driver.
    """
    assign = p_s.select(
        "i", F.lit("r").alias("leaf"), F.col("p").cast("double").alias("p")
    ).localCheckpoint(eager=True)
    cost = cost_s.select("i", "j", F.col("c").cast("double").alias("c")).persist()
    leaf_log: list[dict[str, Any]] = []
    active = [("r", assign.count())]
    for _level in range(max_levels):
        active = [(leaf, n) for leaf, n in active if n > max_node_num]
        if not active:
            break
        new_assign = assign
        next_active: list[tuple[str, int]] = []
        for leaf, n in active:
            members = assign.where(F.col("leaf") == leaf).select("i", "p")
            total = float(members.agg(F.sum("p")).collect()[0][0])
            sub_p = members.select("i", (F.col("p") / F.lit(total)).alias("p"))
            sub_cost = (
                cost.join(sub_p.select(F.col("i").alias("_a")), cost["i"] == F.col("_a"), "leftsemi")
                .join(sub_p.select(F.col("i").alias("_b")), cost["j"] == F.col("_b"), "leftsemi")
            )
            kw = dict(gw_kwargs)
            kw["outer_iter"] = n if outer_iter is None else outer_iter
            cl, p_t, _ = graph_partition(spark, sub_cost, sub_p, dim_t=dim_t, **kw)
            # renormalize within each child cluster (reference sub_probs)
            child = (
                sub_p.join(cl, "i")
                .withColumn(
                    "leaf",
                    F.concat(F.lit(leaf + "/"), F.col("cluster").cast("string")),
                )
                .withColumn(
                    "p",
                    F.col("p") / F.sum("p").over(Window.partitionBy("leaf")),
                )
                .select("i", "leaf", "p")
            )
            # localCheckpoint the child now: its size collect AND the
            # level-end assign checkpoint both consume it, and without
            # the pin the assignment join + renormalization window
            # would execute twice per leaf
            child = child.localCheckpoint(eager=True)
            new_assign = new_assign.where(F.col("leaf") != leaf).unionByName(child)
            sizes = {
                r["leaf"]: r["n"]
                for r in child.groupBy("leaf").agg(F.count("*").alias("n")).collect()
            }
            leaf_log.append({"parent": leaf, "children": sizes})
            next_active.extend(sizes.items())
        assign = new_assign.localCheckpoint(eager=True)
        active = next_active
    cost.unpersist()
    return assign, leaf_log
