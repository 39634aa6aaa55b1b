"""Synchronous label propagation with deterministic tie-breaking.

Semantics (argmax cluster assignment of the reference,
``reference src/ega/algorithms/gromov_wasserstein_graphs.py:867-919``
``graph_partition`` 922-957, made schedule-independent):

- labels init to vertex id;
- each synchronous round, every vertex with ≥1 neighbor takes the
  label with the highest neighbor count, ties broken by MIN label
  (total order ⇒ result independent of partitioning/schedule);
- isolated vertices keep their label;
- stop when no label changes, or after max_iter rounds.

Plan per round: edges ⋈ labels (gather) → groupBy(id,label).count →
window argmax (count desc, label asc) → row_number()==1 — exactly the
"per-row top-1" window pattern from SURVEY §2.5.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from efficient_graph_algorithms_spark.plans.checkpoint import CheckpointManager


def label_propagation(
    spark: SparkSession,
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iter: int = 20,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    num_partitions: int | None = None,
) -> tuple[DataFrame, dict[str, Any]]:
    """Returns (labels(id, label), info)."""
    sp = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    verts = vertices
    if verts is None:
        verts = (
            edges.select(F.col("src").alias("id"))
            .unionByName(edges.select(F.col("dst").alias("id")))
            .distinct()
        )
    verts = verts.select("id").repartition(sp, "id").persist()

    sym = (
        edges.select("src", "dst")
        .unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(sp, "dst")
        .persist()
    )
    sym.count()

    ckpt = CheckpointManager(spark, checkpoint_dir, "label_propagation", {"max_iter": max_iter})
    labels = verts.select("id", F.col("id").alias("label"))
    start_iter = 0
    if resume and checkpoint_dir:
        latest = ckpt.latest_iteration()
        if latest is not None:
            labels = ckpt.load_iteration(latest)
            start_iter = latest
    labels0 = labels = labels.repartition(sp, "id").persist()
    labels.count()

    w = Window.partitionBy("id").orderBy(F.desc("cnt"), F.asc("label"))
    info: dict[str, Any] = {"rounds": start_iter}
    converged = False
    for it in range(start_iter + 1, max_iter + 1):
        votes = (
            sym.join(labels, sym["src"] == labels["id"])
            .groupBy(sym["dst"].alias("id"), F.col("label"))
            .agg(F.count("*").alias("cnt"))
        )
        winner = (
            votes.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("id", F.col("label").alias("new_label"))
        )
        stepped = (
            labels.join(winner, "id", "left")
            .select(
                "id",
                F.coalesce(F.col("new_label"), F.col("label")).alias("label"),
                F.col("label").alias("old"),
            )
            .persist()
        )
        if it == start_iter + 1:
            from efficient_graph_algorithms_spark.plans.explain import dump_plan

            dump_plan(stepped, "lpa_round")
        changed = int(
            stepped.agg(F.sum((F.col("label") != F.col("old")).cast("long"))).collect()[0][0]
            or 0
        )
        labels = ckpt.save_iteration(
            stepped.select("id", "label"), it, {"changed": changed}
        )
        stepped.unpersist()
        info["rounds"] = it
        if changed == 0:
            info["rounds"] = it - 1
            converged = True
            break
    info["converged"] = converged
    if not converged:
        # unlike CC, LPA has no fixpoint guarantee (labels can
        # oscillate under synchronous update) — max_iter is a legitimate
        # stopping rule, so record the fact without warning
        info["stopped_at_max_iter"] = True
    sym.unpersist()
    verts.unpersist()
    labels0.unpersist()  # initial-state persist, superseded by snapshots
    return labels, info
