"""Connected components: alternating large-star / small-star hash-to-min.

Semantics oracle: component id = min vertex id reachable (undirected) —
union-find à la the reference's ``DisjointSetADT``
(``reference src/ega/algorithms/spanning_trees.py:11-47``) / BFS coloring
(``reference src/planar_separators/lipton_tarjan/utils.py:62-77``).

Algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14): maintain a parent pointer per vertex; alternate

  large-star: for each edge (u,v), attach every neighbor v with
              parent(v) > min to min(parent(u), parent over nbrs)
  small-star: same restricted to neighbors ≤ u

We implement the simpler two-phase variant that converges to the same
fixed point: iterate  parent(v) ← min(parent(v), min_{u~v} parent(u))
with path-halving  parent(v) ← parent(parent(v))  each round, which is
hash-to-min + pointer jumping: O(log d) rounds on graphs of diameter d,
each round = one join + one aggregate (+ one join for halving).
All updates are min-based so the result is schedule-independent and
matches the union-find oracle exactly.
"""

from __future__ import annotations

import warnings
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from efficient_graph_algorithms_spark.plans.checkpoint import CheckpointManager


def connected_components(
    spark: SparkSession,
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iter: int = 50,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    num_partitions: int | None = None,
) -> tuple[DataFrame, dict[str, Any]]:
    """Returns (labels(id, component), info). component = min reachable id."""
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

    # memory-only runs still need a REAL state medium: the pointer-jump
    # is a self-join, and a localCheckpoint barrier lets Catalyst's
    # multiplied size estimate double per round (plans/lineage.py) —
    # ephemeral tmpfs parquet resets stats to actual file sizes
    from efficient_graph_algorithms_spark.operators.pagerank import _ephemeral_state_dir

    ephemeral = checkpoint_dir is None
    state_root = _ephemeral_state_dir() if ephemeral else checkpoint_dir
    ckpt = CheckpointManager(spark, state_root, "connected_components", {})
    labels = verts.select("id", F.col("id").alias("component"))
    start_iter = 0
    if resume and checkpoint_dir:
        latest = ckpt.latest_iteration()
        if latest is not None:
            labels = ckpt.load_iteration(latest)
            start_iter = latest
    labels0 = labels = labels.repartition(sp, "id").persist()
    labels.count()

    info: dict[str, Any] = {"rounds": start_iter}
    converged = False
    for it in range(start_iter + 1, max_iter + 1):
        # hash-to-min: candidate = min over neighbors' components
        nbr_min = (
            sym.join(labels, sym["src"] == labels["id"])
            .groupBy(sym["dst"].alias("id"))
            .agg(F.min("component").alias("nbr_min"))
        )
        stepped = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
                F.col("component").alias("old"),
            )
            .persist()  # consumed twice by the self-join below
        )
        # pointer jumping (path halving): component ← component's component
        jumped = (
            stepped.alias("s")
            .join(
                stepped.select(F.col("id").alias("pid"), F.col("component").alias("pcomp")).alias("p"),
                F.col("s.component") == F.col("p.pid"),
                "left",
            )
            .select(
                F.col("s.id").alias("id"),
                F.coalesce(F.col("p.pcomp"), F.col("s.component")).alias("component"),
                F.col("s.old").alias("old"),
            )
            .persist()
        )
        if it == start_iter + 1:
            from efficient_graph_algorithms_spark.plans.explain import dump_plan

            dump_plan(jumped, "cc_round")
        changed = int(
            jumped.agg(
                F.sum((F.col("component") != F.col("old")).cast("long"))
            ).collect()[0][0]
            or 0
        )
        labels = ckpt.save_iteration(
            jumped.select("id", "component"), it, {"changed": changed}
        )
        jumped.unpersist()
        stepped.unpersist()
        if ephemeral:
            ckpt.delete_iteration(it - 1)  # deterministic cleanup
        info["rounds"] = it
        if changed == 0:
            converged = True
            break
    info["converged"] = converged
    if not converged:
        warnings.warn(
            f"connected_components hit max_iter={max_iter} before fixpoint — "
            "labels are NOT final (rerun with resume=True to continue)",
            stacklevel=2,
        )
    sym.unpersist()
    verts.unpersist()
    labels0.unpersist()  # initial-state persist, superseded by snapshots
    if ephemeral:
        # pin the result in block-manager memory, then drop the scratch dir
        labels = labels.localCheckpoint(eager=True)
        import shutil as _shutil

        _shutil.rmtree(state_root, ignore_errors=True)
    return labels, info
