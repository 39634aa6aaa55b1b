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
groupBy(id) max_by argmax — the per-row top-1 computed as an
AGGREGATE (``max_by(label, (cnt, -label))``) rather than a sort
window: same (count desc, label asc) total order, but it gets
map-side partial aggregation, skips the per-partition sort, and lands
already hash-partitioned by id for the state join (r6; the window
variant paid an extra sort on the same exchange).

Physical shape per round (r6, ephemeral runs — mirrors components.py):
``sym`` cached hash-partitioned by its JOIN key src (zero-exchange
gather join against the label state), label state round-trips through
a partitioning-preserving eager ``localCheckpoint``, the changed-count
rides the materialization as a CollectMetrics partial (one job per
round), and loop partitioning is scale-adaptive (|V|-driven, floor 8,
capped by the session conf). Durable (checkpoint_dir) runs keep the
parquet-snapshot loop.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
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
    import shutil as _shutil

    from efficient_graph_algorithms_spark.operators.pagerank import (
        _ephemeral_state_dir,
        _free_local_ckpt,
    )

    sp = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    ephemeral = checkpoint_dir is None

    verts = vertices
    if verts is None:
        verts = (
            edges.select(F.col("src").alias("id"))
            .unionByName(edges.select(F.col("dst").alias("id")))
            .distinct()
        )
    verts = verts.select("id").persist()
    n = verts.count()

    # small-graph regime gate + scale-adaptive loop partitioning +
    # AQE policy: same rules, measured evidence and session-global
    # non-reentrancy caveat as pagerank/CC (big deserialized states in
    # the block manager create heap pressure the tmpfs snapshot never
    # does — pagerank's 100M-edge measurement)
    mem_loop = ephemeral and n <= 2_000_000
    _sp_key = "spark.sql.shuffle.partitions"
    _sp_prev: str | None = None
    if mem_loop and num_partitions is None:
        sp_adaptive = min(sp, max(8, -(-n // 500_000)))
        if sp_adaptive != sp:
            sp = sp_adaptive
            _sp_prev = spark.conf.get(_sp_key)
            spark.conf.set(_sp_key, str(sp))
    _aqe_key = "spark.sql.adaptive.enabled"
    _aqe_prev: str | None = None
    if mem_loop:
        _aqe_prev = spark.conf.get(_aqe_key)
        spark.conf.set(_aqe_key, "false")
    # large ephemeral runs roll their state through tmpfs parquet (r5+)
    state_root: str | None = None
    if ephemeral and not mem_loop:
        state_root = _ephemeral_state_dir()

    try:
        sym = (
            edges.select("src", "dst")
            .unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
            .where(F.col("src") != F.col("dst"))
            # repartition BEFORE distinct (r6): hash(src) satisfies the
            # distinct's (src,dst) clustering requirement, so dedup and
            # the loop's src-layout share ONE exchange (the map-side
            # partial dedup it trades away removes next to nothing —
            # the doubled edge set has no duplicates to combine)
            .repartition(sp, "src")
            .distinct()
            .persist()
        )
        sym.count()

        ckpt = CheckpointManager(
            spark, checkpoint_dir or state_root, "label_propagation",
            {"max_iter": max_iter},
        )
        labels = verts.select("id", F.col("id").alias("label"))
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
        _prev_ckpt: DataFrame | None = None
        for it in range(start_iter + 1, max_iter + 1):
            # ONE exchange per round (r6): the explicit hash(id)
            # repartition satisfies ClusteredDistribution for BOTH the
            # (id, label) vote count and the per-id argmax (partitioning
            # exprs ⊆ grouping exprs), and it matches the label state's
            # partitioning for the update join — the default plan paid a
            # hash(id,label) exchange and then a hash(id) exchange. The
            # traded-away map-side combine is near-worthless here: vote
            # rows are (dst, neighbor-label) pairs, mostly distinct
            # before convergence, so the partial aggregate barely shrank
            # the shuffle (guide §2.3 "aggregate before you shuffle"
            # cuts bytes only when the key space is much smaller than
            # the row count — the opposite of LPA's early rounds).
            votes = (
                sym.join(labels.hint("shuffle_hash"), sym["src"] == labels["id"])
                .select(sym["dst"].alias("id"), "label")
                .repartition(sp, "id")
                .groupBy("id", "label")
                .agg(F.count("*").alias("cnt"))
            )
            # argmax by (cnt desc, label asc) as an aggregate: max_by over
            # the lexicographic (cnt, -label) struct — unique per label, so
            # the tie-break is total and the result schedule-independent
            winner = votes.groupBy("id").agg(
                F.max_by(
                    "label", F.struct(F.col("cnt"), (-F.col("label")).alias("nl"))
                ).alias("new_label")
            )
            stepped = labels.join(winner.hint("shuffle_hash"), "id", "left").select(
                "id",
                F.coalesce(F.col("new_label"), F.col("label")).alias("label"),
                F.col("label").alias("old"),
            )
            if it == start_iter + 1:
                from efficient_graph_algorithms_spark.plans.explain import dump_plan

                dump_plan(stepped, "lpa_round")
            if mem_loop:
                # ONE job: changed-count rides the localCheckpoint
                # materialization as a CollectMetrics partial
                import uuid as _uuid

                from pyspark.sql.observation import Observation

                obs = Observation(f"lpa_{_uuid.uuid4().hex[:12]}_it{it}")
                observed = stepped.observe(
                    obs,
                    F.sum((F.col("label") != F.col("old")).cast("long")).alias("changed"),
                ).select("id", "label")
                new_labels = observed.localCheckpoint(eager=True)
                changed = int(obs.get["changed"] or 0)
                ckpt.log_metrics(it, {"changed": changed})
                if _prev_ckpt is not None:
                    _free_local_ckpt(_prev_ckpt)
                _prev_ckpt = new_labels
                labels = new_labels
            else:
                stepped = stepped.persist()
                changed = int(
                    stepped.agg(
                        F.sum((F.col("label") != F.col("old")).cast("long"))
                    ).collect()[0][0]
                    or 0
                )
                labels = ckpt.save_iteration(
                    stepped.select("id", "label"), it, {"changed": changed}
                )
                stepped.unpersist()
                if state_root:
                    ckpt.delete_iteration(it - 1)  # rolling tmpfs hygiene
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
        if state_root:
            # pin the result in block-manager memory, then drop the scratch
            labels = labels.localCheckpoint(eager=True)
            _shutil.rmtree(state_root, ignore_errors=True)
        return labels, info
    finally:
        if _sp_prev is not None:
            spark.conf.set(_sp_key, _sp_prev)
        if _aqe_prev is not None:
            spark.conf.set(_aqe_key, _aqe_prev)
