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

Physical shape per round (r6, ephemeral runs — the guide §2.4 "remove
shuffles outright" pass):

- ``sym`` is cached hash-partitioned by **src** — the key it is joined
  on — so the gather join is co-partitioned with the label state and
  adds ZERO exchanges (it was partitioned by dst before r6, which
  re-shuffled the whole doubled edge table every round).
- label state round-trips through a partitioning-preserving eager
  ``localCheckpoint`` (the pagerank r6 loop): no tmpfs parquet
  encode/commit/decode, and the ``changed`` convergence count rides the
  materialization as a CollectMetrics partial — TWO jobs per round
  (stepped, jumped) instead of two actions plus a snapshot write.
- loop partitioning is scale-adaptive (|V|-driven, floor 8, capped by
  the session conf — restored afterwards) so small graphs and the tiny
  pair graphs of dedup_clusters stop paying 32 tasks per stage.

Durable (checkpoint_dir) runs keep the r5 parquet-snapshot loop — the
resume contract is byte-level and untouched.
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
    from efficient_graph_algorithms_spark.operators.pagerank import _free_local_ckpt

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

    # scale-adaptive loop partitioning (ephemeral runs only) — same
    # |V|-driven rule as pagerank (~500k rows/partition, floor 8, capped
    # by the session conf). The session shuffle-partitions conf is
    # flipped so the per-round groupBy(dst) exchange matches the cached
    # sym/labels partitioning; restored in finally. Session-global, same
    # non-reentrancy caveat as pagerank's AQE flip.
    _sp_key = "spark.sql.shuffle.partitions"
    _sp_prev: str | None = None
    if ephemeral and num_partitions is None:
        sp_adaptive = min(sp, max(8, -(-n // 500_000)))
        if sp_adaptive != sp:
            sp = sp_adaptive
            _sp_prev = spark.conf.get(_sp_key)
            spark.conf.set(_sp_key, str(sp))

    # same size-driven AQE policy (and session-global non-reentrancy
    # caveat) as pagerank: at small |V| the per-stage replan round-trip
    # is pure overhead and AQE's partition coalescing would break the
    # co-partitioning the localCheckpoint loop relies on
    _aqe_key = "spark.sql.adaptive.enabled"
    _aqe_prev: str | None = None
    if ephemeral and n <= 2_000_000:
        _aqe_prev = spark.conf.get(_aqe_key)
        spark.conf.set(_aqe_key, "false")

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

        ckpt = CheckpointManager(spark, checkpoint_dir, "connected_components", {})
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
        _prev_ckpts: list[DataFrame] = []
        # stats hygiene: the pointer-jump SELF-join doubles the carried
        # Catalyst size estimate every round, and localCheckpoint
        # faithfully preserves it (plans/lineage.py — the Borůvka
        # meltdown; measured here: 5M digits after ~17 rounds on a 200k
        # path graph). pagerank/LPA stay linear because their second
        # state reference passes through an Aggregate, CC's does not —
        # so every STATS_CUT_EVERY-th round does a real parquet
        # round-trip that resets the estimate to the true file size.
        STATS_CUT_EVERY = 8
        _cut = None
        _labels_on_cut = False
        for it in range(start_iter + 1, max_iter + 1):
            # hash-to-min: candidate = min over neighbors' components.
            # labels is the shuffle-hash BUILD side (it is |V|-sized next
            # to the doubled edge table); min() is order-insensitive so
            # there is no determinism constraint on the probe order.
            nbr_min = (
                sym.join(
                    labels.hint("shuffle_hash"), sym["src"] == labels["id"]
                )
                .groupBy(sym["dst"].alias("id"))
                .agg(F.min("component").alias("nbr_min"))
            )
            stepped = labels.join(nbr_min.hint("shuffle_hash"), "id", "left").select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
                F.col("component").alias("old"),
            )
            if ephemeral:
                # job 1: materialize stepped (consumed twice by the jump
                # self-join below) as a partitioning-preserving block set
                stepped = stepped.localCheckpoint(eager=True)
            else:
                stepped = stepped.persist()
            # pointer jumping (path halving): component ← component's component
            jumped = (
                stepped.alias("s")
                .join(
                    stepped.select(
                        F.col("id").alias("pid"), F.col("component").alias("pcomp")
                    ).alias("p"),
                    F.col("s.component") == F.col("p.pid"),
                    "left",
                )
                .select(
                    F.col("s.id").alias("id"),
                    F.coalesce(F.col("p.pcomp"), F.col("s.component")).alias("component"),
                    F.col("s.old").alias("old"),
                )
            )
            if it == start_iter + 1:
                from efficient_graph_algorithms_spark.plans.explain import dump_plan

                dump_plan(jumped, "cc_round")
            if ephemeral:
                # job 2: restore the id partitioning (the jump join is
                # keyed by component), ride the changed-count on the
                # materialization as a CollectMetrics partial, cut
                # lineage with an eager localCheckpoint — no snapshot
                # write, no separate count job
                import uuid as _uuid

                from pyspark.sql.observation import Observation

                obs = Observation(f"cc_{_uuid.uuid4().hex[:12]}_it{it}")
                observed = (
                    jumped.repartition(sp, "id")
                    .observe(
                        obs,
                        F.sum((F.col("component") != F.col("old")).cast("long")).alias(
                            "changed"
                        ),
                    )
                    .select("id", "component")
                )
                if (it - start_iter) % STATS_CUT_EVERY == 0:
                    if _cut is None:
                        from efficient_graph_algorithms_spark.plans.lineage import (
                            StateCutter,
                        )

                        _cut = StateCutter(spark, "cc", keep=2)
                    new_labels = _cut(observed)  # parquet write drives obs
                    _labels_on_cut = True
                else:
                    new_labels = observed.localCheckpoint(eager=True)
                    _labels_on_cut = False
                changed = int(obs.get["changed"] or 0)
                ckpt.log_metrics(it, {"changed": changed})
                # free superseded block sets now that the successor is
                # materialized (block-manager analogue of the old
                # delete_iteration call)
                for df in _prev_ckpts:
                    _free_local_ckpt(df)
                _prev_ckpts = [stepped, new_labels]
                labels = new_labels
            else:
                jumped = jumped.persist()
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
        if ephemeral and _prev_ckpts:
            # the final label state IS the result: free only its stepped
            # sibling, keep the labels block set alive for the caller
            _free_local_ckpt(_prev_ckpts[0])
        if _cut is not None:
            if _labels_on_cut:
                # pin the cutter-backed final state before its files go
                labels = labels.localCheckpoint(eager=True)
            _cut.close()
        return labels, info
    finally:
        if _sp_prev is not None:
            spark.conf.set(_sp_key, _sp_prev)
        if _aqe_prev is not None:
            spark.conf.set(_aqe_key, _aqe_prev)
