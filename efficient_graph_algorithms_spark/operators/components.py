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

Physical shape per round (r6 — the guide §2.4 "remove shuffles
outright" pass):

- ``sym`` is cached hash-partitioned by **src** — the key it is joined
  on — with the dedup fused into the same exchange (hash(src) satisfies
  the distinct's clustering); it was partitioned by dst before r6,
  which re-shuffled the whole doubled edge table every round.
- SMALL-GRAPH REGIME (|V| ≤ 2M, ephemeral runs): label state
  round-trips through a partitioning-preserving eager
  ``localCheckpoint`` (the pagerank r6 loop) — no tmpfs parquet
  encode/commit/decode — and the ``changed`` convergence count rides
  the materialization as a CollectMetrics partial: TWO jobs per round
  instead of two actions plus a snapshot write. Loop partitioning is
  scale-adaptive (|V|-driven, floor 8, capped by the session conf) and
  AQE is off for the loop (both restored afterwards; session-global,
  same non-reentrancy caveat as pagerank). Stats hazard: the
  pointer-jump SELF-join doubles Catalyst's carried size estimate every
  round and localCheckpoint preserves it (plans/lineage.py — measured
  5M digits after 18 rounds on a 200k path graph), so every 8th round
  does a real parquet round-trip that resets it.
- LARGE graphs and durable (checkpoint_dir) runs keep the r5
  parquet-snapshot loop at the conf partitioning: big deserialized
  states in the block manager create heap pressure the tmpfs snapshot
  never does (measured on the pagerank loop at 100M edges), and the
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

    # small-graph regime gate — see module docstring; pagerank's
    # measured 100M-edge evidence applies verbatim to this loop shape
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

    # large ephemeral runs roll their state through a tmpfs parquet dir
    # exactly as in r5
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
            spark, checkpoint_dir or state_root, "connected_components", {}
        )
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
            if mem_loop:
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
            if mem_loop:
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
                if state_root:
                    ckpt.delete_iteration(it - 1)  # rolling tmpfs hygiene
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
        if mem_loop and _prev_ckpts:
            # the final label state IS the result: free only its stepped
            # sibling, keep the labels block set alive for the caller
            _free_local_ckpt(_prev_ckpts[0])
        if _cut is not None:
            if _labels_on_cut:
                # pin the cutter-backed final state before its files go
                labels = labels.localCheckpoint(eager=True)
            _cut.close()
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
