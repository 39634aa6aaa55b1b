"""PageRank / personalized PageRank — the benchmark query.

Semantics (mirrors the reference's random-walk kernels,
``reference src/ega/algorithms/graph_kernels.py:66-79``, plus the
standard uniform dangling-mass redistribution the reference leaves
undefined — its ``A/A.sum(axis=0)`` divides by zero on dangling nodes):

    r_{t+1} = (1-α)·p + α·(Pᵀ r_t + dangling_mass·p)
    stop when  Σ|r_{t+1} - r_t| < tol        (tol = 1e-6)

p = uniform 1/N, or a normalized personalization vector (PPR — the
reference's ``random_walk_with_restart_kernel`` fixed point).

Physical plan per iteration (designed for 10^12-edge scale):
- ``linked`` = edges ⋈ out-degree with precomputed 1/deg, built ONCE,
  hash-partitioned by src and persisted — the invariant side of every
  iteration (the reference's "pre-factorization reuse" pattern,
  ``reference scripts/experiments/blur_on_mesh.py:20-24``).
- exactly ONE wide shuffle per iteration: the groupBy(dst) aggregate
  (with map-side partial combine). The rank vector is orders of
  magnitude smaller than the edge table and broadcasts while it fits;
  AQE demotes to shuffle join when it doesn't.
- L1 delta and NEXT iteration's dangling mass come from a single
  scalar aggregate per iteration (one driver↔cluster scalar transfer).
- per-iteration checkpoint cuts lineage (flat iteration time) and
  makes the loop resumable.

Two jobs per iteration total: (materialize new ranks) + (scalar agg).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from efficient_graph_algorithms_spark.plans.checkpoint import CheckpointManager

DEFAULT_ALPHA = 0.85
DEFAULT_TOL = 1e-6
DEFAULT_MAX_ITER = 200


def vertex_table(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )


def pagerank(
    spark: SparkSession,
    edges: DataFrame,
    vertices: DataFrame | None = None,
    alpha: float = DEFAULT_ALPHA,
    tol: float = DEFAULT_TOL,
    max_iter: int = DEFAULT_MAX_ITER,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    personalization: DataFrame | None = None,
    num_partitions: int | None = None,
    broadcast_vertex_threshold: int = 0,
) -> tuple[DataFrame, dict[str, Any]]:
    """Run PageRank to convergence. Returns (ranks(id, rank), info).

    edges: (src, dst) directed, deduplicated. vertices: (id) — pass it
    when isolated vertices exist beyond edge endpoints.
    personalization: (id, p) unnormalized weights; None → uniform.

    broadcast_vertex_threshold > 0 forces a broadcast of the rank
    vector into the edge join while |V| is below it (map-side, zero
    shuffle of the edge table) — the same input-size-driven physical-
    plan switch as the reference's brute-force leaf threshold
    (``reference src/ega/algorithms/separation_gf_integrator.py:52-55``).
    Default 0: measured on this box, the co-partitioned shuffle-hash
    join beats a per-iteration broadcast rebuild at every scale tried
    (the rank-side exchange is |V|-sized, tiny next to |E|); AQE still
    auto-broadcasts when it has stats that justify it.
    """
    import time as _time

    t_setup0 = _time.time()
    sp = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    verts = (vertices or vertex_table(edges)).select("id")
    deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))

    # static per-vertex table: teleport prob p + dangling flag
    if personalization is not None:
        ptot = float(personalization.agg(F.sum("p")).collect()[0][0])
        base = verts.join(personalization.withColumnRenamed("p", "_praw"), "id", "left").select(
            "id", (F.coalesce(F.col("_praw"), F.lit(0.0)) / F.lit(ptot)).alias("p")
        )
    else:
        n_tmp = verts.count()
        base = verts.select("id", F.lit(1.0 / n_tmp).alias("p"))
    pvec = (
        base.join(deg.select(F.col("src").alias("id"), F.lit(True).alias("_has_out")), "id", "left")
        .select("id", "p", F.col("_has_out").isNull().alias("dangling"))
        .repartition(sp, "id")
        .persist()
    )
    n = pvec.count()

    linked = (
        edges.join(deg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("out_deg")).alias("inv_deg"))
        .repartition(sp, "src")
        .persist()
    )
    linked.count()

    ckpt = CheckpointManager(
        spark, checkpoint_dir, "pagerank", {"alpha": alpha, "tol": tol, "n": n}
    )
    start_iter = 0
    # single fused per-vertex state: (id, p, dangling, rank) — ONE
    # vertex-side join per iteration instead of separate pvec/ranks joins
    state = pvec.select("id", "p", "dangling", F.col("p").alias("rank"))
    if resume and checkpoint_dir:
        latest = ckpt.latest_iteration()
        if latest is not None:
            saved = ckpt.load_iteration(latest)
            state = pvec.join(saved, "id").select("id", "p", "dangling", "rank")
            start_iter = latest
    state = state.localCheckpoint(eager=True)

    # dangling mass of the CURRENT rank vector (one-off; subsequent
    # values ride along with the per-iteration delta aggregate)
    dm = float(
        state.agg(
            F.sum(F.when(F.col("dangling"), F.col("rank")).otherwise(F.lit(0.0)))
        ).collect()[0][0]
        or 0.0
    )

    do_broadcast = 0 < broadcast_vertex_threshold >= n
    info: dict[str, Any] = {"n": n, "iterations": start_iter, "deltas": [],
                            "rank_join": "broadcast" if do_broadcast else "shuffle",
                            "setup_sec": round(_time.time() - t_setup0, 3),
                            "iter_secs": []}
    converged = False
    t_loop0 = _time.time()
    for it in range(start_iter + 1, max_iter + 1):
        t_it0 = _time.time()
        ranks_t = state.select("id", "rank")
        rank_side = F.broadcast(ranks_t) if do_broadcast else ranks_t
        contrib = (
            linked.join(rank_side, linked["src"] == rank_side["id"])
            .groupBy(linked["dst"].alias("id"))
            .agg(F.sum(F.col("rank") * F.col("inv_deg")).alias("c"))
        )
        new_state = (
            state.join(contrib, "id", "left")
            .select(
                "id",
                "p",
                "dangling",
                (
                    F.lit(1.0 - alpha) * F.col("p")
                    + F.lit(alpha)
                    * (F.coalesce(F.col("c"), F.lit(0.0)) + F.lit(dm) * F.col("p"))
                ).alias("rank"),
                F.col("rank").alias("rank_old"),
            )
            .localCheckpoint(eager=True)  # job 1: contrib shuffle + state update
        )
        agg = new_state.agg(  # job 2: scalar agg on the checkpointed blocks
            F.sum(F.abs(F.col("rank") - F.col("rank_old"))).alias("delta"),
            F.sum(F.when(F.col("dangling"), F.col("rank")).otherwise(F.lit(0.0))).alias("dm"),
        ).collect()[0]
        delta, dm = float(agg["delta"]), float(agg["dm"] or 0.0)
        if checkpoint_dir:
            ckpt.save_iteration(
                new_state.select("id", "rank"), it,
                {"delta": delta, "dangling_mass": dm},
            )
        else:
            ckpt.save_iteration_metrics_only(it, {"delta": delta, "dangling_mass": dm})
        state = new_state.select("id", "p", "dangling", "rank")
        # release superseded localCheckpoint blocks: drop the Python
        # refs (py4j), collect them so the JVM sees the RDDs as dead,
        # then nudge the JVM so ContextCleaner unpersists them. Without
        # this, blocks accumulate and iteration time drifts upward
        # (observed at 100M edges: 19s/iter → 80s/iter by iteration 12).
        del ranks_t, rank_side, contrib, new_state
        import gc as _gc

        _gc.collect()
        spark.sparkContext._jvm.System.gc()
        info["iterations"] = it
        info["deltas"].append(delta)
        info["iter_secs"].append(round(_time.time() - t_it0, 3))
        if delta < tol:
            converged = True
            break
    info["converged"] = converged
    info["loop_sec"] = round(_time.time() - t_loop0, 3)
    pvec.unpersist()
    linked.unpersist()
    return state.select("id", "rank"), info


def top_k(ranks: DataFrame, k: int = 10) -> DataFrame:
    """Ranked report (reference's ``get_ranking``,
    ``reference src/ega/algorithms/graph_kernels.py:559-585``)."""
    return ranks.orderBy(F.desc("rank"), F.asc("id")).limit(k)
