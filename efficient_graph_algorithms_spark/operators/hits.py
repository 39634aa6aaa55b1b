"""HITS (hubs & authorities) over the directed link graph.

Kleinberg's mutual-reinforcement iteration — the natural companion to
PageRank for a web link graph (the reference ships PageRank-family
kernels only; HITS is an engine extension, same gather-scatter shape as
``reference src/ega/algorithms/graph_kernels.py:66-68``'s SpMV loop):

    a ← normalize₂(Aᵀ h)      (a page is a good authority if good hubs
    h ← normalize₂(A a)        link TO it; a good hub if it links to
                               good authorities)

Spark-first plan, per iteration:

- two gather-scatters (edges ⋈ scores, groupBy the other endpoint) —
  the only wide shuffles, each with map-side partial sums;
- each L2 norm rides the plan as a broadcast 1-row aggregate
  (crossJoin of a scalar subquery — no per-iteration driver collect),
  the same shape the unrolled-SQL oracles use for dangling mass;
- the convergence delta (L1 of the hub change) rides the per-iteration
  state cut as a CollectMetrics partial (``StateCutter.observe`` — the
  pagerank one-job-per-iteration pattern, pagerank.py:384-396).

State is one (id, hub, authority) table cut to parquet per iteration
(bounded scratch, keep=4), so lineage never grows with the iteration
count and an executor loss replays at most one iteration — the property
that matters at 10⁹ vertices.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.lineage import StateCutter


def _l2_normalized(scores: DataFrame, col: str) -> DataFrame:
    """Divide ``col`` by its L2 norm, riding as a broadcast 1-row agg.

    A zero norm (empty/edgeless graph) leaves scores unchanged rather
    than dividing by zero.
    """
    norm = scores.agg(
        F.sqrt(F.sum(F.col(col) * F.col(col))).alias("_z")
    )
    return (
        scores.crossJoin(F.broadcast(norm))
        .select(
            *[c for c in scores.columns if c != col],
            (
                F.col(col)
                / F.when(F.col("_z") > 0, F.col("_z")).otherwise(F.lit(1.0))
            ).alias(col),
        )
    )


def _l1_normalized(scores: DataFrame, col: str) -> DataFrame:
    """Divide ``col`` by its L1 norm (scores are nonnegative here, so
    the norm is a plain sum), riding as a broadcast 1-row agg; a zero
    norm leaves scores unchanged."""
    norm = scores.agg(F.sum(F.abs(F.col(col))).alias("_z"))
    return scores.crossJoin(F.broadcast(norm)).select(
        *[c for c in scores.columns if c != col],
        (
            F.col(col) / F.when(F.col("_z") > 0, F.col("_z")).otherwise(F.lit(1.0))
        ).alias(col),
    )


def salsa(
    spark: SparkSession,
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iter: int = 30,
    tol: float = 1e-8,
) -> tuple[DataFrame, dict[str, Any]]:
    """SALSA (Lempel & Moran 2000): HITS with the adjacency matrix
    replaced by its row- and column-stochastic normalizations — the
    link-analysis variant deployed in production recommender systems
    precisely because the stochastic weights stop high-degree hubs from
    dominating (TKDC-robustness). An engine extension like ``hits``
    (the reference ships PageRank-family kernels only); same
    gather-scatter plan shape:

        authority ← normalize₁(L_cᵀ h)   with L_c(i,j) = 1/out(i)
        hub       ← normalize₁(L_r a)    with L_r(i,j) = 1/in(j)

    Per iteration: two map-side-combining gather-scatters over an edge
    table that carries BOTH stochastic weights (built once, persisted);
    L1 norms ride as broadcast 1-row aggregates; the hub-delta rides
    the per-iteration state cut (one job/iteration, bounded lineage) —
    identical scalability posture to ``hits`` above.

    edges: (src, dst). Returns ((id, hub, authority), info), both
    score vectors L1-normalized (probability distributions over the
    hub / authority sides; isolated vertices carry exact 0).
    """
    e = edges.select("src", "dst")
    outd = e.groupBy("src").agg(F.count("*").alias("_od"))
    ind = e.groupBy("dst").agg(F.count("*").alias("_id"))
    le = (
        e.join(outd, "src")
        .join(ind, "dst")
        .select(
            "src",
            "dst",
            (F.lit(1.0) / F.col("_od")).alias("w_out"),
            (F.lit(1.0) / F.col("_id")).alias("w_in"),
        )
        .persist()
    )
    if vertices is None:
        v = (
            e.select(F.col("src").alias("id"))
            .unionByName(e.select(F.col("dst").alias("id")))
            .distinct()
        )
    else:
        v = vertices.select("id")
    v = v.persist()
    n = v.count()  # also materializes le's inputs for the loop

    info: dict[str, Any] = {"n": n, "iterations": 0, "deltas": [], "converged": False}
    cut = StateCutter(spark, "salsa", keep=4)
    try:
        state = cut(
            v.select("id", F.lit(1.0).alias("hub"), F.lit(1.0).alias("authority"))
        )
        for it in range(1, max_iter + 1):
            h = state.select("id", "hub")
            # authority ← L_cᵀ h : hub mass spread over each hub's
            # out-links uniformly (1/out), gathered at the authority
            a_raw = (
                le.join(h, le["src"] == h["id"])
                .groupBy(le["dst"].alias("id"))
                .agg(F.sum(F.col("hub") * F.col("w_out")).alias("authority"))
            )
            a = _l1_normalized(
                v.join(a_raw, "id", "left").select(
                    "id",
                    F.coalesce(F.col("authority"), F.lit(0.0)).alias("authority"),
                ),
                "authority",
            )
            # hub ← L_r a : authority mass spread over in-links (1/in)
            h_raw = (
                le.join(a, le["dst"] == a["id"])
                .groupBy(le["src"].alias("id"))
                .agg(F.sum(F.col("authority") * F.col("w_in")).alias("hub"))
            )
            h_new = _l1_normalized(
                v.join(h_raw, "id", "left").select(
                    "id", F.coalesce(F.col("hub"), F.lit(0.0)).alias("hub")
                ),
                "hub",
            )
            nxt = (
                h_new.join(a, "id")
                .join(state.select("id", F.col("hub").alias("_obs_h0")), "id")
                .select("id", "hub", "authority", "_obs_h0")
            )
            state, got = cut.observe(
                nxt,
                delta=F.sum(F.abs(F.col("hub") - F.col("_obs_h0"))),
            )
            delta = float(got["delta"] or 0.0)
            info["iterations"] = it
            info["deltas"].append(delta)
            if delta < tol:
                info["converged"] = True
                break
        out = state.localCheckpoint(eager=True)  # outlives the cutter
    finally:
        cut.close()
        le.unpersist()
        v.unpersist()
    return out, info


def hits(
    spark: SparkSession,
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iter: int = 30,
    tol: float = 1e-8,
) -> tuple[DataFrame, dict[str, Any]]:
    """Synchronous HITS. edges: (src, dst). Returns ((id, hub,
    authority), info) with both score vectors L2-normalized.

    vertices: optional (id) universe — vertices with no in-links get
    authority 0, no out-links hub 0 (they still appear in the output).
    tol: stop when the L1 change of the hub vector falls below tol;
    max_iter bounds the loop either way.
    """
    e = edges.select("src", "dst").persist()
    if vertices is None:
        v = (
            e.select(F.col("src").alias("id"))
            .unionByName(e.select(F.col("dst").alias("id")))
            .distinct()
        )
    else:
        v = vertices.select("id")
    v = v.persist()
    n = v.count()  # also materializes e for the loop

    info: dict[str, Any] = {"n": n, "iterations": 0, "deltas": [], "converged": False}
    cut = StateCutter(spark, "hits", keep=4)
    try:
        state = cut(
            v.select(
                "id", F.lit(1.0).alias("hub"), F.lit(1.0).alias("authority")
            )
        )
        for it in range(1, max_iter + 1):
            h = state.select("id", "hub")
            # authority ← Aᵀ h : gather hub scores over in-edges
            a_raw = (
                e.join(h, e["src"] == h["id"])
                .groupBy(e["dst"].alias("id"))
                .agg(F.sum("hub").alias("authority"))
            )
            a = _l2_normalized(
                v.join(a_raw, "id", "left").select(
                    "id",
                    F.coalesce(F.col("authority"), F.lit(0.0)).alias("authority"),
                ),
                "authority",
            )
            # hub ← A a : gather (new) authority scores over out-edges
            h_raw = (
                e.join(a, e["dst"] == a["id"])
                .groupBy(e["src"].alias("id"))
                .agg(F.sum("authority").alias("hub"))
            )
            h_new = _l2_normalized(
                v.join(h_raw, "id", "left").select(
                    "id", F.coalesce(F.col("hub"), F.lit(0.0)).alias("hub")
                ),
                "hub",
            )
            nxt = (
                h_new.join(a, "id")
                .join(state.select("id", F.col("hub").alias("_obs_h0")), "id")
                .select("id", "hub", "authority", "_obs_h0")
            )
            # delta rides the cut write — one job per iteration
            state, got = cut.observe(
                nxt,
                delta=F.sum(F.abs(F.col("hub") - F.col("_obs_h0"))),
            )
            delta = float(got["delta"] or 0.0)
            info["iterations"] = it
            info["deltas"].append(delta)
            if delta < tol:
                info["converged"] = True
                break
        out = state.localCheckpoint(eager=True)  # outlives the cutter
    finally:
        cut.close()
        e.unpersist()
        v.unpersist()
    return out, info
