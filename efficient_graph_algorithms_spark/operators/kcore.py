"""k-core decomposition by synchronous peeling.

The k-core of an undirected simple graph is the maximal subgraph in
which every vertex has degree ≥ k — the standard web-graph quality
filter (link farms and boilerplate navigation stay low-core; genuinely
interlinked content survives). No reference counterpart
(``reference src/ega`` ships no subgraph-pruning kernel); the operator
is an engine extension in the same family as HITS/host-contraction.

Algorithm (synchronous peel): repeat
    degree ← count over the live symmetrized edge set
    remove every vertex with degree < k (and its incident edges)
until a round removes nothing. The peel is order-independent — the
fixpoint is the k-core regardless of removal schedule — so the
synchronous rounds match any sequential oracle exactly.

Scale shape: each round is ONE aggregate shuffle (degrees) plus two
anti-joins against the removed-vertex set — which shrinks to empty as
the peel converges, so AQE broadcasts it — and one state cut. The
convergence signal (live-edge count) rides the cut write as a
CollectMetrics partial (the pagerank observe() pattern): one job per
round, no separate count job. Rounds are bounded by the peel depth,
O(log n) on power-law web graphs (degeneracy ordering collapses
geometrically), worst-case O(n) on a path — same caveat class as the
other level-synchronous loops (see docs/SCALE.md).
"""

from __future__ import annotations

import warnings
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from efficient_graph_algorithms_spark.plans.lineage import StateCutter


def k_core(
    spark: SparkSession,
    edges: DataFrame,
    k: int,
    max_iter: int = 100,
    num_partitions: int | None = None,
) -> tuple[DataFrame, dict[str, Any]]:
    """Returns (core(id, degree), info). ``core`` holds the vertices of
    the k-core with their degree inside it (always ≥ k at the fixpoint).

    ``max_iter`` bounds the peel rounds; if hit before the fixpoint the
    result is the graph after exactly ``max_iter`` peels (a superset of
    the k-core) and ``info["converged"]`` is False — the same
    not-final contract as connected_components. Extra rounds past the
    fixpoint are no-ops, so an unrolled-SQL oracle with a fixed round
    count coincides with an early-stopping run.
    """
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    sp = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    sym = (
        edges.select("src", "dst")
        .unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        # repartition BEFORE distinct (r6): hash(src) satisfies the
        # distinct's (src,dst) clustering, so dedup and the peel loop's
        # src layout share ONE exchange
        .repartition(sp, "src")
        .distinct()
        .persist()
    )
    n_edges = sym.count()
    # in-memory barriers only while the live edge set is small enough to
    # sit in the block manager without heap pressure (the pagerank
    # 100M-edge measurement); larger graphs parquet-cut every round (r5)
    mem_barrier = n_edges <= 8_000_000

    from efficient_graph_algorithms_spark.operators.pagerank import _free_local_ckpt

    info: dict[str, Any] = {"rounds": 0, "k": k}
    live = sym
    converged = False
    _prev_live = None
    with StateCutter(spark, "kcore", keep=2) as cut:
        prev_edges = n_edges
        for it in range(1, max_iter + 1):
            removed = (
                live.groupBy("src")
                .agg(F.count(F.lit(1)).alias("deg"))
                .where(F.col("deg") < k)
                .select(F.col("src").alias("rid"))
            )
            nxt = live.join(
                removed, live["src"] == removed["rid"], "left_anti"
            ).join(removed, live["dst"] == removed["rid"], "left_anti")
            if it == 1:
                from efficient_graph_algorithms_spark.plans.explain import dump_plan

                dump_plan(nxt, "kcore_round")
            if (it % 8 == 0) or not mem_barrier:
                # periodic parquet round-trip: stats reset (lineage.py);
                # large graphs take this path every round
                live, got = cut.observe(nxt, live_edges=F.count(F.lit(1)))
            else:
                # r6: localCheckpoint barrier instead of a tmpfs parquet
                # round-trip every peel — the degree side passes through
                # an Aggregate so the carried stats estimate grows only
                # linearly (the pagerank/LPA argument), and the cut
                # above bounds it for deep peels
                import uuid as _uuid

                from pyspark.sql.observation import Observation

                obs = Observation(f"kcore_{_uuid.uuid4().hex[:12]}_it{it}")
                live = nxt.observe(
                    obs, F.count(F.lit(1)).alias("live_edges")
                ).localCheckpoint(eager=True)
                got = {"live_edges": obs.get["live_edges"]}
            # explicit block hygiene (pagerank pattern): free the
            # superseded round's checkpoint now that its successor is
            # materialized
            if _prev_live is not None:
                _free_local_ckpt(_prev_live)
            _prev_live = live
            info["rounds"] = it
            live_edges = int(got["live_edges"] or 0)
            # a peel round is a no-op iff it deletes no edges: every
            # removed vertex has 1 <= deg < k (degree-0 vertices never
            # enter the symmetrized edge set), so vertex removals and
            # edge-count drops coincide exactly
            if live_edges == prev_edges:
                converged = True
                break
            prev_edges = live_edges
            if live_edges == 0:
                converged = True  # empty graph is trivially the fixpoint
                break
        core = (
            live.groupBy(F.col("src").alias("id"))
            .agg(F.count(F.lit(1)).alias("degree"))
            .localCheckpoint(eager=True)  # pin before the cut dir is dropped
        )
        if _prev_live is not None:
            _free_local_ckpt(_prev_live)  # core is materialized; live done
    info["converged"] = converged
    info["core_edges"] = prev_edges
    if not converged:
        warnings.warn(
            f"k_core hit max_iter={max_iter} before the peel fixpoint — "
            "the result is a superset of the k-core",
            stacklevel=2,
        )
    sym.unpersist()
    return core, info
