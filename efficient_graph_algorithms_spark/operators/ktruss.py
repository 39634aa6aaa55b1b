"""k-truss decomposition by synchronous edge peeling.

The k-truss of an undirected simple graph is the maximal subgraph in
which every edge has support >= k-2, where support(e={u,v}) is the
number of triangles containing e (= |N(u) ∩ N(v)|). Trusses are the
edge-level sharpening of k-cores: a k-truss is always inside the
(k-1)-core, and on web graphs it isolates genuinely co-citing /
co-cited page clusters while k-core alone is fooled by star-shaped
link farms (hubs have high degree but no triangles). No reference
counterpart (``reference src/ega`` ships no subgraph-pruning kernel);
engine extension in the same family as k-core / HITS.

Algorithm (synchronous peel): repeat
    support ← per-edge triangle counts over the live edge set
    remove every edge with support < k-2
until a round removes nothing. Like the k-core peel the fixpoint is
schedule-independent — the k-truss is the unique maximal edge set with
all supports >= k-2 — so the synchronous rounds match any sequential
oracle exactly, and extra rounds past the fixpoint are no-ops (the
pinned-rounds contract the unrolled SQL driver oracle relies on).

Scale shape: each round is the degree-ordered wedge join (the same
shuffle-optimal plan as operators/triangles.py — oriented out-degrees
are O(sqrt |E|), bounding wedge count), one explode of 3 edge pairs
per triangle, and one groupBy-edge aggregate; the removal is an
anti-join that AQE turns into a broadcast as the peel converges. The
live-edge count rides the state-cut write as a CollectMetrics partial
(the pagerank observe() pattern): one job per round. Round count is
bounded by the peel depth — small on power-law web graphs, same
caveat class as the other level-synchronous loops (docs/SCALE.md).
"""

from __future__ import annotations

import warnings
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from efficient_graph_algorithms_spark.operators.triangles import (
    oriented_edges,
    simple_undirected,
)
from efficient_graph_algorithms_spark.plans.lineage import StateCutter


def _edge_support(live: DataFrame) -> DataFrame:
    """(lo, hi, support) for every live edge in >= 1 triangle.

    Degree-ordered wedge join over the live canonical edge set — the
    triangles.py plan, but keeping all three edges of each closure
    instead of counting triples."""
    o = oriented_edges(live.select(F.col("lo").alias("src"), F.col("hi").alias("dst")))
    e1 = o.select(F.col("u").alias("w"), F.col("v").alias("a"))
    e2 = o.select(F.col("u").alias("w"), F.col("v").alias("b"))
    wedges = e1.join(e2, "w").where(F.col("a") < F.col("b"))
    closed = wedges.join(
        o.select(F.col("u").alias("a"), F.col("v").alias("b")).unionByName(
            o.select(F.col("u").alias("b"), F.col("v").alias("a"))
        ),
        ["a", "b"],
        "left_semi",
    )
    tri_edges = closed.select(
        F.explode(
            F.array(
                F.struct(
                    F.least("w", "a").alias("lo"), F.greatest("w", "a").alias("hi")
                ),
                F.struct(
                    F.least("w", "b").alias("lo"), F.greatest("w", "b").alias("hi")
                ),
                F.struct(
                    F.least("a", "b").alias("lo"), F.greatest("a", "b").alias("hi")
                ),
            )
        ).alias("e")
    )
    return tri_edges.groupBy(F.col("e.lo").alias("lo"), F.col("e.hi").alias("hi")).agg(
        F.count(F.lit(1)).alias("support")
    )


def k_truss(
    spark: SparkSession,
    edges: DataFrame,
    k: int,
    max_iter: int = 100,
    num_partitions: int | None = None,
) -> tuple[DataFrame, dict[str, Any]]:
    """Returns (truss(lo, hi, support), info).

    ``truss`` holds the canonical (lo < hi) edges of the k-truss with
    their support as computed at the START of the final peel round —
    at the fixpoint (``info["converged"]``) that IS the support within
    the truss (the last round removed nothing). If ``max_iter`` stops
    the peel early the result is the graph after exactly ``max_iter``
    peels (a superset of the k-truss, stale supports possible) and
    ``info["converged"]`` is False — the same not-final contract as
    k_core.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    sp = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    thresh = k - 2

    sym0 = (
        simple_undirected(edges.select("src", "dst"))
        .repartition(sp, "lo")
        .persist()
    )
    n_edges = sym0.count()

    info: dict[str, Any] = {"rounds": 0, "k": k}
    converged = False
    live = sym0
    live_edges = n_edges
    out = live.select("lo", "hi", F.lit(0).cast("long").alias("support"))
    with StateCutter(spark, "ktruss", keep=2) as cut:
        prev_edges = n_edges
        for it in range(1, max_iter + 1):
            sup = _edge_support(live.select("lo", "hi"))
            # the support aggregate only emits edges in >= 1 triangle;
            # the filter below drops 0-support edges exactly when the
            # peel would (thresh >= 1). thresh == 0 (k == 2) removes
            # nothing: the 2-truss is the whole simple graph
            if thresh == 0:
                nxt = live.select("lo", "hi").join(sup, ["lo", "hi"], "left").select(
                    "lo", "hi", F.coalesce("support", F.lit(0)).alias("support")
                )
            else:
                nxt = sup.where(F.col("support") >= thresh).select(
                    "lo", "hi", "support"
                )
            nxt, got = cut.observe(nxt, live_edges=F.count(F.lit(1)))
            info["rounds"] = it
            live_edges = int(got["live_edges"] or 0)
            out = nxt
            if live_edges == prev_edges or live_edges == 0 or thresh == 0:
                converged = True
                break
            prev_edges = live_edges
            live = nxt
        out = out.localCheckpoint(eager=True)  # pin before the cut dir drops
    info["converged"] = converged
    info["truss_edges"] = live_edges
    if not converged:
        warnings.warn(
            f"k_truss hit max_iter={max_iter} before the peel fixpoint — "
            "the result is a superset of the k-truss",
            stacklevel=2,
        )
    sym0.unpersist()
    return out, info
