"""Strongly connected components of the DIRECTED link graph.

The web graph is directed, and its SCC structure is the classic
"bowtie" of web science (Broder et al., "Graph structure in the web",
2000 — public paper): one giant core SCC, IN/OUT tendrils, and a dust
of small components. PageRank-family kernels and the undirected CC
operator don't see this; SCC does. No reference counterpart
(``reference src/ega`` is undirected-kernel machinery); engine
extension in the same family as HITS / k-core / ANF.

Algorithm — trim + forward coloring + backward marking (the
distributed-SCC scheme published as Orzan's coloring and the FW-BW
method; every phase is a level-synchronous DataFrame fixpoint):

repeat until no vertex is unassigned:
  1. TRIM to fixpoint: a live vertex with no in-edge or no out-edge
     (within the live subgraph) is a singleton SCC — assign and drop.
     Removing a layer exposes the next (tendrils peel off in chains).
  2. COLOR forward to fixpoint: color(v) = min id that reaches v,
     propagated along edge direction (one gather shuffle per hop).
  3. MARK backward to fixpoint: roots are vertices with
     color(v) == v; mark(v) spreads against edge direction but only
     within a color class. Marked vertices form exactly the SCC of
     their color root (v is marked iff v reaches the root r=color(v);
     r reaches v by the definition of color; so marked ⇔ mutually
     reachable with the root).
  4. EXTRACT: assign scc = color to marked vertices (the color root is
     provably the minimum member of its SCC: any smaller member would
     have recolored the whole class). Then PARTITION: an SCC is always
     monochromatic — an edge whose endpoints took different colors can
     never lie on a cycle — so cross-color edges are deleted
     permanently and the residual graph fragments geometrically.

Labels are deterministic and schedule-independent: scc(v) = min id of
v's strongly connected component — exactly what a transitive-closure
SQL oracle computes, so the full-convergence run is driver-verifiable
(unlike PageRank there is no trajectory to pin).

Scale shape: every phase is one equi-join shuffle per hop with its
convergence scalar (monotone: remaining count / color sum / marked
count) riding the state-cut write as a CollectMetrics partial — one
job per hop, no driver collects beyond scalars. Each stream (live
edges, remaining, colors, marks) cuts through its OWN StateCutter so
keep= rotation can never delete a generation another stream still
reads. Hop counts are bounded by the SCC-quotient diameter; web
graphs are shallow. See docs/SCALE.md.
"""

from __future__ import annotations

import warnings
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from efficient_graph_algorithms_spark.plans.lineage import StateCutter


def strongly_connected_components(
    spark: SparkSession,
    edges: DataFrame,
    max_outer: int = 50,
    max_hops: int = 500,
    num_partitions: int | None = None,
) -> tuple[DataFrame, dict[str, Any]]:
    """Returns (labels(id, scc), info).

    ``scc`` is the minimum vertex id of the component — deterministic,
    schedule-independent, and directly comparable to a
    transitive-closure oracle. Self-loops are ignored (a vertex with
    only a self-loop is a singleton SCC, as usual).

    info: outer_rounds, trim_assigned, hops (total synchronous hops
    across all phases), converged.
    """
    sp = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    e0 = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(sp, "src")
        .persist()
    )
    try:
        # vertex domain from the ORIGINAL edges, not e0: a vertex whose only
        # edges are self-loops must still get its singleton-SCC row (the
        # docstring's contract); it enters with degree 0 in e0 and the TRIM
        # peel assigns it scc = own id
        verts = (
            edges.select(F.col("src").alias("id"))
            .unionByName(edges.select(F.col("dst").alias("id")))
            .distinct()
        )

        info: dict[str, Any] = {"outer_rounds": 0, "trim_assigned": 0, "hops": 0}
        assigned_parts: list[DataFrame] = []
        converged = False

        with StateCutter(spark, "scc_live", keep=3) as cut_live, \
             StateCutter(spark, "scc_rem", keep=3) as cut_rem, \
             StateCutter(spark, "scc_col", keep=3) as cut_col, \
             StateCutter(spark, "scc_mark", keep=3) as cut_mark:
            live, got = cut_live.observe(e0, n=F.count(F.lit(1)))
            remaining, got = cut_rem.observe(verts, n=F.count(F.lit(1)))
            n_remaining = int(got["n"] or 0)

            for outer in range(1, max_outer + 1):
                if n_remaining == 0:
                    converged = True
                    break
                info["outer_rounds"] = outer

                # -- 1. TRIM to fixpoint ---------------------------------
                while True:
                    has_out = live.select(F.col("src").alias("id")).distinct()
                    has_in = live.select(F.col("dst").alias("id")).distinct()
                    keep = remaining.join(has_out, "id", "left_semi").join(
                        has_in, "id", "left_semi"
                    )
                    keep, got = cut_rem.observe(keep, n=F.count(F.lit(1)))
                    info["hops"] += 1
                    n_keep = int(got["n"] or 0)
                    if n_keep == n_remaining:
                        break
                    trivial = remaining.join(keep, "id", "left_anti").select(
                        "id", F.col("id").alias("scc")
                    ).localCheckpoint(eager=True)
                    assigned_parts.append(trivial)
                    info["trim_assigned"] += n_remaining - n_keep
                    remaining = keep
                    n_remaining = n_keep
                    live, _ = cut_live.observe(
                        live.join(remaining, live["src"] == remaining["id"], "left_semi")
                        .join(remaining, live["dst"] == remaining["id"], "left_semi"),
                        n=F.count(F.lit(1)),
                    )
                    if n_remaining == 0:
                        break
                if n_remaining == 0:
                    converged = True
                    break

                # -- 2. COLOR forward to fixpoint ------------------------
                colors = remaining.select("id", F.col("id").alias("color"))
                colors, got = cut_col.observe(colors, s=F.sum("color"))
                prev_sum = int(got["s"] or 0)
                for _ in range(max_hops):
                    inc = (
                        live.join(colors, live["src"] == colors["id"], "inner")
                        .groupBy(live["dst"].alias("id"))
                        .agg(F.min("color").alias("in_color"))
                    )
                    nxt = colors.join(inc, "id", "left").select(
                        colors["id"],
                        F.least(
                            F.col("color"), F.coalesce("in_color", F.col("color"))
                        ).alias("color"),
                    )
                    colors, got = cut_col.observe(nxt, s=F.sum("color"))
                    info["hops"] += 1
                    cur = int(got["s"] or 0)
                    if cur == prev_sum:  # color sum is monotone decreasing
                        break
                    prev_sum = cur
                else:
                    warnings.warn("scc: coloring hit max_hops", stacklevel=2)

                # -- 3. MARK backward within color classes to fixpoint ---
                state = colors.select(
                    "id", "color", (F.col("id") == F.col("color")).alias("mark")
                )
                state, got = cut_mark.observe(state, m=F.sum(F.col("mark").cast("long")))
                prev_marked = int(got["m"] or 0)
                for _ in range(max_hops):
                    dstside = state.select(
                        F.col("id").alias("w"),
                        F.col("color").alias("wcolor"),
                        F.col("mark").alias("wmark"),
                    )
                    hit = (
                        live.join(dstside, live["dst"] == dstside["w"], "inner")
                        .where(F.col("wmark"))
                        .select(live["src"].alias("id"), F.col("wcolor").alias("color"))
                        .distinct()
                        .withColumn("hit", F.lit(True))
                    )
                    # at most one hit row per (id, color): no row explosion
                    nxt = state.join(hit, ["id", "color"], "left").select(
                        "id",
                        "color",
                        (F.col("mark") | F.coalesce("hit", F.lit(False))).alias("mark"),
                    )
                    state, got = cut_mark.observe(nxt, m=F.sum(F.col("mark").cast("long")))
                    info["hops"] += 1
                    cur = int(got["m"] or 0)
                    if cur == prev_marked:  # marked set is monotone increasing
                        break
                    prev_marked = cur
                else:
                    warnings.warn("scc: marking hit max_hops", stacklevel=2)

                # -- 4. EXTRACT + PARTITION ------------------------------
                found = state.where("mark").select(
                    "id", F.col("color").alias("scc")
                ).localCheckpoint(eager=True)
                assigned_parts.append(found)
                remaining, got = cut_rem.observe(
                    state.where(~F.col("mark")).select("id"), n=F.count(F.lit(1))
                )
                n_remaining = int(got["n"] or 0)
                # monochromatic-SCC partition: drop cross-color edges forever,
                # plus edges touching assigned vertices
                csrc = colors.select(F.col("id").alias("src"), F.col("color").alias("c1"))
                cdst = colors.select(F.col("id").alias("dst"), F.col("color").alias("c2"))
                live, _ = cut_live.observe(
                    live.join(csrc, "src").join(cdst, "dst")
                    .where(F.col("c1") == F.col("c2"))
                    .select("src", "dst")
                    .join(remaining, F.col("src") == remaining["id"], "left_semi")
                    .join(remaining, F.col("dst") == remaining["id"], "left_semi"),
                    n=F.count(F.lit(1)),
                )
            else:
                if n_remaining == 0:
                    # the final EXTRACT emptied the graph on exactly the last
                    # outer round; the top-of-loop check never re-ran
                    converged = True
                else:
                    warnings.warn(
                        f"scc hit max_outer={max_outer} with {n_remaining} "
                        "vertices unassigned — their labels are missing from "
                        "the result",
                        stacklevel=2,
                    )

            if assigned_parts:
                labels = assigned_parts[0]
                for part in assigned_parts[1:]:
                    labels = labels.unionByName(part)
            else:  # edgeless input: no vertices, empty labelling
                _idt = edges.schema["src"].dataType.simpleString()
                labels = spark.createDataFrame([], f"id {_idt}, scc {_idt}")
            labels = labels.localCheckpoint(eager=True)

        info["converged"] = converged
    finally:
        # unpersist on the error path too (betweenness.py shape)
        e0.unpersist()
    return labels, info


def _reach_fixpoint(spark, e: DataFrame, seeds: DataFrame, name: str) -> DataFrame:
    """Vertex set reachable from ``seeds`` (inclusive) along directed
    edges e(src, dst): level-synchronous frontier BFS to fixpoint, one
    equi-join + one anti-join per hop, visited set through bounded
    state cuts. Returns (id)."""
    with StateCutter(spark, name, keep=3) as cut:
        state, got = cut.observe(seeds.select("id").distinct(), n=F.count(F.lit(1)))
        prev = int(got["n"] or 0)
        frontier = state
        while True:
            grown = (
                frontier.join(e, frontier["id"] == e["src"])
                .select(F.col("dst").alias("id"))
                .distinct()
            )
            new = grown.join(state, "id", "left_anti")
            state, got = cut.observe(state.unionByName(new), n=F.count(F.lit(1)))
            total = int(got["n"] or 0)
            if total == prev:
                break
            # next frontier = exactly the newly added ids; pin it (its
            # lineage reads the PREVIOUS cut generation, which keep=3
            # rotation may delete before the next hop consumes it)
            frontier = new.localCheckpoint(eager=True)
            prev = total
        out = state.localCheckpoint(eager=True)  # outlives the cutter
    return out


def bowtie_classes(
    spark: SparkSession,
    edges: DataFrame,
    num_partitions: int | None = None,
) -> tuple[DataFrame, dict[str, Any]]:
    """Broder bowtie decomposition of a directed link graph
    (Broder et al., "Graph structure in the Web", WWW 2000):

        CORE  the largest SCC (ties broken by min scc label)
        IN    reaches the core, not in it
        OUT   reachable from the core, not in it
        TEND  weakly connected to the core but none of the above
              (tendrils + tubes)
        DISC  everything else (other weak components)

    Returns (labels(id, scc, cls), info with class counts). Everything
    is a composition of fixpoints already shipped: SCC (min-label),
    forward/backward frontier BFS from the core member set, and the
    undirected hash-to-min components for the weak-connectivity split —
    all schedule-independent, so the result admits a recursive-CTE
    oracle with no round pinning.
    """
    sp = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    labels, scc_info = strongly_connected_components(
        spark, edges, num_partitions=sp
    )
    sizes = labels.groupBy("scc").agg(F.count(F.lit(1)).alias("n"))
    core_row = sizes.orderBy(F.desc("n"), "scc").first()
    if core_row is None:  # edgeless input
        empty = spark.createDataFrame([], "id long, scc long, cls string")
        # same info shape as the normal return — callers (e.g. the CLI
        # bowtie handler) read class_counts unconditionally
        return empty, {"core_scc": None, "class_counts": {}, **scc_info}
    core_label = int(core_row["scc"])
    core = labels.where(F.col("scc") == core_label).select("id")

    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(sp, "src")
        .persist()
    )
    try:
        e.count()
        rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        fwd = _reach_fixpoint(spark, e, core, "bowtie_fwd")     # core ∪ OUT
        bwd = _reach_fixpoint(spark, rev, core, "bowtie_bwd")   # core ∪ IN

        from efficient_graph_algorithms_spark.operators.components import (
            connected_components,
        )

        # pass the FULL vertex universe: e excludes self-loops, so a
        # vertex whose only edges are self-loops would otherwise be absent
        # from weak — silently dropped by the inner join below (and, were
        # it the core vertex, first() would return None and crash)
        weak, _ = connected_components(
            spark, e, vertices=labels.select("id"), num_partitions=sp
        )
        core_weak = int(
            weak.join(core.limit(1), "id").select("component").first()["component"]
        )

        out = (
            labels.join(fwd.select("id", F.lit(1).alias("_f")), "id", "left")
            .join(bwd.select("id", F.lit(1).alias("_b")), "id", "left")
            .join(weak, "id")
            .select(
                "id",
                "scc",
                F.when(F.col("scc") == core_label, F.lit("CORE"))
                .when(F.col("_b").isNotNull(), F.lit("IN"))
                .when(F.col("_f").isNotNull(), F.lit("OUT"))
                .when(F.col("component") == core_weak, F.lit("TEND"))
                .otherwise(F.lit("DISC"))
                .alias("cls"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        # unpersist on the error path too (betweenness.py shape)
        e.unpersist()
    counts = {r["cls"]: r["n"] for r in
              out.groupBy("cls").agg(F.count(F.lit(1)).alias("n")).collect()}
    return out, {"core_scc": core_label, "class_counts": counts, **scc_info}
