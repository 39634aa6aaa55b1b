"""Redirect-chain resolution (URL canonicalization) via pointer doubling.

A crawl's HTTP 301/302 layer is a FUNCTIONAL graph — each url has at
most one redirect target — and canonicalization means following every
chain to its terminal (the first non-redirecting url) before link
extraction, dedup, or PageRank ever see the edge table.  Chasing
chains one hop per round costs O(L) joins for chain length L; pointer
doubling (`successor(v) <- successor(successor(v))`, the classic
Wyllie list-ranking step) costs O(log L): after round k every row
points 2^k hops ahead, clamped at its terminal.

Semantics.  Extend the redirect map f to a total function with a
fixpoint at every non-source url (f(t) = t when t never redirects).
After round k the state row for source v holds ``ptr = f^(2^k)(v)``
and ``hops`` = number of REAL redirect steps taken before hitting the
fixpoint (so for resolved rows hops is the exact chain length).
Redirect CYCLES (a -> b -> a — they exist in real crawls) never reach
a fixpoint: their rows stay ``resolved = 0`` and their ptr/hops after
a FIXED number of rounds are still fully deterministic, which is what
makes the fixed-round face exactly SQL-unrollable (the kcore/ktruss
oracle contract; driver query ``graph_redirects``).  Early stop fires
only when zero unresolved rows remain — further rounds are then the
identity, so stopping early agrees with any deeper unroll.

Plan shape per round: one self-equi-join of the live (unresolved)
rows against the full state on ``ptr = id`` — both sides hash-shuffle
on the join key, no broadcast assumption (at web scale the redirect
table is itself huge) — then a union with the settled rows and a
lineage cut (parquet round trip, the StateCutter discipline every
iterative operator here uses).  State is exactly |redirects| rows at
every round; the live side only shrinks.  At 10^12 urls with chains
of length <= 32 this is 5-6 shuffles total, each co-partitioned by
the same id hash.

No counterpart in ``reference src/ega`` (its graphs arrive already
built); engine extension in the §2.12 web-pipeline family, same
posture as the crawl-frontier and Bloom-seen operators.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from efficient_graph_algorithms_spark.plans.lineage import StateCutter


def resolve_redirects(
    spark: SparkSession,
    redirects: DataFrame,
    rounds: int | None = None,
    num_partitions: int | None = None,
    validate: bool = True,
) -> tuple[DataFrame, dict[str, Any]]:
    """Resolve every redirect source to its terminal target.

    redirects: (id, target) — functional: each id appears at most once
    (validated unless ``validate=False``; duplicates raise).  Self
    rows (id = target) are legal and behave as 1-cycles.  Returns
    ``(out, info)`` where out is (id, terminal, hops, resolved) with
    one row per redirect source: for ``resolved = 1`` rows, terminal
    is the first non-redirecting url on the chain and hops its exact
    length; ``resolved = 0`` rows sit on (or feed into) a redirect
    cycle and terminal/hops are the deterministic pointer-doubling
    state after ``rounds`` rounds.  info carries rounds_run and
    n_unresolved.

    ``rounds`` defaults to ceil(log2(n)) + 1, enough for any acyclic
    chain over n sources; pass it explicitly for the fixed-round
    (SQL-unrollable) face.
    """
    sp = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    r = redirects.select(
        F.col("id").cast("long").alias("id"),
        F.col("target").cast("long").alias("target"),
    ).where(F.col("id").isNotNull() & F.col("target").isNotNull())

    if validate:
        dup = r.groupBy("id").count().where(F.col("count") > 1).limit(1).collect()
        if dup:
            raise ValueError(
                f"redirects is not functional: id {dup[0]['id']} has "
                f"{dup[0]['count']} targets"
            )

    if rounds is None:
        n = r.count()
        rounds = max(1, (max(n, 1) - 1).bit_length() + 1)

    # s0: ptr = f(id), done = ptr is not itself a redirect source
    keys = r.select(F.col("id").alias("kid"))
    state = (
        r.join(keys, r["target"] == keys["kid"], "left")
        .select(
            "id",
            F.col("target").alias("ptr"),
            F.lit(1).cast("long").alias("hops"),
            F.when(F.col("kid").isNull(), F.lit(1))
            .otherwise(F.lit(0))
            .cast("int")
            .alias("done"),
        )
        .repartition(sp, "id")
    )

    rounds_run = 0
    undone_agg = {"undone": F.sum(1 - F.col("done"))}
    with StateCutter(spark, "redirects") as cut:
        # the unresolved counter rides every cut write as a
        # CollectMetrics partial (the sssp/pagerank observe pattern) —
        # one job per round, no separate early-stop scan
        state, got = cut.observe(state, **undone_agg)
        undone = int(got["undone"] or 0)
        for _ in range(rounds):
            if undone == 0:
                break  # identity from here on — agrees with any deeper unroll
            t = state.select(
                F.col("id").alias("t_id"),
                F.col("ptr").alias("t_ptr"),
                F.col("hops").alias("t_hops"),
                F.col("done").alias("t_done"),
            )
            # done rows' ptr is never a source id, so the left join
            # preserves them unchanged; live rows always match.
            nxt = (
                state.join(t, state["ptr"] == t["t_id"], "left")
                .select(
                    "id",
                    F.when(F.col("done") == 1, F.col("ptr"))
                    .otherwise(F.col("t_ptr"))
                    .alias("ptr"),
                    F.when(F.col("done") == 1, F.col("hops"))
                    .otherwise(F.col("hops") + F.col("t_hops"))
                    .alias("hops"),
                    F.when(F.col("done") == 1, F.lit(1))
                    .otherwise(F.col("t_done"))
                    .cast("int")
                    .alias("done"),
                )
                .repartition(sp, "id")
            )
            state, got = cut.observe(nxt, **undone_agg)
            undone = int(got["undone"] or 0)
            rounds_run += 1

        out = state.select(
            "id",
            F.col("ptr").alias("terminal"),
            "hops",
            F.col("done").alias("resolved"),
        )
        # materialize before the cutter's scratch dir is torn down
        out = out.localCheckpoint(eager=True)

    info = {"rounds_run": rounds_run, "rounds_max": rounds, "n_unresolved": undone}
    return out, info
