"""Deterministic random-walk corpus generation over the link graph.

DeepWalk/node2vec-style pipelines (public papers: Perozzi et al. 2014,
Grover & Leskovec 2016) train sequence models on random-walk corpora
sampled from a graph. At 100 TB the property that matters is
REPRODUCIBILITY: the corpus must be a pure function of (graph, seed)
so re-runs, resumes, and train/eval splits are stable — no RNG state
on executors. This operator derives every choice from a portable
60-bit md5 hash of (walk, step, candidate, seed): picking the
argmin-hash out-neighbor at each step IS a uniform choice (the hash
family is a fixed permutation-like family over candidates), yet both
Spark and an ANSI-SQL oracle can replay it bit-for-bit — the same
portability trick as the MinHash/LSH family (functions/hashing.py).

No reference counterpart as a corpus generator; the reference's
random-walk KERNEL (``reference src/ega/algorithms/graph_kernels.py:
66-79``) computes walk-distribution vectors (operators/kernels.py
covers it); this operator materializes the walks themselves — an
LLM-data-pipeline extension in the SURVEY §2.12 family.

Scale shape: one equi-join shuffle per step (state ⋈ edges on the
current vertex) + a min-struct aggregate per walk (map-side partial
combine). State is exactly one row per live walk regardless of degree;
dead-end walks drop out of the join and finish early. The emitted
corpus accumulates per step as cheap narrow appends; the walk state
cuts through a StateCutter each step with the live-walk count riding
the write (observe() pattern, one job per step).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from efficient_graph_algorithms_spark.functions.hashing import spark_md5_60bit_sql
from efficient_graph_algorithms_spark.plans.lineage import StateCutter


def _choice_hash(walk, step: int, cand, seed: int):
    """Portable 60-bit hash driving the step choice — identical text
    hashed on the Spark and DuckDB sides (see walk_choice_duck_sql)."""
    expr = spark_md5_60bit_sql(
        f"concat_ws(':', CAST({walk} AS STRING), '{step}', "
        f"CAST({cand} AS STRING), 'w{seed}')"
    )
    return F.expr(expr)


def walk_choice_duck_sql(walk: str, step: int, cand: str, seed: int) -> str:
    """DuckDB expression computing the identical choice hash."""
    from efficient_graph_algorithms_spark.functions.hashing import duckdb_md5_60bit_sql

    return duckdb_md5_60bit_sql(
        f"concat_ws(':', CAST({walk} AS VARCHAR), '{step}', "
        f"CAST({cand} AS VARCHAR), 'w{seed}')"
    )


def _drive_walks(
    spark: SparkSession,
    edges: DataFrame,
    walk_length: int,
    walks_per_vertex: int,
    sources: DataFrame | None,
    as_paths: bool,
    num_partitions: int | None,
    name: str,
    with_prev: bool,
    make_step,
) -> tuple[DataFrame, dict[str, Any]]:
    """Shared level-synchronous walk driver (uniform + biased walkers).

    ``make_step(state, e, t)`` returns the next walk state with the same
    columns as ``state`` (``walk``, [``prev``,] ``cur``). Everything
    else — edge prep, walk-id scheme, StateCutter/observe loop,
    early-exit, corpus assembly, as_paths rollup — lives once here so
    the two public walkers cannot drift."""
    sp = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(sp, "src")
        .persist()
    )
    e.count()
    try:
        starts = (
            sources.select("id")
            if sources is not None
            else e.select(F.col("src").alias("id")).unionByName(
                e.select(F.col("dst").alias("id"))
            )
        ).distinct()

        k = walks_per_vertex
        cols = [(F.col("id") * k + F.col("walk_no")).alias("walk")]
        if with_prev:
            cols.append(F.col("id").alias("prev"))
        cols.append(F.col("id").alias("cur"))
        state = starts.select(
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("walk_no"), "id"
        ).select(*cols)

        info: dict[str, Any] = {"steps_run": 0, "live_walks": []}
        parts: list[DataFrame] = []
        with StateCutter(spark, name, keep=3) as cut:
            state, got = cut.observe(state, n=F.count(F.lit(1)))
            info["n_walks"] = int(got["n"] or 0)
            parts.append(
                state.select("walk", F.lit(0).alias("step"), F.col("cur").alias("id"))
                .localCheckpoint(eager=True)
            )
            for t in range(1, walk_length + 1):
                nxt = make_step(state, e, t)
                state, got = cut.observe(nxt, n=F.count(F.lit(1)))
                live = int(got["n"] or 0)
                info["steps_run"] = t
                info["live_walks"].append(live)
                parts.append(
                    state.select(
                        "walk", F.lit(t).alias("step"), F.col("cur").alias("id")
                    ).localCheckpoint(eager=True)
                )
                if live == 0:
                    break
    finally:
        # release the pinned edge relation even if a step job dies
        # (executor loss, scratch-dir write failure mid-loop)
        e.unpersist()

    corpus = parts[0]
    for p in parts[1:]:
        corpus = corpus.unionByName(p)
    if as_paths:
        corpus = (
            corpus.groupBy("walk")
            .agg(F.sort_array(F.collect_list(F.struct("step", "id"))).alias("s"))
            .select("walk", F.col("s.id").alias("path"))
        )
    return corpus, info


def random_walks(
    spark: SparkSession,
    edges: DataFrame,
    walk_length: int,
    walks_per_vertex: int = 1,
    seed: int = 42,
    sources: DataFrame | None = None,
    as_paths: bool = False,
    num_partitions: int | None = None,
) -> tuple[DataFrame, dict[str, Any]]:
    """Returns (corpus, info).

    corpus (long form, default): (walk bigint, step int, id bigint) —
    one row per visited vertex; step 0 is the start. ``walk`` =
    start_id * walks_per_vertex + walk_no, so corpora are stable under
    re-partitioning and appends. Dead-end walks simply stop early.

    corpus (``as_paths=True``): (walk, path array<bigint>) — the same
    rows rolled up in step order (the shape a sequence trainer reads).

    The next vertex from u at step t is argmin over out-neighbors v of
    md5_60bit('walk:t:v:wSEED') with v as the tie-break — uniform,
    deterministic, and replayable in ANSI SQL (walk_choice_duck_sql).

    info: steps_run, live_walks (per step), n_walks.
    """
    if walk_length < 0:
        raise ValueError(f"walk_length must be >= 0, got {walk_length}")
    if walks_per_vertex < 1:
        raise ValueError(f"walks_per_vertex must be >= 1, got {walks_per_vertex}")

    def step(state: DataFrame, e: DataFrame, t: int) -> DataFrame:
        cand = state.join(e, state["cur"] == e["src"], "inner").select(
            "walk", F.col("dst"), _choice_hash("walk", t, "dst", seed).alias("h")
        )
        return (
            cand.groupBy("walk")
            .agg(F.min(F.struct("h", "dst")).alias("pick"))
            .select("walk", F.col("pick.dst").alias("cur"))
        )

    return _drive_walks(
        spark, edges, walk_length, walks_per_vertex, sources, as_paths,
        num_partitions, "walks", False, step,
    )


def _n2v_choice_hash(walk, step: int, cand, j, seed: int):
    """Choice hash for the biased (node2vec) walk: includes the weight
    replica index j so integer-weighted sampling stays exact."""
    expr = spark_md5_60bit_sql(
        f"concat_ws(':', 'n2v', CAST({walk} AS STRING), '{step}', "
        f"CAST({cand} AS STRING), CAST({j} AS STRING), 'w{seed}')"
    )
    return F.expr(expr)


def n2v_choice_duck_sql(walk: str, step: int, cand: str, j: str, seed: int) -> str:
    """DuckDB expression computing the identical biased-choice hash."""
    from efficient_graph_algorithms_spark.functions.hashing import duckdb_md5_60bit_sql

    return duckdb_md5_60bit_sql(
        f"concat_ws(':', 'n2v', CAST({walk} AS VARCHAR), '{step}', "
        f"CAST({cand} AS VARCHAR), CAST({j} AS VARCHAR), 'w{seed}')"
    )


def node2vec_walks(
    spark: SparkSession,
    edges: DataFrame,
    walk_length: int,
    w_return: int = 1,
    w_in: int = 4,
    w_out: int = 2,
    walks_per_vertex: int = 1,
    seed: int = 42,
    sources: DataFrame | None = None,
    as_paths: bool = False,
    num_partitions: int | None = None,
) -> tuple[DataFrame, dict[str, Any]]:
    """Second-order biased walks (node2vec, Grover & Leskovec 2016)
    with the same reproducibility contract as ``random_walks``.

    A candidate v stepping from ``cur`` with predecessor ``prev``
    weighs (node2vec's 1/p, 1, 1/q rescaled to small non-negative
    INTEGERS — exactness beats normalization, which cancels in the
    choice anyway):

        v == prev            -> w_return   (backtrack, ~1/p)
        edge(prev, v) exists -> w_in       (stay near prev, ~1)
        otherwise            -> w_out      (explore outward, ~1/q)

    Exact weighted sampling without floats: candidate v is replicated
    w times as (v, j) for j < w and the walker takes the argmin choice
    hash over the replicated set — a weight-w candidate holds w lottery
    tickets, so P(pick v) = w_v / sum(w), and the draw is replayable
    bit-for-bit in ANSI SQL (n2v_choice_duck_sql). A weight of 0 drops
    the move entirely (w_return=0 gives non-backtracking walks).

    ``prev`` is initialized to the start vertex, so step 1 is uniform
    (every out-neighbor of the start is at distance 1 from prev=cur —
    both engines replay the same degenerate CASE).

    Cost vs the uniform walk: one extra equi-join per step (the
    edge(prev, v) membership probe, keyed on prev) and a candidate
    blow-up bounded by max(w) — both linear, no new shuffle shape.
    """
    for nm, w in (("w_return", w_return), ("w_in", w_in), ("w_out", w_out)):
        if not isinstance(w, int) or w < 0:
            raise ValueError(f"{nm} must be a non-negative int, got {w!r}")
    if w_in + w_out + w_return == 0:
        raise ValueError("at least one weight must be positive")
    if walk_length < 0:
        raise ValueError(f"walk_length must be >= 0, got {walk_length}")
    if walks_per_vertex < 1:
        raise ValueError(f"walks_per_vertex must be >= 1, got {walks_per_vertex}")

    def step(state: DataFrame, e: DataFrame, t: int) -> DataFrame:
        # step 1 has no real predecessor (prev is initialized to the
        # start vertex), so every candidate classifies as a w_in move;
        # proper node2vec's first step is UNIFORM. For w_in > 0 the
        # all-equal weights already select uniformly (identical ticket
        # counts), so w_in is kept for bit-compatibility with the
        # unrolled SQL oracle; w_in == 0 would kill every walk at step
        # 1, so it falls back to weight 1 — uniform, as intended.
        w_in_eff = w_in if (t > 1 or w_in > 0) else 1
        pe = e.select(F.col("src").alias("_psrc"), F.col("dst").alias("_pdst"))
        cand = state.join(e, state["cur"] == e["src"], "inner").select(
            "walk", "prev", "cur", F.col("dst")
        )
        flagged = cand.join(
            pe,
            (cand["prev"] == pe["_psrc"]) & (cand["dst"] == pe["_pdst"]),
            "left",
        ).select(
            "walk",
            "cur",
            "dst",
            F.when(F.col("dst") == F.col("prev"), F.lit(w_return))
            .when(F.col("_pdst").isNotNull(), F.lit(w_in_eff))
            .otherwise(F.lit(w_out))
            .alias("_w"),
        )
        expl = flagged.where(F.col("_w") > 0).select(
            "walk",
            "cur",
            "dst",
            F.explode(F.sequence(F.lit(0), F.col("_w") - 1)).alias("_j"),
        )
        return (
            expl.select(
                "walk",
                "cur",
                "dst",
                _n2v_choice_hash("walk", t, "dst", "_j", seed).alias("h"),
            )
            .groupBy("walk", "cur")
            .agg(F.min(F.struct("h", "dst")).alias("pick"))
            .select(
                "walk",
                F.col("cur").alias("prev"),
                F.col("pick.dst").alias("cur"),
            )
        )

    return _drive_walks(
        spark, edges, walk_length, walks_per_vertex, sources, as_paths,
        num_partitions, "n2v_walks", True, step,
    )
