"""Approximate Neighborhood Function (HyperBall) over the link graph.

N(v, r) = |{u : dist(v, u) <= r}| — the neighborhood function, the
workhorse statistic of web-graph structure analysis: its totals give
the effective diameter, and its per-round increments give harmonic
centrality, h(v) = sum_{r>=1} (N(v,r) - N(v,r-1)) / r. No reference
counterpart (``reference src/ega`` ships dense-kernel diffusion, not
reachability statistics); the operator is an engine extension in the
same family as HITS / k-core, and the standard published formulation
at web scale is HyperBall (Boldi & Vigna, "In-Core Computation of
Geometric Centralities with HyperBall", 2013 — public paper).

Two modes, one loop shape (synchronous ball growth, one gather
shuffle + one state cut per radius):

* ``mode="exact"`` — the ball of every (sampled) source is carried as
  distinct (id, member) pairs; each round extends members one hop and
  dedups. State is sum-of-ball-sizes rows — exact, SQL-expressible at
  pinned radius (the driver oracle), and the pytest ground truth for
  the sketch. Scale shape: right for sampled sources / small-diameter
  probes, O(n^2) worst-case state if run with all sources to the full
  diameter — the sketch exists for that regime.
* ``mode="sketch"`` — per-vertex HyperLogLog register array (m
  registers, array<int>). Round: regs(v) <- elementwise max of regs(v)
  and regs(u) over out-neighbors u; the merge is m JVM-side max
  aggregates (whole-stage codegen, no UDF). State is n * m ints
  regardless of ball sizes — the 100 TB path. Counts come from the
  standard HLL estimator with small-range correction.

Register fixpoint detection is exact: registers are monotone
non-decreasing under max-merge, so the integer sum of all registers
strictly increases until the balls stop growing; the sum rides the
state-cut write as a CollectMetrics partial (the pagerank observe()
pattern — one job per radius, no separate count job).

Determinism: register index and rank come from xxhash64 of the vertex
id with fixed literal seeds — reruns and resumes see identical
sketches.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from efficient_graph_algorithms_spark.plans.lineage import StateCutter

# HLL bias constant alpha_m for m = 64 (Flajolet et al. 2007, public).
_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def _alpha(m: int) -> float:
    return _ALPHA.get(m, 0.7213 / (1.0 + 1.079 / m))


def _hll_estimate(regs, m: int):
    """HLL count estimate from an array<int> register column (name or
    expression) — pure JVM-side expressions (aggregate/pow), no UDF."""
    regs = F.col(regs) if isinstance(regs, str) else regs
    inv_sum = F.aggregate(
        regs,
        F.lit(0.0),
        lambda acc, r: acc + F.pow(F.lit(2.0), -r.cast("double")),
    )
    raw = F.lit(_alpha(m) * m * m) / inv_sum
    zeros = F.size(F.filter(regs, lambda r: r == 0)).cast("double")
    small = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
    return F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0), small
    ).otherwise(raw)


def neighborhood_function(
    spark: SparkSession,
    edges: DataFrame,
    max_radius: int = 16,
    mode: str = "sketch",
    sources: DataFrame | None = None,
    registers: int = 64,
    directed: bool = False,
    stop_early: bool = True,
    num_partitions: int | None = None,
) -> tuple[DataFrame, dict[str, Any]]:
    """Returns (result, info).

    result (exact):  (id, r, nf)      — |ball(id, r)| for r = 1..R,
                                         counting the source itself.
    result (sketch): (id, nf_est, harmonic_est) — final-radius ball
                                         estimate + harmonic centrality.

    info: rounds, converged, totals (sum of N(v, r) per round — the
    graph neighborhood function), effective_diameter_90 (smallest r
    with total(r) >= 0.9 * final total; sketch + converged runs only).

    ``sources`` (exact mode): optional (id) DataFrame restricting which
    balls are grown — the standard ANF sampling knob; ignored by the
    sketch, which is O(m) per vertex anyway.

    ``stop_early=False`` (exact mode) always runs all ``max_radius``
    rounds so the output carries exactly one row per (source, r) pair —
    the pinned-rounds contract an unrolled SQL oracle needs; past the
    fixpoint the extra rounds are no-ops and repeat the final counts.
    """
    if mode not in ("exact", "sketch"):
        raise ValueError(f"mode must be 'exact' or 'sketch', got {mode!r}")
    if max_radius < 1:
        # exact mode would otherwise IndexError on its empty rows list
        raise ValueError(f"max_radius must be >= 1, got {max_radius}")
    if registers & (registers - 1) or registers < 16:
        raise ValueError(f"registers must be a power of two >= 16, got {registers}")
    sp = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    e = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    if not directed:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    # partition on the mode's actual join key: the sketch gather joins
    # on dst (ball_{r+1}(v) = ball_r(v) U ball_r(u)), the exact BFS
    # joins on src — persisting the wrong layout would re-shuffle the
    # full edge table every round
    e = e.distinct().repartition(sp, "src" if mode == "exact" else "dst").persist()
    try:
        e.count()
        verts = (
            e.select(F.col("src").alias("id"))
            .unionByName(e.select(F.col("dst").alias("id")))
            .distinct()
        )

        info: dict[str, Any] = {"mode": mode, "rounds": 0, "totals": []}
        if mode == "exact":
            out, inf = _exact(
                spark, e, verts, max_radius, sources, sp, info, stop_early
            )
        else:
            out, inf = _sketch(spark, e, verts, max_radius, registers, sp, info)
    finally:
        # unpersist on the error path too (the betweenness.py shape) —
        # a mid-loop failure must not leak the cached edges
        e.unpersist()
    return out, inf


def _exact(spark, e, verts, max_radius, sources, sp, info, stop_early=True):
    src_ids = (sources.select("id") if sources is not None else verts).distinct()
    state = src_ids.select("id", F.col("id").alias("m"))
    rows: list[DataFrame] = []
    converged = False
    # keep=None: every per-round ``rows`` plan reads its own cut
    # generation, so no generation may be deleted until the union below
    # has materialized (the mst_as_rooted_tree rotation lesson,
    # ADVICE r3) — generations are bounded by max_radius here
    with StateCutter(spark, "anf_exact") as cut:
        state, got = cut.observe(state, pairs=F.count(F.lit(1)))
        prev_pairs = int(got["pairs"] or 0)
        for r in range(1, max_radius + 1):
            grown = state.join(
                e, state["m"] == e["src"], "inner"
            ).select("id", F.col("dst").alias("m"))
            nxt = state.unionByName(grown).distinct()
            state, got = cut.observe(nxt, pairs=F.count(F.lit(1)))
            pairs = int(got["pairs"] or 0)
            info["rounds"] = r
            info["totals"].append(pairs)
            rows.append(
                state.groupBy("id")
                .agg(F.count(F.lit(1)).alias("nf"))
                .select("id", F.lit(r).alias("r"), "nf")
            )
            if pairs == prev_pairs:  # balls are monotone: equal size = fixpoint
                converged = True
                if stop_early:
                    break
            prev_pairs = pairs
        out = rows[0]
        for df in rows[1:]:
            out = out.unionByName(df)
        out = out.localCheckpoint(eager=True)  # pin before the cut dir drops
    info["converged"] = converged
    return out, info


def _sketch(spark, e, verts, max_radius, m, sp, info):
    # one nonzero register per vertex: bucket j(v), rank rho(v) = leading
    # run of zeros (+1) in an independent 32-bit hash — log2 on a DOUBLE
    # is exact for 32-bit integers (53-bit mantissa)
    j = F.pmod(F.xxhash64(F.col("id"), F.lit(0x5EED)), F.lit(m)).cast("int")
    h32 = F.pmod(F.xxhash64(F.col("id"), F.lit(0xB0B)), F.lit(1 << 32))
    rho = (
        F.when(h32 == 0, F.lit(33))
        .otherwise(F.lit(32) - F.floor(F.log2(h32.cast("double"))).cast("int"))
        .cast("int")
    )
    init = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda i: F.when(i == j, rho).otherwise(F.lit(0)),
    )
    state = verts.select(
        "id",
        init.alias("regs"),
        _hll_estimate(init, m).alias("est"),
        F.lit(0.0).alias("harmonic"),
    )

    converged = False
    with StateCutter(spark, "anf_hll", keep=3) as cut:
        state, got = cut.observe(
            state, regsum=F.sum(F.aggregate("regs", F.lit(0), lambda a, x: a + x))
        )
        prev_regsum = int(got["regsum"] or 0)
        for r in range(1, max_radius + 1):
            nbr = (
                e.join(state, e["dst"] == state["id"], "inner")
                .groupBy(e["src"].alias("id"))
                .agg(*[F.max(F.col("regs")[i]).alias(f"r{i}") for i in range(m)])
                .select("id", F.array(*[f"r{i}" for i in range(m)]).alias("nregs"))
            )
            merged = state.join(nbr, "id", "left").select(
                "id",
                F.when(
                    F.col("nregs").isNull(), F.col("regs")
                ).otherwise(
                    F.zip_with("regs", "nregs", lambda a, b: F.greatest(a, b))
                ).alias("regs"),
                F.col("est").alias("prev_est"),
                "harmonic",
            )
            est = _hll_estimate("regs", m)
            nxt = merged.select(
                "id",
                "regs",
                est.alias("est"),
                (
                    F.col("harmonic")
                    + F.greatest(est - F.col("prev_est"), F.lit(0.0)) / F.lit(float(r))
                ).alias("harmonic"),
            )
            state, got = cut.observe(
                nxt,
                regsum=F.sum(F.aggregate("regs", F.lit(0), lambda a, x: a + x)),
                total=F.sum("est"),
            )
            regsum = int(got["regsum"] or 0)
            info["rounds"] = r
            info["totals"].append(float(got["total"] or 0.0))
            if regsum == prev_regsum:  # registers monotone: no growth = fixpoint
                converged = True
                break
            prev_regsum = regsum
        out = state.select(
            "id", F.col("est").alias("nf_est"), F.col("harmonic").alias("harmonic_est")
        ).localCheckpoint(eager=True)
    info["converged"] = converged
    if converged and info["totals"]:
        final = info["totals"][-1]
        info["effective_diameter_90"] = next(
            (r + 1 for r, t in enumerate(info["totals"]) if t >= 0.9 * final),
            len(info["totals"]),
        )
    return out, info



def truncated_closeness(
    spark: SparkSession,
    edges: DataFrame,
    max_radius: int = 2,
    sources: DataFrame | None = None,
    directed: bool = False,
    num_partitions: int | None = None,
    with_harmonic: bool = False,
) -> tuple[DataFrame, dict[str, Any]]:
    """Exact truncated closeness centrality for selected sources.

    result: (id, n_reached, sum_dist, closeness) per source, where over
    targets v with 0 < d(id, v) <= max_radius:
        n_reached = count(v),  sum_dist = sum d(id, v),
        closeness = round(n_reached / sum_dist, 6)   (0.0 if no reach).

    ``with_harmonic=True`` appends harmonic = round(sum 1/d(id, v), 6)
    over the same truncated ball — the exact (sampled, truncated) face
    of the harmonic centrality the HLL sketch estimates in
    ``neighborhood_function(mode='sketch')``. Kept opt-in so existing
    consumers' schemas are unchanged.

    Level-synchronous multi-source BFS carrying FIRST-HIT distances:
    state (id, m, d) grows one frontier per round — each round is one
    equi-join (frontier x out-edges) plus one anti-join against the
    visited set, both key-partitioned; no driver transfer beyond the
    per-round row-count scalar riding the state cut. The ``sources``
    sample size is the scale dial (state is bounded by the truncated
    ball mass of the sampled sources, not |V|^2), the standard
    sampled-centrality shape for web graphs. ``max_radius`` bounds the
    rounds; past the true eccentricity extra rounds are no-ops, so the
    pinned-rounds output an unrolled SQL oracle needs is the default.
    """
    sp = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    if not directed:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    e = e.distinct().repartition(sp, "src").persist()
    try:
        e.count()
        verts = (
            e.select(F.col("src").alias("id"))
            .unionByName(e.select(F.col("dst").alias("id")))
            .distinct()
        )
        src_ids = (sources.select("id") if sources is not None else verts).distinct()

        info: dict[str, Any] = {"rounds": 0, "frontier_sizes": []}
        with StateCutter(spark, "trunc_closeness") as cut:
            state = src_ids.select("id", F.col("id").alias("m"), F.lit(0).alias("d"))
            state, got = cut.observe(state, n=F.count(F.lit(1)))
            prev_total = int(got["n"] or 0)
            frontier = state
            for r in range(1, max_radius + 1):
                grown = (
                    frontier.join(e, frontier["m"] == e["src"])
                    .select("id", F.col("dst").alias("m"))
                    .distinct()
                )
                new = grown.join(state.select("id", "m"), ["id", "m"], "left_anti").select(
                    "id", "m", F.lit(r).alias("d")
                )
                # one cut pins BOTH faces of the round: the union (next
                # visited set) and the frontier slice read from it
                state, got = cut.observe(state.unionByName(new), n=F.count(F.lit(1)))
                frontier = state.where(F.col("d") == r)
                total = int(got["n"] or 0)
                n_new = total - prev_total
                prev_total = total
                info["rounds"] = r
                info["frontier_sizes"].append(n_new)
                if n_new == 0:
                    break
            agg = (
                state.where(F.col("d") > 0)
                .groupBy("id")
                .agg(
                    F.count(F.lit(1)).alias("n_reached"),
                    F.sum("d").cast("long").alias("sum_dist"),
                    F.sum(F.lit(1.0) / F.col("d")).alias("_h"),
                )
            )
            cols = [
                F.col("id"),
                F.coalesce(F.col("n_reached"), F.lit(0)).cast("long").alias("n_reached"),
                F.coalesce(F.col("sum_dist"), F.lit(0)).cast("long").alias("sum_dist"),
                F.when(
                    F.coalesce(F.col("sum_dist"), F.lit(0)) > 0,
                    F.round(F.col("n_reached") / F.col("sum_dist"), 6),
                )
                .otherwise(F.lit(0.0))
                .alias("closeness"),
            ]
            if with_harmonic:
                cols.append(
                    F.round(F.coalesce(F.col("_h"), F.lit(0.0)), 6).alias("harmonic")
                )
            out = (
                src_ids.join(agg, "id", "left")
                .select(*cols)
                .localCheckpoint(eager=True)  # pin before the cut dir drops
            )
    finally:
        # unpersist on the error path too (betweenness.py shape)
        e.unpersist()
    return out, info
