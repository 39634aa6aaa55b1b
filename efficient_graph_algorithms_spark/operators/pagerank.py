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
- the per-vertex state round-trips through a durable parquet snapshot
  every iteration (user checkpoint_dir, or an ephemeral tmpfs dir).
  This is the lineage cut (the state plan references itself twice per
  step, so an uncut plan grows exponentially), the resume point, AND
  deterministic memory hygiene: superseded snapshots are deleted
  explicitly and the one-iteration cache is explicitly unpersisted, so
  nothing accumulates in executor block managers and no GC nudging is
  ever needed. On a cluster the snapshot dir is the Iceberg checkpoint
  table.
- in deterministic mode, snapshots are written in a CANONICAL physical
  layout — fixed-count hash repartition by id, rows sorted by id
  within each partition — so the bytes of iteration k are a pure
  function of the logical state, independent of how Spark happened to
  pack the previous snapshot's files into read splits (that packing
  sorts by size and tie-breaks on the random UUID in the filename: a
  genuine cross-run nondeterminism, observed as last-ulp rank drift
  before this layout existed), and the L1 delta and NEXT iteration's
  dangling mass (dm feeds the rank update, so its bits matter) are
  per-partition partial sums over the canonically-ordered cached
  state, merged on the driver in partition-id order — a fully
  canonical float summation order. Result: resume from any iteration
  reproduces the full run BIT-IDENTICALLY in local mode (allclose on
  a real cluster, where remote shuffle fetch order randomizes per-key
  merge order).

Two execution modes for the loop body:

- **deterministic** (default when a durable ``checkpoint_dir`` is
  given): two jobs per iteration — (update + canonical snapshot write)
  then (per-partition partial agg over the cached state, merged on the
  driver in partition-id order). Snapshot bytes AND the delta/dm floats
  are a pure function of the logical state, so resume from any
  iteration reproduces the full run BIT-IDENTICALLY in local mode.
- **fast** (default for ephemeral runs, selectable with
  ``deterministic=False``): ONE job per iteration — the delta/L1 and
  next-iteration dangling-mass aggregates ride the snapshot write as
  ``observe()`` metrics (CollectMetrics: per-task partials merged on
  the driver), and the in-partition sort is skipped. The rank VALUES
  are unchanged to the last ulp except through dm, whose partial-sum
  merge order follows task completion — run-to-run variation is
  ≤1 ulp/iteration (allclose ≥1e-12 observed), the same guarantee a
  multi-executor cluster gives the deterministic mode anyway (remote
  shuffle fetch order randomizes per-key merge order). Measured at
  sf0.1/local[32]: 1.35 s/iter → 0.95 s/iter (−30%); the convergence
  bar is tol=1e-6 L1, ten orders above the noise.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from efficient_graph_algorithms_spark.plans.checkpoint import CheckpointManager


def _ephemeral_state_dir() -> str:
    """Fast scratch for state snapshots when the caller didn't ask for a
    durable checkpoint dir: tmpfs when available (memory-speed IO, the
    single-box analogue of a hot object store), else the system tmp."""
    base = os.environ.get("SPARK_GRAFT_STATE_DIR")
    if base is None:
        base = "/dev/shm" if os.access("/dev/shm", os.W_OK) else tempfile.gettempdir()
    return tempfile.mkdtemp(prefix="ega_state_", dir=base)

DEFAULT_ALPHA = 0.85
DEFAULT_TOL = 1e-6
DEFAULT_MAX_ITER = 200

# scale-adaptive loop partitioning for the iterative operators (r6):
# partitions = clamp(ceil(n_vertices / LOOP_ROWS_PER_PARTITION),
#                    LOOP_MIN_PARTITIONS, session shuffle partitions).
# The session conf stays the cluster-scale knob; this rule only REDUCES
# task counts for small inputs (guide §2.2 — fewer, larger partitions).


def adaptive_partitions(sp: int, n: int, rows_per_partition: int = 125_000,
                        floor: int = 8) -> int:
    """|V|-driven loop partition count, capped by the session conf."""
    return min(sp, max(floor, -(-n // rows_per_partition)))


def _free_local_ckpt(df: DataFrame) -> None:
    """Explicitly unpersist the RDD behind an eager localCheckpoint —
    deterministic block hygiene for in-memory iterative loops (the
    block-manager analogue of deleting a superseded parquet snapshot).
    Only ever called on a state the loop has already replaced; falls
    back to ContextCleaner GC if the plan shape is not the expected
    LogicalRDD."""
    try:
        lp = df._jdf.queryExecution().analyzed()  # noqa: SLF001
        if lp.getClass().getSimpleName() == "LogicalRDD":
            lp.rdd().unpersist(False)
    except Exception:  # noqa: BLE001 — hygiene must never kill the loop
        pass


def _canonical(df: DataFrame, sp: int) -> DataFrame:
    """Fixed-count hash layout with in-partition id order: the physical
    form of a state table becomes a pure function of its logical content
    (partition count pinned so AQE byte-size estimates can't flip it)."""
    return df.repartition(sp, "id").sortWithinPartitions("id")


def _det_sums(df: DataFrame, exprs: dict[str, Any]) -> dict[str, float]:
    """Order-canonical distributed float sums: partial-sum per partition
    (rows consumed in the canonical in-partition order), merge partials
    on the driver sorted by partition id. `df` must be canonical. At
    most `sp` scalar rows hit the driver — fine at any vertex scale."""
    rows = (
        df.groupBy(F.spark_partition_id().alias("pid"))
        .agg(*[F.sum(e).alias(k) for k, e in exprs.items()])
        .collect()
    )
    out = {k: 0.0 for k in exprs}
    for r in sorted(rows, key=lambda r: r["pid"]):
        for k in exprs:
            out[k] += float(r[k] or 0.0)
    return out


def _pagerank_setup(
    spark: SparkSession,
    checkpoint_dir: str | None,
    pvec: DataFrame,
    alpha: float,
    tol: float,
    n: int,
    resume: bool,
    deterministic: bool,
    sp: int,
) -> tuple[bool, str, "CheckpointManager", int, float, DataFrame]:
    """Vertex-side setup: checkpoint manager, resume load, initial dangling
    mass. Runs concurrently with the edge-cache materialization thread in
    ``pagerank`` — the caller reaps that thread on any error raised here."""
    ephemeral = checkpoint_dir is None
    state_root = _ephemeral_state_dir() if ephemeral else checkpoint_dir
    try:
        return _pagerank_setup_inner(
            spark, state_root, ephemeral, pvec, alpha, tol, n, resume,
            checkpoint_dir, deterministic, sp,
        )
    except BaseException:
        # don't leak the freshly created tmpfs scratch dir when resume
        # load / the dm aggregate fails
        if ephemeral:
            shutil.rmtree(state_root, ignore_errors=True)
        raise


def _pagerank_setup_inner(
    spark: SparkSession,
    state_root: str,
    ephemeral: bool,
    pvec: DataFrame,
    alpha: float,
    tol: float,
    n: int,
    resume: bool,
    checkpoint_dir: str | None,
    deterministic: bool,
    sp: int,
) -> tuple[bool, str, "CheckpointManager", int, float, DataFrame]:
    ckpt = CheckpointManager(
        spark, state_root, "pagerank", {"alpha": alpha, "tol": tol, "n": n}
    )
    start_iter = 0
    dm: float | None = None
    # single fused per-vertex state: (id, p, dangling, rank) — ONE
    # vertex-side join per iteration instead of separate pvec/ranks joins
    if "r0raw" in pvec.columns:
        # warm start. Provided vertices keep their raw rank r_i; vertices
        # absent from the warm vector (new pages) fall back to p_i scaled
        # by the provided mass S — so the result is invariant to scaling
        # the warm vector (rank_i = r_i/(S(1+Pm)) or p_i/(1+Pm), where
        # Pm = Σ p over missing vertices; total is exactly 1). One scalar
        # aggregate over the persisted vertex state — this action also
        # materializes the persist, like the dm aggregate below.
        missing_p = F.when(F.col("r0raw").isNull(), F.col("p")).otherwise(F.lit(0.0))
        aggs = {"s": F.coalesce(F.col("r0raw"), F.lit(0.0)), "pm": missing_p}
        if deterministic:
            sums = _det_sums(_canonical(pvec, sp), aggs)
        else:
            row = pvec.agg(
                F.sum(aggs["s"]).alias("s"), F.sum(aggs["pm"]).alias("pm")
            ).collect()[0]
            sums = {"s": float(row["s"] or 0.0), "pm": float(row["pm"] or 0.0)}
        if sums["s"] <= 0.0:
            raise ValueError("init_ranks must carry positive total mass")
        state = pvec.select(
            "id",
            "p",
            "dangling",
            (
                F.coalesce(F.col("r0raw") / F.lit(sums["s"]), F.col("p"))
                / F.lit(1.0 + sums["pm"])
            ).alias("rank"),
        )
    else:
        state = pvec.select("id", "p", "dangling", F.col("p").alias("rank"))
    if resume and checkpoint_dir:
        latest = ckpt.latest_iteration()
        if latest is not None:
            saved = ckpt.load_iteration(latest)
            if "p" in saved.columns:  # full fused snapshot
                state = saved.select("id", "p", "dangling", "rank")
            else:  # (id, rank)-only snapshot from an older layout
                state = pvec.join(saved, "id").select("id", "p", "dangling", "rank")
            start_iter = latest
            # reuse the recorded dangling mass so the resumed run is
            # bit-identical (a fresh agg would sum in a different order)
            for row in ckpt.metrics():
                if row.get("iteration") == latest and "dangling_mass" in row:
                    dm = float(row["dangling_mass"])

    if dm is None:
        # dangling mass of the CURRENT rank vector (one-off; subsequent
        # values ride along each iteration's snapshot job). The action
        # also materializes the pvec persist — no separate count job.
        dm_expr = F.sum(
            F.when(F.col("dangling"), F.col("rank")).otherwise(F.lit(0.0))
        ).alias("dm")
        if deterministic:
            dm = _det_sums(
                _canonical(state, sp),
                {"dm": F.when(F.col("dangling"), F.col("rank")).otherwise(F.lit(0.0))},
            )["dm"]
        else:
            dm = float(state.agg(dm_expr).collect()[0]["dm"] or 0.0)
    return ephemeral, state_root, ckpt, start_iter, dm, state


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
    deterministic: bool | None = None,
    init_ranks: DataFrame | None = None,
) -> tuple[DataFrame, dict[str, Any]]:
    """Run PageRank to convergence. Returns (ranks(id, rank), info).

    edges: (src, dst) directed, deduplicated. vertices: (id) — pass it
    when isolated vertices exist beyond edge endpoints.
    personalization: (id, p) unnormalized weights; None → uniform.
    init_ranks: (id, rank) warm-start vector — e.g. the previous
    crawl's converged ranks after a snapshot delta (operators/
    snapshot.py). Vertices absent from it (new pages) start at their
    teleport weight p scaled by the provided mass, and the combined
    vector is renormalized to sum 1 — so any non-negative vector with
    positive mass is accepted and the start point is invariant to
    rescaling it (rank_i = r_i/(S(1+Pm)) provided, p_i/(1+Pm) missing,
    with S = Σ provided r and Pm = Σ p over missing vertices). The
    fixpoint is unchanged (same edges → same ranks); only the number
    of iterations to tol changes. A checkpoint resume (``resume=True``
    with an existing snapshot) takes precedence over init_ranks.

    broadcast_vertex_threshold > 0 forces a broadcast of the rank
    vector into the edge join while |V| is below it (map-side, zero
    shuffle of the edge table) — the same input-size-driven physical-
    plan switch as the reference's brute-force leaf threshold
    (``reference src/ega/algorithms/separation_gf_integrator.py:52-55``).
    Default 0: measured on this box, the co-partitioned shuffle-hash
    join beats a per-iteration broadcast rebuild at every scale tried
    (the rank-side exchange is |V|-sized, tiny next to |E|); AQE still
    auto-broadcasts when it has stats that justify it.

    deterministic: None → True iff checkpoint_dir is given. See module
    docstring for the two loop modes.
    """
    import time as _time

    t_setup0 = _time.time()
    sp = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    if deterministic is None:
        deterministic = checkpoint_dir is not None

    verts = (vertices or vertex_table(edges)).select("id")
    n = verts.count()  # pvec below is verts left-joined → same row count
    # SMALL-GRAPH REGIME (r6): |V| ≤ 2M gates all three small-input
    # policies together — AQE off (replan round-trips dominate), the
    # adaptive shuffle-partition reduction below, and the in-memory
    # localCheckpoint loop. Above the gate the loop is the r5
    # tmpfs-parquet shape at the conf partitioning: measured at 100M
    # edges/local[8], reducing to the |V|-derived 24 partitions costs
    # 20→26-72 s/iter (4M-edge tasks), and holding two 12M-row
    # deserialized states in the block manager degrades 19.5→37 s/iter
    # over five iterations (heap pressure the parquet snapshot never
    # creates) — the in-memory win is a small-state phenomenon.
    small_graph = n <= 2_000_000
    # scale-adaptive loop partitioning (small fast ephemeral runs only):
    # small vertex sets don't pay `sp` tasks per stage — same |V|-driven
    # rule as the snapshot file count (~500k rows/partition, floor 8),
    # capped by the session conf, which stays the cluster-scale knob.
    # The session shuffle-partitions conf is flipped so the
    # per-iteration groupBy(dst) exchange matches the cached
    # linked/state partitioning (co-partitioned joins, zero extra
    # exchanges); restored in finally. Same session-global
    # non-reentrancy note as the AQE flip below.
    # Measured sf0.1/local[32]: 0.45 s/iter @32 → 0.32 s/iter @8.
    _sp_key = "spark.sql.shuffle.partitions"
    _sp_prev: str | None = None
    if (
        not deterministic and checkpoint_dir is None and num_partitions is None
        and small_graph
    ):
        sp_adaptive = min(sp, max(8, -(-n // 500_000)))
        if sp_adaptive != sp:
            sp = sp_adaptive
            _sp_prev = spark.conf.get(_sp_key)
            spark.conf.set(_sp_key, str(sp))
    deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))

    # static per-vertex table: teleport prob p + dangling flag
    if personalization is not None:
        ptot = float(personalization.agg(F.sum("p")).collect()[0][0])
        base = verts.join(personalization.withColumnRenamed("p", "_praw"), "id", "left").select(
            "id", (F.coalesce(F.col("_praw"), F.lit(0.0)) / F.lit(ptot)).alias("p")
        )
    else:
        base = verts.select("id", F.lit(1.0 / n).alias("p"))
    pvec = base.join(
        deg.select(F.col("src").alias("id"), F.lit(True).alias("_has_out")), "id", "left"
    ).select("id", "p", F.col("_has_out").isNull().alias("dangling"))
    if init_ranks is not None:
        # raw warm-start column (nullable: null = vertex absent from the
        # warm vector) rides the persisted vertex state; the normalizing
        # totals are computed once in _pagerank_setup (same action that
        # materializes this persist)
        pvec = pvec.join(
            init_ranks.select("id", F.col("rank").alias("_r0")), "id", "left"
        ).select("id", "p", "dangling", F.col("_r0").alias("r0raw"))
    pvec = pvec.repartition(sp, "id").persist()

    linked = (
        edges.join(deg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("out_deg")).alias("inv_deg"))
        .repartition(sp, "src")
        # (A src-sorted cache was tried for probe locality: ~8 s/iter
        # SLOWER at local[2] on 100M edges, neutral at local[8] — the
        # per-partition rank hash map is already L2-resident, so the
        # sort buys nothing and perturbs the columnar cache layout.)
        .persist()
    )
    # materialize the edge-side cache concurrently with the vertex-side
    # setup jobs below — independent inputs, the scheduler interleaves
    # them across the executor pool (saves the smaller job's wall time)
    import threading

    _linked_err: list[BaseException] = []

    def _materialize_linked() -> None:
        try:
            linked.count()
        except BaseException as exc:  # noqa: BLE001 — re-raised on join
            _linked_err.append(exc)

    _linked_thread = threading.Thread(target=_materialize_linked, daemon=True)
    _linked_thread.start()
    try:
        _setup_state = _pagerank_setup(
            spark, checkpoint_dir, pvec, alpha, tol, n, resume, deterministic, sp
        )
    except BaseException:
        # reap the concurrent materialization job before propagating, so
        # an error in checkpoint resume / the dm aggregate doesn't leave
        # linked.count() running unsupervised on the cluster; drop BOTH
        # setup persists (the ephemeral scratch dir is cleaned inside
        # _pagerank_setup itself) and restore the flipped conf
        _linked_thread.join()
        linked.unpersist()
        pvec.unpersist()
        if _sp_prev is not None:
            spark.conf.set(_sp_key, _sp_prev)
        raise
    ephemeral, state_root, ckpt, start_iter, dm, state = _setup_state

    _linked_thread.join()
    if _linked_err:
        raise _linked_err[0]

    do_broadcast = 0 < broadcast_vertex_threshold >= n
    info: dict[str, Any] = {"n": n, "iterations": start_iter, "deltas": [],
                            "rank_join": "broadcast" if do_broadcast else "shuffle",
                            "deterministic": deterministic,
                            "warm_start": init_ranks is not None,
                            "setup_sec": round(_time.time() - t_setup0, 3),
                            "iter_secs": []}
    converged = False
    t_loop0 = _time.time()
    # AQE policy is size-driven (measured both ways): at 100M edges/
    # local[8] disabling AQE LOSES ~2-4 s/iteration (its exchange
    # coalescing on the vertex-side shuffles outweighs the serial replan
    # cost), but at ≤2M vertices the per-stage replan round-trip IS the
    # cost (~0.1 s/iter + ~1.3 s on the cold first iteration) and the
    # partitions are tiny either way. Fast mode turns it off for small
    # graphs and restores the session conf afterwards.
    # NOTE non-reentrancy: this flips a session-global conf, so another
    # query submitted on the same SparkSession while a small-graph fast-mode
    # pagerank is in flight would observe AQE off. Restore happens only
    # when we actually modified the conf (no spurious explicit-set of a
    # previously-default value).
    _aqe_key = "spark.sql.adaptive.enabled"
    _aqe_prev: str | None = None
    _aqe_modified = False
    if not deterministic and small_graph:
        _aqe_prev = spark.conf.get(_aqe_key)
        spark.conf.set(_aqe_key, "false")
        _aqe_modified = True
        info["aqe"] = "off(small-graph)"
    _prev_ckpt: DataFrame | None = None
    try:
        for it in range(start_iter + 1, max_iter + 1):
            t_it0 = _time.time()
            ranks_t = state.select("id", "rank")
            # the rank vector must be the hash-join BUILD side (broadcast
            # or shuffle-hash): then per-dst partial sums consume rows in
            # the invariant cached edge-partition order, never in the
            # snapshot's file-read order. Without the hint, tiny test
            # graphs get linked broadcast instead (BuildLeft) and the
            # rank FILE SCAN becomes the streamed side — per-dst sum
            # order then depends on which random-UUID filename sorted
            # first, i.e. nondeterministic bits across runs (observed).
            rank_side = (
                F.broadcast(ranks_t) if do_broadcast else ranks_t.hint("shuffle_hash")
            )
            contrib = (
                linked.join(rank_side, linked["src"] == rank_side["id"])
                .groupBy(linked["dst"].alias("id"))
                .agg(F.sum(F.col("rank") * F.col("inv_deg")).alias("c"))
            )
            # ephemeral fast mode: keep contrib as the shuffle-hash BUILD
            # side of the state join — both sides are co-partitioned by
            # id (contrib exits its groupBy hash-partitioned, state is a
            # partitioning-preserving localCheckpoint), so the join adds
            # ZERO exchanges; a broadcast would add a driver round-trip
            # per iteration for nothing
            contrib_side = (
                contrib.hint("shuffle_hash")
                if (not deterministic and ephemeral and small_graph)
                else contrib
            )
            new_state = state.join(contrib_side, "id", "left").select(
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
            if deterministic:
                canon = _canonical(new_state, sp).persist()
                # job 1: contrib shuffle + state update + canonical
                # snapshot write (populates the one-iteration cache as a
                # side effect); the read-back is the lineage cut
                t_w0 = _time.time()
                full_state = ckpt.write_state(
                    canon, it, compression="none" if ephemeral else None
                )
                t_write = _time.time() - t_w0
                # job 2: canonical-order partial sums over the cached
                # state — delta and dm (dm feeds the next iteration's
                # ranks, so its bits matter) are reproducible run-to-run
                # and across resume
                t_a0 = _time.time()
                sums = _det_sums(
                    canon,
                    {
                        "delta": F.abs(F.col("rank") - F.col("rank_old")),
                        "dm": F.when(F.col("dangling"), F.col("rank")).otherwise(F.lit(0.0)),
                    },
                )
                t_agg = _time.time() - t_a0
                info.setdefault("write_secs", []).append(round(t_write, 3))
                info.setdefault("agg_secs", []).append(round(t_agg, 3))
                canon.unpersist(blocking=False)  # snapshot now owns the bytes
                delta, dm = sums["delta"], sums["dm"]
            else:
                # fast mode: ONE job — the delta/dm aggregates ride the
                # iteration's materialization as CollectMetrics partials
                # (no persist, no second scan, no in-partition sort).
                import uuid as _uuid

                from pyspark.sql.observation import Observation

                # session-unique name: two pagerank loops sharing a
                # SparkSession must not cross-capture each other's
                # CollectMetrics (same rationale as StateCutter.observe)
                obs = Observation(f"pr_{_uuid.uuid4().hex[:12]}_it{it}")
                if ephemeral and small_graph:
                    # r6 in-memory loop: the state round-trips through a
                    # partitioning-preserving eager localCheckpoint
                    # instead of a tmpfs parquet snapshot. LogicalRDD
                    # keeps hash(id, sp), so with linked cached as
                    # hash(src, sp) an iteration is TWO stages — the
                    # co-partitioned rank⋈linked join (zero exchange)
                    # feeding the groupBy(dst) exchange, then the
                    # co-partitioned state⋈contrib join (zero exchange)
                    # — with no parquet encode/commit/decode and no
                    # snapshot re-read. Measured sf0.1/local[32]:
                    # 0.75 s/iter (5 stages) → ~0.2 s/iter. Superseded
                    # block sets are freed explicitly below (same
                    # deterministic-hygiene contract as the snapshot
                    # delete); delta/dm partials merge in task-completion
                    # order exactly as before (≤1 ulp/iter, documented).
                    observed = new_state.observe(
                        obs,
                        F.sum(F.abs(F.col("rank") - F.col("rank_old"))).alias("delta"),
                        F.sum(
                            F.when(F.col("dangling"), F.col("rank")).otherwise(F.lit(0.0))
                        ).alias("dm"),
                    ).select("id", "p", "dangling", "rank")
                    if it == start_iter + 1:
                        from efficient_graph_algorithms_spark.plans.explain import dump_plan

                        dump_plan(observed, "pagerank_iter")
                    t_w0 = _time.time()
                    full_state = observed.localCheckpoint(eager=True)
                    got = obs.get
                    info.setdefault("write_secs", []).append(round(_time.time() - t_w0, 3))
                    # free the superseded iteration's blocks NOW (its
                    # successor is materialized) instead of waiting on
                    # ContextCleaner GC — the block-manager analogue of
                    # delete_iteration
                    if _prev_ckpt is not None:
                        _free_local_ckpt(_prev_ckpt)
                    _prev_ckpt = full_state
                else:
                    # durable fast mode AND large ephemeral graphs:
                    # parquet snapshot per iteration (tmpfs, uncompressed
                    # + rolling delete when ephemeral — the r5 loop; see
                    # the small_graph note above for why big states do
                    # NOT ride the block manager). Snapshot file count
                    # tracks |V| (~500k rows/file, floor 8): parquet
                    # task-commit overhead is per-file (~10 ms each), so
                    # tiny states shouldn't pay for `sp` files —
                    # measured 0.30 s → 0.16 s per write at 126k
                    # vertices, sp=32.
                    sp_state = min(sp, max(8, -(-n // 500_000)))
                    observed = new_state.repartition(sp_state, "id").observe(
                        obs,
                        F.sum(F.abs(F.col("rank") - F.col("rank_old"))).alias("delta"),
                        F.sum(
                            F.when(F.col("dangling"), F.col("rank")).otherwise(F.lit(0.0))
                        ).alias("dm"),
                    )
                    t_w0 = _time.time()
                    full_state = ckpt.write_state(
                        observed, it, compression="none" if ephemeral else None
                    )
                    got = obs.get
                    info.setdefault("write_secs", []).append(round(_time.time() - t_w0, 3))
                delta, dm = float(got["delta"] or 0.0), float(got["dm"] or 0.0)
            state = full_state.select("id", "p", "dangling", "rank")
            ckpt.log_metrics(it, {"delta": delta, "dangling_mass": dm})
            if ephemeral:
                # deterministic cleanup of the superseded snapshot — no
                # block-manager accumulation, no GC dependence
                ckpt.delete_iteration(it - 1)
            info["iterations"] = it
            info["deltas"].append(delta)
            info["iter_secs"].append(round(_time.time() - t_it0, 3))
            if delta < tol:
                converged = True
                break
        info["converged"] = converged
        info["loop_sec"] = round(_time.time() - t_loop0, 3)
        # hand the caller a plan that no longer depends on the ephemeral dir
        ranks_out = state.select("id", "rank")
        if ephemeral and _prev_ckpt is None:
            # deterministic-mode ephemeral runs still read tmpfs parquet;
            # fast-mode state is already localCheckpoint-backed (and its
            # final block set is deliberately NOT freed — it IS the result)
            ranks_out = ranks_out.localCheckpoint(eager=True)
        return ranks_out, info
    finally:
        if _aqe_modified:
            spark.conf.set(_aqe_key, _aqe_prev)
        if _sp_prev is not None:
            spark.conf.set(_sp_key, _sp_prev)
        pvec.unpersist()
        linked.unpersist()
        if ephemeral:
            shutil.rmtree(state_root, ignore_errors=True)


def top_k(ranks: DataFrame, k: int = 10) -> DataFrame:
    """Ranked report (reference's ``get_ranking``,
    ``reference src/ega/algorithms/graph_kernels.py:559-585``)."""
    return ranks.orderBy(F.desc("rank"), F.asc("id")).limit(k)
