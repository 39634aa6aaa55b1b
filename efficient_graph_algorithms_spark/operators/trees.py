"""Tree-based graph-field integration + distributed MST.

Semantics from the reference's tree integrators
(``reference src/ega/algorithms/trees.py:93-125`` — bottom-up/top-down
dynamic programming; ``reference src/ega/algorithms/
spanning_trees.py:98-124`` — MST construction; exercised by
``reference scripts/experiments/test_spanning_trees.py:70-76``):

    out[i] = Σ_j f(dist_T(i, j)) · field[j]     with f(x) = exp(a·x)

computed EXACTLY in two level-synchronous passes over a rooted tree:

    bottom-up    partial[v] = field[v] + Σ_{c child of v} f(w_vc)·partial[c]
    top-down     sums[root] = partial[root]
                 sums[c]    = f(w)·sums[parent] + (1 − f(2w))·partial[c]

The Spark realization is message passing by tree level: each level is
one (join → groupBy-sum) for the up pass and one join for the down
pass, so the round count equals the tree depth — the right shape for
the low-depth trees these integrators use (Bartal/FRT trees are
O(log n) deep; MSTs of web graphs are hub-shallow). Every message
exchange is hash-partitioned by vertex id; nothing is collected to the
driver.

MST: distributed Borůvka — each round every component picks its
lexicographically-minimal (w, src, dst) outgoing edge (a valid
deterministic tie-break), the selected edges merge components via the
existing hash-to-min machinery, O(log V) rounds of halving. This is
the Spark-native replacement for the reference's sequential
Kruskal + disjoint-set scan, which cannot stream 10^12 edges through
one sorted loop.
"""

from __future__ import annotations

import math
import warnings
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from efficient_graph_algorithms_spark.functions.f_fun import FFun, exp_kernel

# |V| bound for the small-tree loop regime (adaptive partitions + AQE
# off during the level walk) — same 2M gate as pagerank/cc/lpa. Module
# constant so measurement harnesses can flip the regime explicitly.
SMALL_TREE_GATE_MAX_N = 2_000_000


def tree_depths(tree: DataFrame, root: int, max_depth: int = 10000,
                cut_every: int = 8, method: str = "auto",
                depth_switch: int = 32) -> DataFrame:
    """tree(id, parent, w) rows for every non-root vertex → adds depth
    (root = 0).

    method="levels": level-synchronous propagation from the root —
    per-level work is just the frontier, the right shape for the
    shallow Bartal/FRT/hub trees. method="doubling": pointer doubling
    on the parent pointers (segment-sum of ones + a root-hit flag so
    vertices of OTHER components are dropped exactly like the
    level-sync walk drops never-reached vertices) — O(log depth)
    self-join rounds, for high-diameter trees. method="auto" runs
    level-sync and restarts with doubling if the frontier is still
    alive after ``depth_switch`` levels (the discarded prefix costs
    ``depth_switch`` cheap frontier rounds, bounded).

    The frontier join multiplies Catalyst's carried size estimate per
    level and localCheckpoint PRESERVES it (plans/lineage.py): at depth
    100 the estimate reaches ~10^1891 bytes and every stats visit runs
    huge-BigInt math on the driver. Both walkers therefore take a real
    parquet cut every ``cut_every`` rounds (stats reset to file size);
    the returned DataFrame is pinned with an eager localCheckpoint so
    the scratch dir can be removed."""
    from efficient_graph_algorithms_spark.plans.lineage import StateCutter

    if method not in ("auto", "levels", "doubling"):
        raise ValueError(f"unknown method {method!r}")
    spark = tree.sparkSession
    if method == "doubling":
        return _tree_depths_doubling(tree, root, max_depth)
    known = spark.createDataFrame([(root, 0)], "id long, depth int")
    cut = StateCutter(spark, "treedepth", keep=3)
    try:
        frontier = known
        out = known
        for d in range(1, max_depth + 1):
            frontier = (
                tree.join(frontier.select(F.col("id").alias("parent")), "parent")
                .select("id", F.lit(d).alias("depth"))
            )
            frontier = (
                cut(frontier) if d % cut_every == 0
                else frontier.localCheckpoint(eager=True)
            )
            if frontier.isEmpty():
                break
            if method == "auto" and d >= depth_switch:
                # deep tree: restart with the O(log depth) walker (the
                # abandoned prefix cost d bounded frontier rounds)
                return _tree_depths_doubling(tree, root, max_depth)
            out = out.unionByName(frontier)
            if d % 16 == 0:
                out = cut(out)
        return (
            tree.join(out, "id")
            .select("id", "parent", "w", "depth")
            .localCheckpoint(eager=True)
        )
    finally:
        cut.close()


def _tree_depths_doubling(tree: DataFrame, root: int,
                          max_depth: int = 10000) -> DataFrame:
    """O(log depth) depths by pointer doubling on parent pointers.

    State (id, ptr, acc, hit) with segment invariant: acc = Σ over the
    path segment [v, ptr) of h(u) (h = 1 for non-root, 0 for the root
    → inclusive root-path sum = depth), hit = whether the segment
    contains ``root``. Jump: acc' = acc + acc[ptr], hit' = hit ∨
    hit[ptr], ptr' = ptr[ptr] (NULL-absorbing: pointers past a path's
    end stay NULL, including paths of OTHER forest components, whose
    final hit stays false — they are filtered out, matching the
    level-sync walker never reaching them; same for cycle members,
    which the round cap abandons with hit false)."""
    from efficient_graph_algorithms_spark.plans.lineage import StateCutter

    spark = tree.sparkSession
    sp = int(spark.conf.get("spark.sql.shuffle.partitions"))
    r_max = max(1, math.ceil(math.log2(max_depth + 1)) + 1)
    state = tree.select(
        "id", F.col("parent").alias("ptr"),
        F.lit(1).cast("long").alias("acc"),
        (F.col("id") == F.lit(int(root))).alias("hit"),
    ).unionByName(
        spark.createDataFrame([(int(root),)], "id long").select(
            "id", F.lit(None).cast("long").alias("ptr"),
            F.lit(0).cast("long").alias("acc"), F.lit(True).alias("hit"),
        )
    )
    cut = StateCutter(spark, "treedepth_dbl", keep=3)
    try:
        for r in range(1, r_max + 1):
            t = state.select(
                F.col("id").alias("_tid"), F.col("ptr").alias("_ptr2"),
                F.col("acc").alias("_acc2"), F.col("hit").alias("_hit2"),
            )
            nxt = state.join(t, state["ptr"] == t["_tid"], "left").select(
                "id",
                F.col("_ptr2").alias("ptr"),
                (F.col("acc") + F.coalesce(F.col("_acc2"), F.lit(0))).alias("acc"),
                (F.col("hit") | F.coalesce(F.col("_hit2"), F.lit(False))).alias("hit"),
            )
            # parquet cut EVERY round (only O(log depth) rounds total):
            # the outer self-join's size estimate squares per round and
            # localCheckpoint PRESERVES it (plans/lineage.py) — measured
            # 6.98E+2477 bytes carried out of a depth-100 walk when only
            # every 4th round cut; per-round cuts pin it at file size
            state = cut(nxt.coalesce(sp))
            if state.where(F.col("ptr").isNotNull()).isEmpty():
                break
        out = state.where("hit").select("id", F.col("acc").cast("int").alias("depth"))
        return (
            tree.join(out, "id")
            .select("id", "parent", "w", "depth")
            .localCheckpoint(eager=True)
        )
    finally:
        cut.close()


def tree_gfi_matvec(
    tree_with_depth: DataFrame,
    field: DataFrame,
    a: float = -1.0,
    f_fun: FFun | None = None,
    root: int | None = None,
    cut_every: int = 16,
    method: str = "auto",
    depth_switch: int = 24,
) -> DataFrame:
    """Exact Σ_j f(dist_T(i,j))·field[j] for every vertex i.

    tree_with_depth: (id, parent, w, depth) for every non-root vertex
    (from ``tree_depths``). field: (id, value) covering ALL vertices
    including the root. f_fun defaults to exp(a·x) — the kernel family
    under which the 2-pass DP is exact (reference trees.py:93-125).
    Returns (id, value).

    method:
      "levels"   — level-synchronous 2-pass DP, O(depth) rounds. The
                   right shape for the O(log n)-deep Bartal/FRT trees
                   and hub-shallow web MSTs these integrators target.
      "doubling" — pointer-doubling reformulation, O(log depth) rounds
                   (see ``_tree_gfi_matvec_doubling``): high-diameter
                   trees (path-like MST components) stop paying one
                   shuffle round per level. Exp kernel only.
      "auto"     — "doubling" when the default exp kernel is in use and
                   max_depth > depth_switch and the exp magnitudes stay
                   inside double range; "levels" otherwise. A custom
                   ``f_fun`` always takes "levels": the doubling algebra
                   needs f evaluated at root-path distances, which e.g.
                   ``exp_literal``'s finite-support kernels can't do.

    cut_every: parquet-cut cadence in levels. Intermediate levels take
    a coalesce + eager localCheckpoint (real plan cut — each level
    references the previous TWICE, so an uncut chain duplicates the
    logical subtree exponentially; the coalesce caps the down-pass
    union's partition growth that the parquet write used to absorb);
    every ``cut_every``-th level does the real parquet round-trip,
    resetting the carried stats estimate (which multiplies per
    localCheckpoint level, plans/lineage.py) to the true file size.
    Measured at depth 16 / 126k vertices, local[32] warm: per-level
    cuts 17-21 s → cut_every=8: 12-15 s → cut_every=16 (r6): 7.0-8.2 s
    (interleaved ×4, 16 wins every pair; median 7.55 vs 8.44). The lax
    cadence is safe HERE because this walker's per-level stats growth
    is LINEAR in digits — measured ~6 digits/level over 16 uncut levels
    (126k-vertex heap tree, barrier cost flat at ~0.3 s): both passes
    interpose an Aggregate (up) / a union (down) between the two state
    references, unlike the SELF-join loops (tree_depths, doubling,
    CC pointer-jump) whose digit count DOUBLES per uncut round — those
    keep their tight cadences.
    """
    from efficient_graph_algorithms_spark.plans.lineage import StateCutter

    if method not in ("auto", "levels", "doubling"):
        raise ValueError(f"unknown method {method!r}")
    # ONE max-depth job serves dispatch, the doubling path (passed down)
    # and the level path alike
    max_depth = tree_with_depth.agg(F.max("depth")).collect()[0][0]
    if max_depth is not None and (
        method == "doubling"
        or (method == "auto" and f_fun is None and max_depth > depth_switch)
    ):
        if f_fun is not None:
            raise ValueError("method='doubling' supports only the exp kernel")
        # cap the doubling cadence at 4: self-join rounds SQUARE the
        # carried size estimate (vs the level walker's constant-factor
        # growth), so the level-path cadence default (8) is too lax here
        return _tree_gfi_matvec_doubling(
            tree_with_depth, field, a=a, root=root,
            cut_every=min(cut_every, 4), max_depth=max_depth,
        )

    if max_depth is None:  # single-vertex tree
        return field.select("id", "value")
    f = f_fun or exp_kernel(a)
    # static per-edge kernel values, computed once
    edges = tree_with_depth.select(
        "id", "parent", "depth",
        f(F.col("w")).alias("fw"),
        (F.lit(1.0) - f(F.lit(2.0) * F.col("w"))).alias("one_minus_f2w"),
    ).persist()

    spark = tree_with_depth.sparkSession
    sp = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # SMALL-TREE REGIME (r6, same gate as pagerank/cc/lpa): the 2·depth
    # eager barriers are pure per-action overhead at small |V|, so for
    # n ≤ 2M the loop runs at the |V|-derived partition count (guide
    # §2.2 fewer/larger partitions — every per-level exchange and
    # barrier materialization drops from `sp` tasks to ~8) with AQE off
    # (each eager action would otherwise pay replan round-trips that
    # dominate sub-second stages). The session conf stays the
    # cluster-scale knob — the rule only REDUCES task counts; large
    # trees are untouched. Session-global flip, restored in `finally`
    # (same single-tenant non-reentrancy note as pagerank's AQE flip).
    n = field.count()
    small_tree = n <= SMALL_TREE_GATE_MAX_N
    _sp_key = "spark.sql.shuffle.partitions"
    _aqe_key = "spark.sql.adaptive.enabled"
    _sp_prev: str | None = None
    _aqe_prev: str | None = None
    if small_tree:
        sp_adaptive = min(sp, max(8, -(-n // 500_000)))
        if sp_adaptive != sp:
            sp = sp_adaptive
            _sp_prev = spark.conf.get(_sp_key)
            spark.conf.set(_sp_key, str(sp))
        _aqe_prev = spark.conf.get(_aqe_key)
        spark.conf.set(_aqe_key, "false")
    cut = StateCutter(spark, "treegfi", keep=2)
    # ---- bottom-up: partial[v] = field[v] + Σ_children f(w)·partial[c]
    partial = field.select("id", F.col("value").alias("partial"))

    def _barrier(df: DataFrame, cutter, steps_done: int, last: bool) -> DataFrame:
        # intermediate levels: eager localCheckpoint — a real plan cut
        # (each level references the previous TWICE, so an uncut chain
        # duplicates the logical subtree 2^k× and Catalyst planning
        # dominates) — preceded by a coalesce: the down-pass union grows
        # partition count per level and localCheckpoint materializes
        # whatever it is handed (the parquet cut used to cap it as a
        # side effect; observed 63k tasks at depth 13 without a cap).
        # Every cut_every-th level does the real parquet round-trip,
        # resetting the multiplied stats estimate to the true file size.
        if last or (steps_done % cut_every == 0):
            return cutter(df)
        return df.coalesce(sp).localCheckpoint(eager=True)

    try:
        steps = 0
        for lvl in range(max_depth, 0, -1):
            msgs = (
                edges.where(F.col("depth") == lvl)
                .join(partial, "id")
                .groupBy(F.col("parent").alias("id"))
                .agg(F.sum(F.col("fw") * F.col("partial")).alias("up"))
            )
            steps += 1
            nxt_partial = partial.join(msgs, "id", "left").select(
                "id",
                (F.col("partial") + F.coalesce(F.col("up"), F.lit(0.0))).alias("partial"),
            )
            if steps == 1:
                from efficient_graph_algorithms_spark.plans.explain import dump_plan

                dump_plan(nxt_partial, "tree_gfi_level")
            partial = _barrier(nxt_partial, cut, steps, last=(lvl == 1))
        # the final up-pass state is always a parquet cut (last=True) in a
        # separate cutter generation stream, so the down-pass reads stay
        # valid for the whole function
        partial.count()

        # ---- top-down: sums[c] = f(w)·sums[parent] + (1-f(2w))·partial[c]
        if root is None:
            root_row = (
                field.select("id")
                .join(tree_with_depth.select("id"), "id", "left_anti")
                .collect()
            )
            root = root_row[0]["id"]
        down = StateCutter(tree_with_depth.sparkSession, "treegfi_down", keep=2)
        sums = partial.where(F.col("id") == root).select("id", F.col("partial").alias("value"))
        steps = 0
        for lvl in range(1, max_depth + 1):
            child = (
                edges.where(F.col("depth") == lvl)
                .join(sums.select(F.col("id").alias("parent"), F.col("value").alias("ps")), "parent")
                .join(partial, "id")
                .select(
                    "id",
                    (F.col("fw") * F.col("ps") + F.col("one_minus_f2w") * F.col("partial")).alias("value"),
                )
            )
            # batched barrier (see up-pass): sums appears in child AND in the
            # union, so both the partition count (when the edge side
            # broadcasts, the join inherits the streamed union's partitioning
            # — observed 63k tasks at depth 13 on a 30-path) and the carried
            # size estimate double per uncut level (plans/lineage.py)
            steps += 1
            sums = _barrier(sums.unionByName(child), down, steps, last=(lvl == max_depth))
        sums = sums.localCheckpoint(eager=True)  # outlives the cutters
        edges.unpersist()
        partial.unpersist()
        cut.close()
        down.close()
        return sums
    finally:
        if _sp_prev is not None:
            spark.conf.set(_sp_key, _sp_prev)
        if _aqe_prev is not None:
            spark.conf.set(_aqe_key, _aqe_prev)


def _tree_gfi_matvec_doubling(
    tree_with_depth: DataFrame,
    field: DataFrame,
    a: float = -1.0,
    root: int | None = None,
    cut_every: int = 4,
    max_depth: int | None = None,
) -> DataFrame:
    """O(log depth) tree-GFI matvec by pointer doubling (exp kernel).

    exp's multiplicativity f(x+y) = f(x)·f(y) collapses both DP passes
    of ``tree_gfi_matvec`` into closed forms over the weighted root-path
    distance D(v):

        up[v]  = Σ_{j ∈ subtree(v)} e^{a(D(j)-D(v))}·field[j]
               = e^{-a·Dc(v)} · SubtreeSum( e^{a·Dc(j)}·field[j] )
        out[v] = e^{a·Dc(v)} · AncestorSum( t(u)·e^{-a·Dc(u)} )
          with t(root) = up[root], t(u) = (1 − e^{2a·w_u})·up[u]

    (Dc = D − midrange(D): any constant shift cancels between the
    e^{+aDc}/e^{-aDc} pair, so centering halves the exponent magnitude
    — the numeric envelope is |a|·range(D)/2 ≤ 600; outside it the
    function falls back to the level-sync DP, whose incremental
    products underflow gracefully instead.)

    D, SubtreeSum, and AncestorSum are each ⌈log₂(depth+1)⌉ rounds of
    pointer doubling — per-round one self-join on the jump pointer
    (ancestor/D: acc'[v] = acc[v] + acc[ptr[v]], ptr'[v] = ptr[ptr[v]],
    segment-sum invariant) plus, for SubtreeSum, one groupBy delivering
    B_k into the 2^k-th ancestor (B_{k+1}[v] = B_k[v] +
    Σ_{u: ptr_k(u)=v} B_k[u] — the delivered subtrees tile the
    [2^k, 2^{k+1}) depth band exactly). ~3·log₂(depth) shuffle rounds
    total instead of 2·depth: a depth-100 path-tree component pays ~21
    barriers, not 200. All state flows through StateCutter barriers
    (self-joins double carried stats per round, plans/lineage.py).
    Same exact semantics (reference trees.py:93-125) — parity-tested
    against the level-sync path and the NumPy oracle.
    """
    from efficient_graph_algorithms_spark.plans.lineage import StateCutter

    spark = tree_with_depth.sparkSession
    sp = int(spark.conf.get("spark.sql.shuffle.partitions"))

    if max_depth is None:  # not passed down by the dispatcher
        max_depth = tree_with_depth.agg(F.max("depth")).collect()[0][0]
    if max_depth is None:  # single-vertex tree
        return field.select("id", "value")
    n_rounds = max(1, math.ceil(math.log2(max_depth + 1)))

    if root is None:
        root = (
            field.select("id")
            .join(tree_with_depth.select("id"), "id", "left_anti")
            .collect()
        )[0]["id"]

    tree = tree_with_depth.select("id", "parent", "w").persist()

    def _barrier(df: DataFrame, cutter, step: int, last: bool) -> DataFrame:
        if last or (step % cut_every == 0):
            return cutter(df)
        return df.coalesce(sp).localCheckpoint(eager=True)

    def _ancestor_sum(h: DataFrame, cutter) -> DataFrame:
        """h(id, h) over ALL vertices → (id, acc): inclusive root-path
        sums. Invariant: acc[v] = Σ h over the segment [v, ptr(v));
        ptr NULL ⇒ segment reaches the root (v finished)."""
        state = (
            tree.select("id", F.col("parent").alias("ptr"))
            .unionByName(
                spark.createDataFrame([(int(root),)], "id long").select(
                    "id", F.lit(None).cast("long").alias("ptr")
                )
            )
            .join(h, "id")
            .select("id", "ptr", F.col("h").alias("acc"))
        )
        for r in range(1, n_rounds + 1):
            t = state.select(
                F.col("id").alias("_tid"),
                F.col("ptr").alias("_ptr2"),
                F.col("acc").alias("_acc2"),
            )
            state = _barrier(
                state.join(t, state["ptr"] == t["_tid"], "left").select(
                    "id",
                    F.col("_ptr2").alias("ptr"),
                    (F.col("acc") + F.coalesce(F.col("_acc2"), F.lit(0.0))).alias("acc"),
                ),
                cutter, r, last=(r == n_rounds),
            )
        return state.select("id", "acc")

    cut = StateCutter(spark, "treegfi_dbl", keep=3)
    try:
        # ---- phase 1: D(v) = weighted root-path distance ------------------
        h_w = tree.select("id", F.col("w").alias("h")).unionByName(
            spark.createDataFrame([(int(root), 0.0)], "id long, h double")
        )
        dvec = _ancestor_sum(h_w, cut).withColumnRenamed("acc", "D")
        rng = dvec.agg(F.min("D").alias("mn"), F.max("D").alias("mx")).collect()[0]
        mid = (float(rng["mn"]) + float(rng["mx"])) / 2.0
        if abs(a) * (float(rng["mx"]) - float(rng["mn"])) / 2.0 > 600.0:
            warnings.warn(
                "tree_gfi doubling: |a|*range(D)/2 > 600 exceeds the double "
                "exp envelope; falling back to the level-sync DP",
                RuntimeWarning, stacklevel=3,
            )
            tree.unpersist()
            return tree_gfi_matvec(
                tree_with_depth, field, a=a, root=root, method="levels"
            )
        # eager localCheckpoint, NOT a cut: dvec outlives keep= rotation
        # (later phases keep cutting; a cut-backed dvec would lose its
        # files while still being read — the mst_as_rooted_tree lesson)
        dvec = dvec.select(
            "id", (F.col("D") - F.lit(mid)).alias("dc")
        ).localCheckpoint(eager=True)

        # ---- phase 2: up[v] via subtree sums of g = e^{a·Dc}·field --------
        g = (
            field.join(dvec, "id")
            .select("id", (F.exp(F.lit(a) * F.col("dc")) * F.col("value")).alias("b"))
        )
        state = (
            tree.select("id", F.col("parent").alias("ptr"))
            .unionByName(
                spark.createDataFrame([(int(root),)], "id long").select(
                    "id", F.lit(None).cast("long").alias("ptr")
                )
            )
            .join(g, "id")
        )
        for r in range(1, n_rounds + 1):
            deliv = (
                state.where(F.col("ptr").isNotNull())
                .groupBy(F.col("ptr").alias("id"))
                .agg(F.sum("b").alias("_d"))
            )
            t = state.select(F.col("id").alias("_tid"), F.col("ptr").alias("_ptr2"))
            state = _barrier(
                state.join(t, state["ptr"] == t["_tid"], "left")
                .join(deliv, "id", "left")
                .select(
                    "id",
                    F.col("_ptr2").alias("ptr"),
                    (F.col("b") + F.coalesce(F.col("_d"), F.lit(0.0))).alias("b"),
                ),
                cut, r, last=(r == n_rounds),
            )
        up = (
            state.join(dvec, "id")
            .select("id", (F.col("b") * F.exp(F.lit(-a) * F.col("dc"))).alias("up"))
        ).localCheckpoint(eager=True)  # outlives keep= rotation (see dvec)

        # ---- phase 3: out[v] = e^{a·Dc(v)} · AncestorSum(t(u)·e^{-a·Dc}) --
        t_u = (
            tree.select("id", (F.lit(1.0) - F.exp(F.lit(2.0 * a) * F.col("w"))).alias("tf"))
            .unionByName(spark.createDataFrame([(int(root), 1.0)], "id long, tf double"))
        )
        h_t = (
            up.join(t_u, "id")
            .join(dvec, "id")
            .select(
                "id",
                (F.col("tf") * F.col("up") * F.exp(F.lit(-a) * F.col("dc"))).alias("h"),
            )
        )
        anc = _ancestor_sum(h_t, cut)
        out = (
            anc.join(dvec, "id")
            .select("id", (F.exp(F.lit(a) * F.col("dc")) * F.col("acc")).alias("value"))
        )
        out = out.localCheckpoint(eager=True)  # outlives the cutter
        return out
    finally:
        tree.unpersist()
        cut.close()


def boruvka_mst(
    spark: SparkSession,
    edges: DataFrame,
    max_rounds: int = 40,
) -> tuple[DataFrame, dict[str, Any]]:
    """Distributed Borůvka MST (forest when disconnected).

    edges: (src, dst, w) undirected input (either or both directions).
    Returns (mst_edges(src, dst, w) with src<dst, info). Deterministic:
    min outgoing edge per component by (w, src, dst); consistent
    lexicographic tie-breaking yields a valid (and unique-per-rule) MST
    even with duplicate weights — same result as the reference's sorted
    Kruskal scan with the same tie-break (spanning_trees.py:98-124).
    """
    from efficient_graph_algorithms_spark.plans.lineage import StateCutter

    und = (
        edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            F.col("w").cast("double").alias("w"),
        )
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.min("w").alias("w"))
        .persist()
    )
    cut = StateCutter(spark, "boruvka")
    labels = cut(
        und.select(F.col("src").alias("id"))
        .unionByName(und.select(F.col("dst").alias("id")))
        .distinct()
        .select("id", F.col("id").alias("comp"))
    )
    mst = None
    info: dict[str, Any] = {"rounds": 0, "converged": False}
    try:
        for rnd in range(1, max_rounds + 1):
            la = labels.select(F.col("id").alias("src"), F.col("comp").alias("ca"))
            lb = labels.select(F.col("id").alias("dst"), F.col("comp").alias("cb"))
            cross = (
                und.join(la, "src")
                .join(lb, "dst")
                .where(F.col("ca") != F.col("cb"))
                .select("src", "dst", "w", "ca", "cb")
                .localCheckpoint(eager=True)  # bounded: labels file-backed
            )
            if cross.isEmpty():
                info["converged"] = True
                break
            # min outgoing edge per component (both endpoints' components vote)
            votes = cross.select(F.col("ca").alias("comp"), "w", "src", "dst").unionByName(
                cross.select(F.col("cb").alias("comp"), "w", "src", "dst")
            )
            picked = (
                votes.groupBy("comp")
                .agg(F.min(F.struct("w", "src", "dst")).alias("m"))
                .select(F.col("m.src").alias("src"), F.col("m.dst").alias("dst"), F.col("m.w").alias("w"))
                .distinct()
                .localCheckpoint(eager=True)
            )
            # accumulated forest: parquet cut per round — the union chain
            # re-references each round's picked edges
            mst = picked if mst is None else cut(mst.unionByName(picked).distinct())
            # contract: merge components connected by the picked edges via
            # hash-to-min + pointer jumping on the (small) component graph
            pe = picked.join(la, "src").join(lb, "dst").select("ca", "cb")
            comp_labels = _component_fixpoint(pe)
            labels = cut(
                labels.join(comp_labels, labels["comp"] == comp_labels["c_id"], "left")
                .select("id", F.coalesce(F.col("c_new"), F.col("comp")).alias("comp"))
            )
            info["rounds"] = rnd
        if mst is None:
            mst = und.limit(0)
        return mst.localCheckpoint(eager=True), info
    finally:
        und.unpersist()
        cut.close()


def _component_fixpoint(
    pairs: DataFrame, max_iter: int = 40, cut: "StateCutter | None" = None
) -> DataFrame:
    """Hash-to-min + pointer jumping over pairs(ca, cb) → (c_id, c_new)
    mapping every touched component id to its merged representative.

    The per-iteration barrier is a parquet state cut, NOT localCheckpoint:
    the jump is a self-join, whose carried size estimate doubles per
    iteration through a localCheckpoint (see plans/lineage.py)."""
    from efficient_graph_algorithms_spark.plans.lineage import StateCutter

    own = cut is None
    cut = cut or StateCutter(pairs.sparkSession, "fixpoint")
    sym = cut(
        pairs.select(F.col("ca").alias("a"), F.col("cb").alias("b")).unionByName(
            pairs.select(F.col("cb").alias("a"), F.col("ca").alias("b"))
        ).distinct()
    )
    lab = sym.select(F.col("a").alias("c_id")).distinct().select(
        "c_id", F.col("c_id").alias("c_new")
    )
    try:
        for _ in range(max_iter):
            nbr_min = (
                sym.join(lab, sym["a"] == lab["c_id"])
                .groupBy(sym["b"].alias("c_id"))
                .agg(F.min("c_new").alias("nbr"))
            )
            stepped = (
                lab.join(nbr_min, "c_id", "left")
                .select(
                    "c_id",
                    F.least(F.col("c_new"), F.coalesce(F.col("nbr"), F.col("c_new"))).alias("c_new"),
                    F.col("c_new").alias("old"),
                )
                .localCheckpoint(eager=True)  # bounded: lab is file-backed
            )
            jumped = cut(
                stepped.alias("s")
                .join(
                    stepped.select(F.col("c_id").alias("p_id"), F.col("c_new").alias("p_new")).alias("p"),
                    F.col("s.c_new") == F.col("p.p_id"),
                    "left",
                )
                .select(
                    F.col("s.c_id").alias("c_id"),
                    F.coalesce(F.col("p.p_new"), F.col("s.c_new")).alias("c_new"),
                    F.col("s.old").alias("old"),
                )
            )
            changed = jumped.where(F.col("c_new") != F.col("old")).isEmpty()
            lab = jumped.select("c_id", "c_new")
            if changed:
                break
        # the caller consumes lab lazily after the cutter dir is gone —
        # pin the final mapping in block-manager memory
        return lab.localCheckpoint(eager=True)
    finally:
        if own:
            cut.close()


def mst_as_rooted_tree(spark: SparkSession, mst: DataFrame, root: int,
                       cut_every: int = 8) -> DataFrame:
    """Orient an MST (forest component containing root) into parent
    pointers away from the root: (id, parent, w, depth). Frontier and
    accumulators take real parquet cuts on a cadence — see tree_depths
    for why localCheckpoint alone melts at depth ≫ 16.

    Scale note: orientation is inherently O(depth) level-synchronous
    rounds (parent pointers don't exist yet, so the pointer-doubling
    trick the depth/matvec walkers use has nothing to jump on), but
    each round touches only the BFS frontier — the per-level cost is
    proportional to the frontier, not |V|. The formerly O(depth)·|V|
    stages downstream (tree_depths, tree_gfi_matvec) switch to
    O(log depth) doubling automatically past depth 24."""
    from efficient_graph_algorithms_spark.plans.lineage import StateCutter

    sym = mst.select("src", "dst", "w").unionByName(
        mst.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    )
    known = spark.createDataFrame([(root, 0)], "id long, depth int")
    cut = StateCutter(spark, "mstroot", keep=4)
    try:
        frontier = known
        rows = None
        depth = 0
        while True:
            depth += 1
            nxt = (
                sym.join(frontier.select(F.col("id").alias("src")), "src")
                .select(F.col("dst").alias("id"), F.col("src").alias("parent"), "w",
                        F.lit(depth).alias("depth"))
            )
            if rows is not None:
                nxt = nxt.join(rows.select("id"), "id", "left_anti")
            nxt = nxt.join(known.select("id"), "id", "left_anti")
            nxt = cut(nxt) if depth % cut_every == 0 else nxt.localCheckpoint(eager=True)
            if nxt.isEmpty():
                break
            # eager: the accumulator must not depend on block-manager
            # retention of earlier lazy checkpoints — keep= rotation below
            # deletes the parquet cuts those generations truncate to, so a
            # lazy chain would be unrecomputable after an executor loss
            rows = (
                nxt if rows is None
                else rows.unionByName(nxt).coalesce(16).localCheckpoint(eager=True)
            )
            frontier = nxt
            known = known.unionByName(nxt.select("id", "depth"))
            if depth % 16 == 0:
                rows = cut(rows)
                known = cut(known)
        if rows is None:
            return spark.createDataFrame([], "id long, parent long, w double, depth int")
        return rows.localCheckpoint(eager=True)
    finally:
        cut.close()


# ---------------------------------------------------------------------------
# FRT low-stretch hierarchical trees (Fakcharoenphol-Rao-Talwar)
# ---------------------------------------------------------------------------

FRT_CAND_T = "array<struct<pri:bigint,dist:double,cid:bigint>>"


def _frt_pri_expr(seed: int, col: str) -> Column:
    """Portable center priority: md5-60bit of 'frt{seed}:{id}' — the
    random permutation π (only the order matters), computable
    identically in Spark SQL, DuckDB SQL, and Python."""
    from efficient_graph_algorithms_spark.functions.hashing import spark_md5_60bit_sql

    return F.expr(spark_md5_60bit_sql(f"concat('frt{seed}:', CAST({col} AS STRING))"))


def frt_beta(seed: int) -> float:
    """Deterministic β ∈ [0.5, 1) (reference: np.random.uniform(0.5, 1),
    frt_trees.py:68)."""
    from efficient_graph_algorithms_spark.functions.hashing import md5_60bit

    return 0.5 + 0.5 * (md5_60bit(f"frtbeta{seed}") % (1 << 30)) / float(1 << 30)


def _pareto_frontier(spark, cands_sorted: Column) -> Column:
    """Scan a (pri asc, dist asc)-sorted candidate array keeping entries
    strictly closer than every smaller-priority entry — the per-vertex
    Pareto frontier of (π-priority, distance). A center can be some
    level's assignment iff no other center is both earlier in π and at
    least as close, so the frontier is exactly the set of possible
    assignments across ALL radii (one propagation serves every level)."""
    empty = F.expr(f"CAST(array() AS {FRT_CAND_T})")
    acc0 = F.struct(empty.alias("arr"), F.lit(float("inf")).alias("best"))
    return F.aggregate(
        cands_sorted,
        acc0,
        lambda acc, x: F.when(
            x["dist"] < acc["best"],
            F.struct(F.concat(acc["arr"], F.array(x)).alias("arr"), x["dist"].alias("best")),
        ).otherwise(acc),
        lambda acc: acc["arr"],
    )


def frt_tree(
    spark: SparkSession,
    edges: DataFrame,
    seed: int = 42,
    max_hops: int = 100,
) -> tuple[DataFrame, dict[str, Any]]:
    """Sample one FRT tree of a connected weighted graph (w > 0).

    Semantics mirror the reference's ``FRTTreeGFIntegrator._frt_tree``
    (``reference src/ega/algorithms/frt_trees.py:47-115``): levels
    i = δ..0 with radius R_i = β·2^i·w_min; every vertex belongs, at
    level i, to the FIRST center in π order whose R_i-ball contains it;
    clusters = vertices sharing the center path; each ≥2-vertex cluster
    becomes an internal tree node joined to its parent cluster with
    weight w_min·2^i; a vertex attaches itself at the first level its
    cluster is singleton. π and β are seeded hashes, so the sample is
    deterministic and portable (same tree in the NumPy mirror and in a
    SQL oracle).

    Spark realization (the Blelloch-style parallel FRT): one
    level-synchronous relaxation computes each vertex's Pareto frontier
    of (π, dist) candidates under the top radius; every level's
    assignment is then a pure column lookup into that frontier —
    O(hop-diameter) rounds total, NOT per level. Internal node ids are
    negative hashes of the center path (vertex ids must be ≥ 0).

    Returns ((id, parent, w, depth) for every non-root node, info) with
    info = {root, delta, beta, w_min, hops}.
    """
    from efficient_graph_algorithms_spark.functions.hashing import (
        md5_60bit,
        spark_md5_60bit_sql,
    )
    from efficient_graph_algorithms_spark.plans.lineage import StateCutter

    sym = (
        edges.select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
            F.col("w").cast("double").alias("w"),
        )
        .unionByName(
            edges.select(
                F.col("dst").cast("long").alias("src"),
                F.col("src").cast("long").alias("dst"),
                F.col("w").cast("double").alias("w"),
            )
        )
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.min("w").alias("w"))
        .persist()
    )
    wmin = float(sym.agg(F.min("w")).collect()[0][0])
    if wmin <= 0:
        raise ValueError("FRT requires strictly positive edge weights")
    verts = (
        sym.select(F.col("src").alias("id")).distinct().persist()
    )

    # phases A/B/C each stream ONE state through the cutter and phase C
    # reads only the final phase-B generation → keep=2 bounds scratch
    cut = StateCutter(spark, "frt", keep=2)
    try:
        # --- phase A: eccentricity bound from the min-id vertex (min-plus
        # relaxation to fixpoint) — sets the level count δ
        v0 = int(verts.agg(F.min("id")).collect()[0][0])
        d = cut(verts.select("id", F.when(F.col("id") == v0, 0.0).alias("d")))
        hops = 0
        fixpoint = False
        for _ in range(max_hops):
            hops += 1
            relaxed = (
                sym.join(d.where(F.col("d").isNotNull()).withColumnRenamed("id", "src"), "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.min(F.col("d") + F.col("w")).alias("nd"))
            )
            nd = cut(
                d.join(relaxed, "id", "left").select(
                    "id", F.least(F.coalesce("d", "nd"), F.coalesce("nd", "d")).alias("d")
                )
            )
            if nd.join(d.withColumnRenamed("d", "d0"), "id").where(
                ~F.col("d").eqNullSafe(F.col("d0"))
            ).isEmpty():
                d = nd
                fixpoint = True
                break
            d = nd
        if not fixpoint:
            # fail loudly like the disconnection check below: exiting with
            # distances still relaxing would under-estimate ecc → delta →
            # r_max and silently truncate the decomposition
            raise ValueError(
                f"frt_tree eccentricity relaxation did not reach fixpoint "
                f"within max_hops={max_hops} (graph hop-diameter exceeds it; "
                f"raise max_hops)"
            )
        if not d.where(F.col("d").isNull()).isEmpty():
            raise ValueError("frt_tree requires a connected graph")
        ecc = float(d.agg(F.max("d")).collect()[0][0])
        beta = frt_beta(seed)
        delta = max(0, math.ceil(math.log2(max(2.0 * ecc, wmin) / wmin)))
        r_max = beta * (2.0**delta) * wmin

        # --- phase B: Pareto-frontier relaxation under R_max
        pri = _frt_pri_expr(seed, "id")
        state = cut(
            verts.select(
                "id",
                F.array(
                    F.struct(pri.alias("pri"), F.lit(0.0).alias("dist"), F.col("id").alias("cid"))
                ).cast(FRT_CAND_T).alias("cands"),
            )
        )
        fixpoint = False
        for _ in range(max_hops):
            flat = state.select("id", F.explode("cands").alias("c")).select(
                "id", F.col("c.pri").alias("pri"), F.col("c.dist").alias("dist"), F.col("c.cid").alias("cid")
            )
            msgs = (
                sym.join(flat.withColumnRenamed("id", "src"), "src")
                .select(
                    F.col("dst").alias("id"), "pri", (F.col("dist") + F.col("w")).alias("dist"), "cid"
                )
                .where(F.col("dist") <= F.lit(r_max))
            )
            merged = (
                flat.unionByName(msgs)
                .groupBy("id", "pri", "cid")
                .agg(F.min("dist").alias("dist"))
                .groupBy("id")
                .agg(F.array_sort(F.collect_list(F.struct("pri", "dist", "cid"))).alias("srt"))
                .select("id", _pareto_frontier(spark, F.col("srt")).alias("cands"))
            )
            new_state = cut(merged)
            changed = (
                new_state.join(state.withColumnRenamed("cands", "cands0"), "id")
                .where(~F.col("cands").eqNullSafe(F.col("cands0")))
                .isEmpty()
            )
            state = new_state
            if changed:
                fixpoint = True
                break
        if not fixpoint:
            # an incomplete Pareto frontier leaves vertices without a
            # candidate inside some level radius — phase C would then
            # emit null cluster ids; fail loudly instead (same posture
            # as the phase-A checks above)
            raise ValueError(
                f"frt_tree frontier relaxation did not reach fixpoint "
                f"within max_hops={max_hops}; raise max_hops"
            )

        # --- phase C: per-level assignment + cluster-path tree assembly
        levels = list(range(delta, -1, -1))

        def _center_at(radius: float) -> Column:
            # NOTE: the lambda must take exactly ONE parameter — a second
            # parameter makes pyspark pass the ELEMENT INDEX into it
            return F.filter(F.col("cands"), lambda x: x["dist"] <= F.lit(radius))[0]["cid"]

        asg = state.select(
            "id",
            *[_center_at(beta * (2.0**i) * wmin).alias(f"c{i}") for i in levels],
        )
        path_cols = []
        for i in levels:
            parts = [F.col(f"c{j}").cast("string") for j in range(delta, i - 1, -1)]
            path_cols.append(F.concat_ws("/", *parts).alias(f"p{i}"))
        asg = asg.select("id", *path_cols).persist()
        asg.count()

        # melt to (id, level, path, parent_path); parent at level δ = ROOT
        melted = None
        for i in levels:
            parent = F.col(f"p{i + 1}") if i < delta else F.lit("ROOT")
            part = asg.select(
                "id", F.lit(i).alias("level"), F.col(f"p{i}").alias("path"), parent.alias("ppath")
            )
            melted = part if melted is None else melted.unionByName(part)
        sizes = melted.groupBy("level", "path").agg(
            F.count("*").alias("n_members"), F.min("ppath").alias("ppath")
        ).persist()

        def node_id(path_col):
            return -F.expr(
                spark_md5_60bit_sql(f"concat('frtnode{seed}:', {path_col})")
            ) - F.lit(1)

        root_id = -md5_60bit(f"frtroot{seed}") - 1
        parent_node = F.when(F.col("ppath") == "ROOT", F.lit(root_id)).otherwise(
            node_id("ppath")
        )
        internal = sizes.where(F.col("n_members") >= 2).select(
            node_id("path").alias("id"),
            parent_node.alias("parent"),
            (F.lit(wmin) * F.pow(F.lit(2.0), F.col("level"))).alias("w"),
            (F.lit(delta) - F.col("level") + F.lit(1)).cast("int").alias("depth"),
        )
        # leaves: each vertex attaches at its FIRST (highest) singleton level
        single = (
            melted.join(sizes.select("level", "path", "n_members"), ["level", "path"])
            .where(F.col("n_members") == 1)
            .groupBy("id")
            .agg(F.max("level").alias("slevel"))
        )
        leaves = (
            melted.join(single, "id")
            .where(F.col("level") == F.col("slevel"))
            .select(
                "id",
                F.when(F.col("ppath") == "ROOT", F.lit(root_id))
                .otherwise(node_id("ppath"))
                .alias("parent"),
                (F.lit(wmin) * F.pow(F.lit(2.0), F.col("level"))).alias("w"),
                (F.lit(delta) - F.col("level") + F.lit(1)).cast("int").alias("depth"),
            )
        )
        tree = internal.unionByName(leaves).localCheckpoint(eager=True)
        sizes.unpersist()
        asg.unpersist()
        info = {"root": root_id, "delta": delta, "beta": beta, "w_min": wmin, "hops": hops}
        return tree, info
    finally:
        sym.unpersist()
        verts.unpersist()
        cut.close()


def bartal_tree(
    spark: SparkSession,
    edges: DataFrame,
    seed: int = 42,
    max_hops: int = 100,
    max_levels: int = 64,
) -> tuple[DataFrame, dict[str, Any]]:
    """Sample one Bartal tree of a connected weighted graph (w > 0) —
    the reference's recursive low-diameter randomized decomposition
    (``reference src/ega/algorithms/bartal_trees.py:15-122``):

        bartal(C, D): if |C| = 1 → leaf; else split C into clusters of
        scale D/2 (each center carves a shortest-path ball of radius
        R ~ Geom(p)·w_min, p = min(1, 4·log2(n)/((D/2)/w_min))), recurse
        at D/2, then join the sub-tree ROOTS to the first sub-tree's
        root with edge weight D. Tree nodes are original vertices (no
        Steiner nodes); expected distortion O(log² n).

    Two documented divergences from the reference's sequential sampler,
    both forced by distribution and both deterministic/seeded:

    1. **Parallel LDD** (Miller–Peng–Xu-style) instead of sequential
       carving: every vertex of an active cluster draws a seeded-hash
       priority π and geometric radius R; a vertex joins the FIRST
       center in π order whose R-ball (shortest paths in the cluster's
       induced subgraph) covers it. The reference carves balls from the
       not-yet-sampled residual in random order — an inherently
       sequential chain; the π-order parallel rule is the standard
       distributed substitution with the same cluster-scale guarantees.
       Every vertex covers itself (dist 0 < R), so the decomposition is
       total. "First sub-tree" = the min-π center's cluster.
    2. **Diameter upper bound** 2·ecc(min-id vertex) + 1e-6 instead of
       the reference's exact dense-APSP diameter (trees.py:46) — APSP
       does not distribute; halving from a ≤2× overestimate costs at
       most one extra level.

    All randomness is the portable seeded md5 hash, so the sample is
    reproduced exactly by the NumPy mirror (oracle.bartal_tree).

    Returns ((id, parent, w, depth) for every non-root vertex, info)
    with info = {root, diam, w_min, levels}.
    """
    from efficient_graph_algorithms_spark.functions.hashing import (
        spark_md5_60bit_sql,
    )
    from efficient_graph_algorithms_spark.plans.lineage import StateCutter

    sym = (
        edges.select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
            F.col("w").cast("double").alias("w"),
        )
        .unionByName(
            edges.select(
                F.col("dst").cast("long").alias("src"),
                F.col("src").cast("long").alias("dst"),
                F.col("w").cast("double").alias("w"),
            )
        )
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.min("w").alias("w"))
        .persist()
    )
    wmin = float(sym.agg(F.min("w")).collect()[0][0])
    if wmin <= 0:
        raise ValueError("bartal_tree requires strictly positive edge weights")
    verts = sym.select(F.col("src").alias("id")).distinct().persist()
    n = verts.count()

    cut = StateCutter(spark, "bartal")
    try:
        # --- eccentricity bound from the min-id vertex (as frt_tree) ---
        v0 = int(verts.agg(F.min("id")).collect()[0][0])
        d = cut(verts.select("id", F.when(F.col("id") == v0, 0.0).alias("d")))
        for _ in range(max_hops):
            relaxed = (
                sym.join(d.where(F.col("d").isNotNull()).withColumnRenamed("id", "src"), "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.min(F.col("d") + F.col("w")).alias("nd"))
            )
            nd = cut(
                d.join(relaxed, "id", "left").select(
                    "id", F.least(F.coalesce("d", "nd"), F.coalesce("nd", "d")).alias("d")
                )
            )
            done = nd.join(d.withColumnRenamed("d", "d0"), "id").where(
                ~F.col("d").eqNullSafe(F.col("d0"))
            ).isEmpty()
            d = nd
            if done:
                break
        if not d.where(F.col("d").isNull()).isEmpty():
            raise ValueError("bartal_tree requires a connected graph")
        ecc = float(d.agg(F.max("d")).collect()[0][0])
        diam = 2.0 * ecc + 1e-6

        if n == 1:
            root = v0
            empty = spark.createDataFrame([], "id long, parent long, w double, depth int")
            return empty, {"root": root, "diam": diam, "w_min": wmin, "levels": 0}

        # --- top-down level loop: decompose active (≥2-vertex) clusters
        state = cut(verts.select("id", F.lit("R").alias("ck")))  # cluster key
        cluster_rows: DataFrame | None = None  # (level, pk, ck, center, pi)
        singleton_roots: DataFrame | None = None  # (ck, root)
        cur_diam = diam
        level = 0
        ldd_converged = True
        while level < max_levels:
            sizes = state.groupBy("ck").agg(F.count("*").alias("m"))
            active_keys = sizes.where(F.col("m") >= 2).select("ck")
            if active_keys.isEmpty():
                break
            act = state.join(active_keys, "ck").persist()
            ldd_diam = cur_diam / 2.0
            p = min(1.0, (4.0 * math.log2(n)) / (ldd_diam / wmin))
            # π stays BIGINT: 60-bit hashes above 2^53 would collide as
            # doubles, and the NumPy mirror compares exact ints
            pri = F.expr(
                spark_md5_60bit_sql(f"concat('bartal{seed}:l{level}:', CAST(id AS STRING))")
            )
            if p >= 1.0:
                r_expr = F.lit(wmin)
            else:
                u = (
                    F.expr(
                        spark_md5_60bit_sql(
                            f"concat('bartalr{seed}:l{level}:', CAST(id AS STRING))"
                        )
                    )
                    % F.lit(1 << 20)
                    + F.lit(1)
                ) / F.lit(float(1 << 20))
                r_expr = (
                    F.floor(F.log(u) / F.lit(math.log(1.0 - p))) + F.lit(1)
                ).cast("double") * F.lit(wmin)
            # candidates: (id, ck, center, pi, r, dist) — every vertex is
            # a center for its own ball; propagate while dist < r
            cand = cut(
                act.select(
                    "id", "ck", F.col("id").alias("center"),
                    pri.alias("pi"), r_expr.alias("r"), F.lit(0.0).alias("dist"),
                )
            )
            member = act.select(F.col("id").alias("dst"), "ck")
            for _hop in range(max_hops):
                msgs = (
                    sym.join(cand.withColumnRenamed("id", "src"), "src")
                    .select(
                        F.col("dst"), "ck", "center", "pi", "r",
                        (F.col("dist") + F.col("w")).alias("dist"),
                    )
                    .where(F.col("dist") < F.col("r"))
                    .join(member, ["dst", "ck"])  # stay inside the cluster
                    .withColumnRenamed("dst", "id")
                )
                merged = (
                    cand.unionByName(msgs)
                    .groupBy("id", "ck", "center", "pi", "r")
                    .agg(F.min("dist").alias("dist"))
                )
                new_cand = cut(merged)
                # fixpoint ⇔ no new candidate row and no dist decreased
                # (min over a fixed set is order-independent → exact)
                done = (
                    new_cand.join(
                        cand.select("id", "ck", "center", F.col("dist").alias("d0")),
                        ["id", "ck", "center"],
                        "left",
                    )
                    .where(F.col("d0").isNull() | (F.col("dist") < F.col("d0")))
                    .isEmpty()
                )
                cand = new_cand
                if done:
                    break
            else:
                # loud, like the eccentricity phase's disconnection check:
                # the ball-growing relaxation exhausted max_hops before the
                # fixpoint (possible on long weighted paths with large
                # geometric radii) — the decomposition would silently
                # diverge from the exact-Dijkstra NumPy mirror
                ldd_converged = False
            # winner = min-π covering center; child key = pk + '/' + center
            win = (
                cand.groupBy("id", "ck")
                .agg(F.min(F.struct("pi", "center")).alias("w"))
                .select(
                    "id", "ck",
                    F.col("w.center").alias("center"), F.col("w.pi").alias("pi"),
                )
            )
            newrows = win.select(
                F.lit(level).alias("level"),
                F.col("ck").alias("pk"),
                F.concat(F.col("ck"), F.lit("/"), F.col("center").cast("string")).alias("ck2"),
                "center", "pi", "id",
            ).persist()
            clusters = newrows.select(
                "level", "pk", F.col("ck2").alias("ck"), "center", "pi"
            ).distinct()
            cluster_rows = (
                clusters if cluster_rows is None
                else cluster_rows.unionByName(clusters)
            )
            cluster_rows = cut(cluster_rows)
            # new singleton clusters bottom out as leaves
            counts = newrows.groupBy("ck2").agg(F.count("*").alias("m"))
            singles = (
                newrows.join(counts.where(F.col("m") == 1), "ck2")
                .select(F.col("ck2").alias("ck"), F.col("id").alias("root"))
            )
            singleton_roots = (
                singles if singleton_roots is None
                else singleton_roots.unionByName(singles)
            )
            singleton_roots = cut(singleton_roots)
            state = cut(
                newrows.join(counts.where(F.col("m") >= 2), "ck2")
                .select("id", F.col("ck2").alias("ck"))
            )
            newrows.unpersist()
            act.unpersist()
            cur_diam = ldd_diam
            level += 1

        # --- bottom-up: cluster roots + merge edges -------------------
        roots = singleton_roots  # (ck, root)
        tree_edges: DataFrame | None = None
        for lvl in range(level - 1, -1, -1):
            ch = cluster_rows.where(F.col("level") == lvl)  # pk → children
            chr_ = ch.join(roots, "ck")
            first = chr_.groupBy("pk").agg(
                F.min(F.struct("pi", "root")).alias("f")
            ).select("pk", F.col("f.pi").alias("fpi"), F.col("f.root").alias("proot"))
            w_lvl = diam / (2.0 ** lvl)
            edges_lvl = (
                chr_.join(first, "pk")
                .where(F.col("pi") != F.col("fpi"))
                .select(
                    F.col("root").alias("id"),
                    F.col("proot").alias("parent"),
                    F.lit(w_lvl).alias("w"),
                )
            )
            tree_edges = (
                edges_lvl if tree_edges is None
                else tree_edges.unionByName(edges_lvl)
            )
            tree_edges = cut(tree_edges)
            roots = cut(
                roots.unionByName(first.select(F.col("pk").alias("ck"), F.col("proot").alias("root")))
            )
        root = int(roots.where(F.col("ck") == "R").collect()[0]["root"])
        tree = tree_depths(tree_edges, root).localCheckpoint(eager=True)
        info = {"root": root, "diam": diam, "w_min": wmin, "levels": level,
                "ldd_converged": ldd_converged}
        if not ldd_converged:
            warnings.warn(
                "bartal_tree: ball-growing fixpoint not reached within "
                f"max_hops={max_hops}; decomposition may diverge from exact "
                "ball semantics (raise max_hops)",
                RuntimeWarning,
                stacklevel=2,
            )
        return tree, info
    finally:
        sym.unpersist()
        verts.unpersist()
        cut.close()


def bartal_gfi_integrate(
    spark: SparkSession,
    edges: DataFrame,
    field: DataFrame,
    a: float = -1.0,
    num_trees: int = 2,
    seed: int = 42,
) -> DataFrame:
    """Bartal-tree graph-field integrator: average of exact exp-kernel
    tree matvecs over ``num_trees`` sampled Bartal trees (reference
    ``bartal_trees.py:15-45`` via ``trees.py integrate_graph_field`` —
    tree nodes are original vertices, so no field padding is needed)."""
    acc = None
    for t in range(num_trees):
        tree, info = bartal_tree(spark, edges, seed=seed + 1000 * t)
        full_field = (
            tree.select("id")
            .unionByName(spark.createDataFrame([(info["root"],)], "id long"))
            .join(field, "id", "left")
            .select("id", F.coalesce("value", F.lit(0.0)).alias("value"))
        )
        out = tree_gfi_matvec(tree, full_field, a=a, root=info["root"])
        acc = out if acc is None else (
            acc.withColumnRenamed("value", "v0")
            .join(out, "id")
            .select("id", (F.col("v0") + F.col("value")).alias("value"))
            .localCheckpoint(eager=True)
        )
    return acc.select("id", (F.col("value") / F.lit(float(num_trees))).alias("value"))


def frt_gfi_integrate(
    spark: SparkSession,
    edges: DataFrame,
    field: DataFrame,
    a: float = -1.0,
    num_trees: int = 2,
    seed: int = 42,
) -> DataFrame:
    """FRT-tree graph-field integrator: average of exact exp-kernel tree
    matvecs over ``num_trees`` sampled FRT trees (reference
    ``frt_trees.py:40-45`` ``integrate_graph_field`` — internal cluster
    nodes carry zero field and are dropped from the output)."""
    acc = None
    for t in range(num_trees):
        tree, info = frt_tree(spark, edges, seed=seed + 1000 * t)
        full_field = (
            tree.select("id")
            .unionByName(spark.createDataFrame([(info["root"],)], "id long"))
            .join(field, "id", "left")
            .select("id", F.coalesce("value", F.lit(0.0)).alias("value"))
        )
        out = tree_gfi_matvec(tree, full_field, a=a, root=info["root"]).where(
            F.col("id") >= 0
        )
        acc = out if acc is None else (
            acc.withColumnRenamed("value", "v0")
            .join(out, "id")
            .select("id", (F.col("v0") + F.col("value")).alias("value"))
            .localCheckpoint(eager=True)
        )
    return acc.select("id", (F.col("value") / F.lit(float(num_trees))).alias("value"))
