"""Gromov–Wasserstein discrepancy: proximal outer loop + entropic
inner Sinkhorn, expressed as relational (COO triple) matrix algebra.

Semantics follow the reference exactly (L2 loss, proximal method,
``reference src/ega/algorithms/gromov_wasserstein_graphs.py``:
``node_cost_st`` 169-214, ``node_cost`` 258-321,
``sinkhorn_knopp_iteration`` 108-166,
``gromov_wasserstein_discrepancy`` 324-595; exercised by
``reference scripts/experiments/test_gromov_wasserstein.py:44-60``):

    cost_st[i,j] = (C_s² p_s)[i] + (C_t² p_t)[j]          (separable!)
    repeat (outer, proximal):
        cost   = cost_st − 2 · C_s · T · C_tᵀ
        K      = exp(−cost/β) ⊙ T
        repeat (inner Sinkhorn): b = p_t/(Kᵀa); a = p_s/(Kb)
        T      = diag(a) K diag(b)
    d_gw = Σ (cost ⊙ T)

Spark realization: every matrix is a (row, col, val) table; every
product is join→groupBy-sum (map-side combined); the separable
cost_st never materializes as a matrix — it rides along as two
vertex-indexed vectors f1(i), f2(j) added at cost-assembly time.
The transport matrix is the only dense n_s×n_t object, the same
memory shape the reference carries; at web scale GW runs on graph
SUMMARIES (cluster-level cost matrices), not raw vertex sets.

The per-outer-iteration plan: 2 distributed matmuls (C_s·T, ·C_tᵀ)
+ the inner Sinkhorn's repeated matvecs against K — all shuffles are
hash-partitioned on the contraction key.
"""

from __future__ import annotations

import math
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _matmul(
    a: DataFrame, b: DataFrame, out_r: str = "r", out_c: str = "c"
) -> DataFrame:
    """COO matmul: a(r, k, v) × b(k, c, v) → (r, c, v)."""
    return (
        a.select(F.col("r").alias("_ar"), F.col("k").alias("_k"), F.col("v").alias("_av"))
        .join(
            b.select(F.col("k").alias("_k"), F.col("c").alias("_bc"), F.col("v").alias("_bv")),
            "_k",
        )
        .groupBy(F.col("_ar").alias(out_r), F.col("_bc").alias(out_c))
        .agg(F.sum(F.col("_av") * F.col("_bv")).alias("v"))
    )


def _sq_matvec(cost: DataFrame, p: DataFrame) -> DataFrame:
    """(C² p) per row: cost(i, j, c), p(j, p) → (i, f)."""
    return (
        cost.join(p.withColumnRenamed("i", "j"), "j")
        .groupBy("i")
        .agg(F.sum(F.col("c") * F.col("c") * F.col("p")).alias("f"))
    )


def gromov_wasserstein_discrepancy(
    spark: SparkSession,
    cost_s: DataFrame,
    cost_t: DataFrame,
    p_s: DataFrame,
    p_t: DataFrame,
    beta: float = 0.1,
    outer_iter: int = 20,
    inner_iter: int = 50,
    sk_bound: float = 1e-3,
    iter_bound: float = 1e-3,
    feature_cost: DataFrame | None = None,
    alpha: float = 1.0,
    trans0: DataFrame | None = None,
    update_p: bool = False,
    lr: float = 0.1,
    p_reg_weight: float = 0.0,
) -> tuple[DataFrame, float, dict[str, Any]]:
    """Returns (trans(i, j, t), d_gw, info).

    cost_s: (i, j, c) source intra-graph costs (sparse COO; missing =
    0). cost_t likewise. p_s: (i, p); p_t: (j, p) — node distributions.

    feature_cost (i, j, m) + alpha < 1 switch on the FUSED objective
    (1−α)·⟨M, T⟩ + α·GW(T) — the reference's FGW objective
    (``reference src/ega/algorithms/fused_gromov_wasserstein.py:
    677-898``), solved here with the same proximal-Sinkhorn scheme as
    pure GW rather than the reference's conditional-gradient + exact
    EMD (a sequential network-simplex; the entropic solver is the
    distributed-friendly choice for the identical objective).

    update_p switches on the reference's outer-loop source-distribution
    softmax update (``update_distribution``, ``reference src/ega/
    algorithms/gromov_wasserstein_graphs.py:72-105``, applied at
    563-572): after each outer step, θ ← θ − lr·ĝ with
    ĝ = normalize(center(p ⊙ (∇ − ⟨p, ∇⟩))), ∇ = β·log(a)
    [− p_reg_weight·(log p + 1)], then p_s ← softmax(θ). As in the
    reference, the separable cost term f1 = C_s²p_s is NOT refreshed
    (stale by design); the updated p_s feeds subsequent inner Sinkhorn
    scalings. (The reference reuses its ``alpha`` hyperparameter as
    the regularizer weight; here that knob is ``p_reg_weight`` so it
    cannot collide with the FGW mixing ``alpha``.) The final p_s is
    returned in info["p_s"] as an eagerly localCheckpointed (i, p)
    DataFrame (callers .collect() it if they need driver-side rows).
    """
    fc = (
        feature_cost.select("i", "j", F.col("m").cast("double").alias("m")).persist()
        if feature_cost is not None
        else None
    )
    ps = p_s.select("i", "p").persist()
    pt = p_t.select("j", "p").persist()
    n_s = ps.count()
    pt.count()
    cs = cost_s.select("i", "j", "c").persist()
    ct = cost_t.select("i", "j", "c").persist()
    cs.count()
    ct.count()

    # separable invariant cost: f1(i) = (C_s² p_s)(i), f2(j) = (C_t² p_t)(j)
    f1 = _sq_matvec(cs, ps.select(F.col("i"), F.col("p"))).select(
        "i", F.col("f").alias("f1v")
    ).persist()
    f2 = (
        ct.join(pt.select(F.col("j").alias("jj"), "p"), ct["j"] == F.col("jj"))
        .groupBy(ct["i"].alias("j"))
        .agg(F.sum(F.col("c") * F.col("c") * F.col("p")).alias("f2v"))
        .persist()
    )

    from efficient_graph_algorithms_spark.plans.lineage import StateCutter

    # per-outer-iteration barriers are parquet state cuts: the transport
    # re-enters the cost assembly twice per iteration, so a
    # localCheckpoint chain quadruples Catalyst's carried size estimate
    # per outer step (plans/lineage.py)
    # up to four interleaved streams per outer step (a, trans, and under
    # update_p also θ and p_s); each step reads only the previous
    # generation of each → keep=8 bounds scratch to 8 cut dirs
    cut = StateCutter(spark, "gw", keep=8)
    # T0 = p_s p_tᵀ (dense), or the caller's warm start (the
    # barycenter loop re-enters with the previous round's transport,
    # reference gromov_wasserstein_barycenter:695-705)
    if trans0 is not None:
        trans = cut(trans0.select("i", "j", "t"))
    else:
        trans = cut(ps.crossJoin(pt.select("j", F.col("p").alias("q"))).select(
            "i", "j", (F.col("p") * F.col("q")).alias("t")
        ))
    a = cut(ps.select("i", F.lit(1.0 / n_s).alias("a")))
    ps0 = ps  # original persisted handle (ps rebinds under update_p)
    theta: DataFrame | None = None
    if update_p:
        theta = cut(ps.select("i", F.lit(0.0).alias("th")))

    info: dict[str, Any] = {"outer_iterations": 0, "inner_iterations": [],
                            "rel_errors": [], "converged": False}
    trans_abs = float(trans.agg(F.sum(F.abs("t"))).collect()[0][0])
    cost_df: DataFrame | None = None
    for outer in range(1, outer_iter + 1):
        cost_df = _assemble_cost(cs, ct, trans, f1, f2, fc, alpha).localCheckpoint(eager=False)
        # K = exp(-cost/beta) * T      (proximal kernel)
        k = (
            cost_df.join(trans, ["i", "j"])
            .select("i", "j", (F.exp(-F.col("v") / F.lit(beta)) * F.col("t")).alias("kv"))
            .localCheckpoint(eager=False)
        )
        a, b, inner_used = _sinkhorn_inner(k, ps, pt, a, sk_bound, inner_iter)
        a = cut(a)  # inner-loop lineage accumulates linearly; reset per outer step
        new_trans = cut(
            k.join(a, "i")
            .join(b, "j")
            .select("i", "j", (F.col("a") * F.col("kv") * F.col("b")).alias("t"))
        )
        diff = float(
            new_trans.select("i", "j", F.col("t").alias("tn"))
            .join(trans.select("i", "j", F.col("t").alias("to")), ["i", "j"], "full")
            .select(
                F.abs(
                    F.coalesce(F.col("tn"), F.lit(0.0)) - F.coalesce(F.col("to"), F.lit(0.0))
                ).alias("d")
            )
            .agg(F.sum("d"))
            .collect()[0][0]
        )
        rel = diff / trans_abs if trans_abs > 0 else 0.0
        trans = new_trans
        trans_abs = float(trans.agg(F.sum(F.abs("t"))).collect()[0][0])
        info["outer_iterations"] = outer
        info["inner_iterations"].append(inner_used)
        info["rel_errors"].append(rel)
        if update_p:
            ps, theta = _update_p_step(ps, a, theta, beta, lr, p_reg_weight, cut)
        if rel <= iter_bound:
            info["converged"] = True
            break
    # final cost against the final transport
    cost_df = _assemble_cost(cs, ct, trans, f1, f2, fc, alpha)
    d_gw = float(
        cost_df.join(trans, ["i", "j"])
        .agg(F.sum(F.col("v") * F.col("t")))
        .collect()[0][0]
    )
    for df in (ps0, pt, cs, ct, f1, f2) + ((fc,) if fc is not None else ()):
        df.unpersist()
    trans = trans.localCheckpoint(eager=True)  # outlives the cutter dir
    if update_p:
        info["p_s"] = ps.localCheckpoint(eager=True)
    cut.close()
    return trans, d_gw, info


def _update_p_step(
    ps: DataFrame,
    a: DataFrame,
    theta: DataFrame,
    beta: float,
    lr: float,
    weight: float,
    cut: Any,
) -> tuple[DataFrame, DataFrame]:
    """One softmax gradient step on the source distribution (reference
    ``update_distribution``, gromov_wasserstein_graphs.py:72-105).
    All vectors stay distributed; 5 driver round-trips of scalar
    aggregates per step (⟨p,∇⟩; mean+count; centered L2 norm; softmax
    max; softmax Z) — each transfers O(1) rows."""
    gexpr = F.lit(beta) * F.log(F.col("a"))
    if weight > 0:
        gexpr = gexpr - F.lit(weight) * (F.log(F.col("p")) + F.lit(1.0))
    g = ps.join(a, "i").select("i", "p", gexpr.alias("gp")).persist()
    dot = float(g.agg(F.sum(F.col("p") * F.col("gp"))).collect()[0][0])
    gt = g.select("i", (F.col("p") * (F.col("gp") - F.lit(dot))).alias("gt"))
    row = gt.agg(F.sum("gt").alias("s1"), F.count("*").alias("n")).collect()[0]
    mean = float(row["s1"]) / int(row["n"])
    norm = math.sqrt(
        float(gt.agg(F.sum((F.col("gt") - F.lit(mean)) ** 2)).collect()[0][0])
    )
    theta_new = cut(
        theta.join(gt, "i").select(
            "i",
            (
                F.col("th")
                - F.lit(lr) * (F.col("gt") - F.lit(mean)) / F.lit(1e-10 + norm)
            ).alias("th"),
        )
    )
    g.unpersist()
    mx = float(theta_new.agg(F.max("th")).collect()[0][0])
    z = float(
        theta_new.agg(F.sum(F.exp(F.col("th") - F.lit(mx)))).collect()[0][0]
    )
    ps_new = cut(
        theta_new.select("i", (F.exp(F.col("th") - F.lit(mx)) / F.lit(z)).alias("p"))
    )
    return ps_new, theta_new


def _assemble_cost(
    cs: DataFrame,
    ct: DataFrame,
    trans: DataFrame,
    f1: DataFrame,
    f2: DataFrame,
    fc: DataFrame | None = None,
    alpha: float = 1.0,
) -> DataFrame:
    """cost = α·(f1(i) + f2(j) − 2·(C_s·T·C_tᵀ)(i,j)) + (1−α)·M(i,j),
    dense over the transport support (T is dense, so the output is)."""
    cst = _matmul(
        cs.select(F.col("i").alias("r"), F.col("j").alias("k"), F.col("c").alias("v")),
        trans.select(F.col("i").alias("k"), F.col("j").alias("c"), F.col("t").alias("v")),
    )  # (r=i, c=m): Σ_k C_s[i,k] T[k,m]
    g = _matmul(
        cst.select("r", F.col("c").alias("k"), "v"),
        ct.select(F.col("j").alias("k"), F.col("i").alias("c"), F.col("c").alias("v")),
    )  # (r=i, c=j): Σ_m cst[i,m] C_t[j,m]  (C_tᵀ contraction)
    dense = trans.select("i", "j")
    gw_term = (
        F.coalesce(F.col("f1v"), F.lit(0.0))
        + F.coalesce(F.col("f2v"), F.lit(0.0))
        - F.lit(2.0) * F.coalesce(F.col("v"), F.lit(0.0))
    )
    out = (
        dense.join(g.select(F.col("r").alias("i"), F.col("c").alias("j"), "v"), ["i", "j"], "left")
        .join(f1, "i", "left")
        .join(f2, "j", "left")
    )
    if fc is None:
        return out.select("i", "j", gw_term.alias("v"))
    return out.join(fc.select("i", "j", F.col("m")), ["i", "j"], "left").select(
        "i", "j",
        (
            F.lit(alpha) * gw_term
            + F.lit(1.0 - alpha) * F.coalesce(F.col("m"), F.lit(0.0))
        ).alias("v"),
    )


def _sinkhorn_inner(
    k: DataFrame,
    ps: DataFrame,
    pt: DataFrame,
    a0: DataFrame,
    error_bound: float,
    max_iter: int,
) -> tuple[DataFrame, DataFrame, int]:
    """Sinkhorn-Knopp on kernel k(i, j, kv): b = p_t/(Kᵀa), a = p_s/(Kb)
    until Σ|a_new − a|/Σ|a| < bound. Matches reference
    gromov_wasserstein_graphs.py:108-166."""
    a = a0
    b = None
    used = 0
    for it in range(1, max_iter + 1):
        kta = (
            k.join(a, "i")
            .groupBy("j")
            .agg(F.sum(F.col("kv") * F.col("a")).alias("s"))
        )
        b = pt.join(kta, "j").select("j", (F.col("p") / F.col("s")).alias("b"))
        kb = (
            k.join(b, "j")
            .groupBy("i")
            .agg(F.sum(F.col("kv") * F.col("b")).alias("s"))
        )
        # lazy checkpoint: the err agg below is the materializing action,
        # so lineage is cut without a second job per inner iteration
        a_new = ps.join(kb, "i").select("i", (F.col("p") / F.col("s")).alias("a")) \
            .localCheckpoint(eager=False)
        err = (
            a_new.join(a.select("i", F.col("a").alias("a_old")), "i", "full")
            .agg(
                F.sum(F.abs(F.coalesce(F.col("a"), F.lit(0.0)) - F.coalesce(F.col("a_old"), F.lit(0.0)))).alias("d"),
                F.sum(F.abs(F.col("a_old"))).alias("n"),
            )
            .collect()[0]
        )
        a = a_new
        used = it
        rel = float(err["d"]) / float(err["n"]) if err["n"] else 0.0
        if rel <= error_bound:
            break
    b = b.localCheckpoint(eager=False)
    return a, b, used


def gw_graph_matching(
    spark: SparkSession,
    cost_s: DataFrame,
    cost_t: DataFrame,
    p_s: DataFrame,
    p_t: DataFrame,
    **kwargs: Any,
) -> tuple[DataFrame, float]:
    """Node correspondence via GW transport + greedy assignment — the
    reference's ``node_pair_assignment`` pipeline
    (``reference src/ega/algorithms/gromov_wasserstein_graphs.py:718-802``).
    Returns (matching(src, dst, score), d_gw)."""
    from efficient_graph_algorithms_spark.operators.graph_build import greedy_matching

    trans, d_gw, _ = gromov_wasserstein_discrepancy(
        spark, cost_s, cost_t, p_s, p_t, **kwargs
    )
    scores = trans.select(F.col("i").alias("src"), F.col("j").alias("dst"), F.col("t").alias("score"))
    return greedy_matching(scores), d_gw


def gromov_wasserstein_barycenter(
    spark: SparkSession,
    costs: dict[Any, DataFrame],
    p_s: dict[Any, DataFrame],
    p_center: DataFrame,
    weights: dict[Any, float] | None = None,
    max_iter: int = 4,
    cost_bound: float = 1e-3,
    **gw_kwargs: Any,
) -> tuple[DataFrame, dict[Any, DataFrame], list[dict[Any, float]]]:
    """Multi-graph GW barycenter (reference
    ``gromov_wasserstein_graphs.py:598-715``): alternate (a) GW
    transport of every input graph onto the current barycenter
    (warm-started) and (b) the L2 cost average
    C ← Σ_k w_k·T_kᵀ C_k T_k ⊘ (p_c p_cᵀ), until the barycenter
    stabilizes. costs: {id: (i,j,c)}; p_s: {id: (i,p)};
    p_center: (j, p). Returns (barycenter(i,j,c), transports, d_gw
    per round). Every matrix op is the COO join-aggregate form."""
    ids = list(costs.keys())
    w = weights or {k: 1.0 / len(ids) for k in ids}
    pc = p_center.select("j", "p").persist()
    pc.count()
    # init: barycenter = diag(p_center); transports = p_s p_cᵀ
    bary = pc.select(
        F.col("j").alias("i"), F.col("j").alias("j"), F.col("p").alias("c")
    ).localCheckpoint(eager=True)
    transports: dict[Any, DataFrame] = {}
    for k in ids:
        transports[k] = (
            p_s[k].select("i", "p")
            .crossJoin(pc.select("j", F.col("p").alias("q")))
            .select("i", "j", (F.col("p") * F.col("q")).alias("t"))
            .localCheckpoint(eager=True)
        )
    bary_abs = float(bary.agg(F.sum(F.abs("c"))).collect()[0][0])
    # (p_c p_cᵀ) denominator, dense over center pairs
    denom = pc.select(F.col("j").alias("i"), F.col("p").alias("pi")).crossJoin(
        pc.select("j", F.col("p").alias("pj"))
    ).select("i", "j", (F.col("pi") * F.col("pj")).alias("d")).persist()
    d_gw_rounds: list[dict[Any, float]] = []
    for _ in range(max_iter):
        d_gw: dict[Any, float] = {}
        for k in ids:
            transports[k], d_gw[k], _ = gromov_wasserstein_discrepancy(
                spark, costs[k], bary, p_s[k],
                pc.select("j", "p"), trans0=transports[k], **gw_kwargs,
            )
        d_gw_rounds.append(d_gw)
        # barycenter = Σ w_k Tᵀ (C_k T) / (p_c p_cᵀ)
        acc = None
        for k in ids:
            ct_ = _matmul(
                costs[k].select(F.col("i").alias("r"), F.col("j").alias("k"), F.col("c").alias("v")),
                transports[k].select(F.col("i").alias("k"), F.col("j").alias("c"), F.col("t").alias("v")),
            )  # (r=i_src, c=j_center)
            ttct = _matmul(
                transports[k].select(F.col("j").alias("r"), F.col("i").alias("k"), F.col("t").alias("v")),
                ct_.select(F.col("r").alias("k"), F.col("c"), F.col("v")),
            )  # Tᵀ · (C T): (r=i_center, c=j_center)
            part = ttct.select("r", "c", (F.lit(w[k]) * F.col("v")).alias("v"))
            acc = part if acc is None else acc.unionByName(part)
        new_bary = (
            acc.groupBy("r", "c").agg(F.sum("v").alias("v"))
            .join(denom.select(F.col("i").alias("r"), F.col("j").alias("c"), "d"), ["r", "c"])
            .select(F.col("r").alias("i"), F.col("c").alias("j"), (F.col("v") / F.col("d")).alias("c"))
            .localCheckpoint(eager=True)
        )
        diff = float(
            new_bary.join(bary.select("i", "j", F.col("c").alias("c0")), ["i", "j"], "full")
            .agg(F.sum(F.abs(F.coalesce(F.col("c"), F.lit(0.0)) - F.coalesce(F.col("c0"), F.lit(0.0)))))
            .collect()[0][0]
        )
        rel = diff / bary_abs if bary_abs > 0 else 0.0
        bary = new_bary
        bary_abs = float(bary.agg(F.sum(F.abs("c"))).collect()[0][0])
        if rel <= cost_bound:
            break
    pc.unpersist()
    denom.unpersist()
    return bary, transports, d_gw_rounds
