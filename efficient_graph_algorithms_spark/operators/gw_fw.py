"""Frank-Wolfe (conditional-gradient) face of Gromov-Wasserstein with
an exact-EMD LP step — the reference's second GW solver, alongside the
proximal-Sinkhorn face in ``operators/gw.py``.

Semantics follow the reference exactly (square loss, closed-form
line search): ``reference src/ega/algorithms/optimization.py:245-416``
(``cg``, with the ``emd`` LP at ``:358`` and the armijo=False
closed-form quadratic line search at ``:170-185``), driving
``reference src/ega/algorithms/fused_gromov_wasserstein.py:362-676``
(``gw_lp``) and ``:677-974`` (``fgw_lp``, which passes
M=(1-alpha)*feature_cost, reg=alpha), with the Peyre-Cuturi-Solomon
factorization helpers ``init_matrix``/``tensor_product``/``gwloss``/
``gwggrad`` (``:32-360``).

Per FW iteration:

    tens  = constC - hC1 . G . hC2^T        (gradient assembly)
    Mi    = M + reg*2*tens;  Mi += min(Mi)
    Gc    = argmin_T <T, Mi>  s.t. marginals   (exact transportation LP)
    dG    = Gc - G
    alpha = argmin_[0,1] of the exact quadratic cost along G + a*dG
    G    += alpha * dG

Spark realization: the structure matrices C_s / C_t stay DISTRIBUTED
(i, j, c) COO tables — the two double matmuls per iteration
(C_s . G . C_t^T for the gradient, C_s . dG . C_t for the line search)
are join->groupBy-sum jobs against them, so the big graph objects never
leave the cluster. The coupling G and the LP run DRIVER-SIDE by the
operator family's contract (couplings are graph summaries, the same
dense n_s x n_t shape the reference's NumPy carries); ``emd.py`` holds
the POT-free transportation simplex. constC never materializes as a
matrix — the square-loss separability keeps it as two vectors
f1c(i) = (C_s^2 p)(i), f2c(j) = (C_t^2 q)(j).

Deviation noted for the record: the reference re-evaluates
f_val = cost(G + alpha*dG) by a full tensor assembly after the line
search; for the square loss the cost is exactly the quadratic
a*alpha^2 + b*alpha + c along the segment (the closed-form branch's own
premise, "need sym matrices"), so this implementation evaluates that
polynomial instead and saves a third matmul per iteration — an
algebraic identity, not an approximation; the NumPy mirror in
oracle/numpy_oracle.py re-derives the reference formulas independently
and the pytest parity is exact at fixed iteration counts.
"""

from __future__ import annotations

from typing import Any

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from efficient_graph_algorithms_spark.operators.emd import emd


def _collect_vec(df: DataFrame, key: str, val: str, ids: dict) -> np.ndarray:
    out = np.zeros(len(ids))
    for r in df.collect():
        out[ids[r[key]]] = float(r[val])
    return out


def _double_matmul(
    cs: DataFrame, g_df: DataFrame, ct: DataFrame
) -> DataFrame:
    """(C_s . G . C_t^T)(i, j) for COO cs(i,k,c), g(k,l,t), ct(j,l,c):
    two shuffle joins, contraction keys hash-partitioned."""
    cg = (
        cs.select(F.col("i").alias("_i"), F.col("j").alias("_k"), F.col("c").alias("_c"))
        .join(g_df.select(F.col("i").alias("_k"), F.col("j").alias("_l"), "t"), "_k")
        .groupBy("_i", "_l")
        .agg(F.sum(F.col("_c") * F.col("t")).alias("v"))
    )
    return (
        cg.join(
            ct.select(F.col("i").alias("_j"), F.col("j").alias("_l"), F.col("c").alias("_c2")),
            "_l",
        )
        .groupBy(F.col("_i").alias("i"), F.col("_j").alias("j"))
        .agg(F.sum(F.col("v") * F.col("_c2")).alias("v"))
    )


def gw_lp_transport(
    spark: SparkSession,
    cost_s: DataFrame,
    cost_t: DataFrame,
    p_s: DataFrame,
    p_t: DataFrame,
    reg: float = 1.0,
    feature_cost: DataFrame | None = None,
    feature_weight: float = 0.0,
    max_iter: int = 20,
    stop_thr: float = 1e-9,
    stop_thr2: float = 1e-9,
    trans0: DataFrame | None = None,
) -> tuple[DataFrame, float, dict[str, Any]]:
    """GW / FGW transport via conditional gradient + exact EMD.

    cost_s: (i, j, c) source structure (sparse COO, symmetric by the
    closed-form line search's contract); cost_t likewise; p_s: (i, p);
    p_t: (j, p). For the FUSED objective pass feature_cost (i, j, m)
    and feature_weight w > 0: the objective becomes
    w*<M, T> + reg*GW(T) — callers mirroring the reference's fgw_lp
    pass feature_weight=(1-alpha), reg=alpha
    (``fused_gromov_wasserstein.py:927-934``).

    Returns (trans(i, j, t), d_gw, info) where d_gw is the pure GW loss
    of the final coupling (``gwloss``, the reference's log["gw_dist"])
    and info carries loss/delta traces and the iteration count.
    """
    cs = cost_s.select("i", "j", F.col("c").cast("double").alias("c")).persist()
    ct = cost_t.select("i", "j", F.col("c").cast("double").alias("c")).persist()
    src_rows = sorted(r["i"] for r in p_s.select("i").distinct().collect())
    tgt_rows = sorted(r["j"] for r in p_t.select("j").distinct().collect())
    sid = {x: k for k, x in enumerate(src_rows)}
    tid = {x: k for k, x in enumerate(tgt_rows)}
    ns, nt = len(sid), len(tid)
    p = _collect_vec(p_s.select("i", "p"), "i", "p", sid)
    q = _collect_vec(p_t.select("j", "p"), "j", "p", tid)

    # constC, separable: f1c(i) = (C_s^2 p)(i), f2c(j) = (C_t^2 q)(j)
    f1c = _collect_vec(
        cs.join(p_s.select(F.col("i").alias("j"), "p"), "j")
        .groupBy("i").agg(F.sum(F.col("c") * F.col("c") * F.col("p")).alias("f")),
        "i", "f", sid,
    )
    f2c = _collect_vec(
        ct.join(p_t.select("j", "p"), "j")
        .groupBy(F.col("i").alias("jj")).agg(F.sum(F.col("c") * F.col("c") * F.col("p")).alias("f")),
        "jj", "f", tid,
    )
    const_c = f1c[:, None] + f2c[None, :]

    m_feat = np.zeros((ns, nt))
    if feature_cost is not None and feature_weight != 0.0:
        for r in feature_cost.select("i", "j", "m").collect():
            m_feat[sid[r["i"]], tid[r["j"]]] = feature_weight * float(r["m"])

    if trans0 is None:
        g = np.outer(p, q)
    else:  # warm start, e.g. the barycenter loop re-entering (i, j, t)
        g = np.zeros((ns, nt))
        for r in trans0.select("i", "j", "t").collect():
            g[sid[r["i"]], tid[r["j"]]] = float(r["t"])

    def _ship(mat: np.ndarray) -> DataFrame:
        rows = [
            (src_rows[i], tgt_rows[j], float(mat[i, j]))
            for i, j in zip(*np.nonzero(mat))
        ]
        return spark.createDataFrame(rows, "i long, j long, t double")

    def _gather(df: DataFrame) -> np.ndarray:
        out = np.zeros((ns, nt))
        for r in df.collect():
            out[sid[r["i"]], tid[r["j"]]] = float(r["v"])
        return out

    def _csc_gc(mat: np.ndarray) -> np.ndarray:
        """(C_s . mat . C_t^T) through the distributed structure tables."""
        return _gather(_double_matmul(cs, _ship(mat), ct))

    # square loss: tens(G) = constC - C_s G (2 C_t)^T; gwloss = <tens, G>
    cgc = _csc_gc(g)
    tens = const_c - 2.0 * cgc
    f_val = float((m_feat * g).sum() + reg * (tens * g).sum())
    info: dict[str, Any] = {"loss": [f_val], "delta_fval": [], "iterations": 0}
    for it in range(1, max_iter + 1):
        old_fval = f_val
        mi = m_feat + reg * 2.0 * tens  # gradient of the full objective
        mi = mi + mi.min()  # reference's positivity shift (optimization.py:356)
        # Determinism snap (shared with the NumPy mirror): distributed
        # summation order perturbs the assembled gradient at ~1e-16,
        # and the LP argmin is DISCONTINUOUS — on degenerate instances
        # (e.g. a constant mi row, where every feasible plan is
        # optimal) an ulp decides which optimal vertex the simplex
        # returns, amplifying rounding noise into O(1) coupling
        # changes. Snapping the LP input to a 1e-9 grid collapses that
        # noise so exact-arithmetic ties STAY ties and the simplex's
        # deterministic pivot rule is the tie-break on every plan
        # shape; a 1e-9 cost perturbation only reorders near-optimal
        # vertices, which FW is robust to by construction.
        mi = np.round(mi, 9)
        gc, _, _, _ = emd(p, q, mi)
        dg = gc - g
        # closed-form quadratic line search (optimization.py:176-185):
        # dot = C_s dG C_t (one distributed double matmul); C_s G C_t is
        # the cgc already assembled for the gradient
        dot = _csc_gc(dg)
        # a/b snapped to a 1e-12 grid for the same reason: the a > 0
        # branch and the step size must not flip on summation-order ulp
        a = round(-2.0 * reg * float((dot * dg).sum()), 12)
        b = round(
            float(((m_feat + reg * const_c) * dg).sum())
            - 2.0 * reg * (float((dot * g).sum()) + float((cgc * dg).sum())),
            12,
        )
        if a > 0:
            alpha = min(1.0, max(0.0, -b / (2.0 * a)))
        else:
            alpha = 1.0 if f_val > a + f_val + b else 0.0  # corner rule
        g = g + alpha * dg
        # exact quadratic value at alpha (== reference's full re-eval)
        f_val = a * alpha * alpha + b * alpha + f_val
        info["iterations"] = it
        info["loss"].append(f_val)
        info["delta_fval"].append(f_val - old_fval)
        # re-assemble the gradient at the new G for the next iteration /
        # the final gw_dist (the reference recomputes it on entry too)
        cgc = _csc_gc(g)
        tens = const_c - 2.0 * cgc
        abs_delta = abs(f_val - old_fval)
        if abs_delta / max(abs(f_val), 1e-300) < stop_thr or abs_delta < stop_thr2:
            break
    d_gw = float((tens * g).sum())  # gwloss of the final coupling
    cs.unpersist()
    ct.unpersist()
    trans = spark.createDataFrame(
        [
            (src_rows[i], tgt_rows[j], float(g[i, j]))
            for i in range(ns)
            for j in range(nt)
        ],
        "i long, j long, t double",
    )
    return trans, d_gw, info


def fgw_barycenter(
    spark: SparkSession,
    feats: dict[Any, DataFrame],
    costs: dict[Any, DataFrame],
    ps: dict[Any, DataFrame],
    p_center: DataFrame,
    lambdas: dict[Any, float] | None = None,
    alpha: float = 0.5,
    init_c: DataFrame | None = None,
    init_x: DataFrame | None = None,
    max_iter: int = 5,
    tol: float = 1e-9,
    fw_iter: int = 10,
) -> tuple[DataFrame, DataFrame, dict[Any, DataFrame], dict[str, Any]]:
    """FGW barycenter with the FEATURE update — the face of the
    reference's ``fgw_barycenters`` that ``operators/gw.py``'s
    structure-only barycenter lacks (``reference src/ega/algorithms/
    fused_gromov_wasserstein.py:1233-1481``, square loss, sqeuclidean
    feature metric, explicit inits; feature BCD step
    ``update_feature_matrix`` :1082-1115, metric refresh ``update_Ms``
    :1072-1080, structure step ``update_square_loss`` :984-1017,
    couplings via the conditional-gradient solver above).

    feats[k]: (i, d, y) node-feature COO (d = feature dimension index;
    every graph must use the same dimension set — dims are read from
    the first graph, and a foreign d elsewhere fails loudly on the
    feature-update KeyError rather than being silently dropped);
    costs[k]: (i, j, c) structure; ps[k]: (i, p); p_center: (j, p) with
    j = 0..N-1 the barycenter nodes. init_c: (i, j, c) over center
    pairs; init_x: (j, d, x). Both inits are REQUIRED (the reference
    falls back to np.random; explicit inits keep the operator
    deterministic — the caller owns the seeding policy).

    Orientation note: the reference carries T as (N, n_s)
    barycenter->source and solves fgw_lp with the barycenter as C1;
    this implementation carries the transpose (n_s, N) with the input
    graph as the source, matching the engine's proximal barycenter
    convention — the identical updates under exact arithmetic (LP
    tie-breaks on degenerate optima may differ; the NumPy mirror shares
    this orientation so pytest parity is exact).

    Per outer iteration, per graph: one distributed T^T.Y contraction
    (feature step), one distributed T^T.C_s.T double matmul (structure
    step), one distributed sqeuclidean join (metric step), and the FW
    solver's per-iteration assemblies — the n_s-sized structure/feature
    tables never leave the cluster; only N x n_s couplings do, by the
    operator family's summary contract.

    Returns (x(j, d, x), c(i, j, c), transports{k: (i, j, t)}, info).
    """
    ids = list(costs.keys())
    lam = lambdas or {k: 1.0 / len(ids) for k in ids}
    if init_c is None or init_x is None:
        raise ValueError("init_c and init_x are required (determinism)")
    ctr_rows = sorted(r["j"] for r in p_center.select("j").distinct().collect())
    cid = {x: k for k, x in enumerate(ctr_rows)}
    n = len(ctr_rows)
    pc = _collect_vec(p_center.select("j", "p"), "j", "p", cid)
    dims = sorted(
        r["d"]
        for r in feats[ids[0]].select("d").distinct().collect()
    )
    did = {x: k for k, x in enumerate(dims)}
    nd = len(dims)

    # driver-side state (N x N and N x d, small by contract)
    c = np.zeros((n, n))
    for r in init_c.select("i", "j", "c").collect():
        c[cid[r["i"]], cid[r["j"]]] = float(r["c"])
    x = np.zeros((n, nd))
    for r in init_x.select("j", "d", "x").collect():
        x[cid[r["j"]], did[r["d"]]] = float(r["x"])

    src_rows: dict[Any, list] = {}
    trans: dict[Any, np.ndarray] = {}
    feats_p: dict[Any, DataFrame] = {}
    costs_p: dict[Any, DataFrame] = {}
    for k in ids:
        src_rows[k] = sorted(r["i"] for r in ps[k].select("i").distinct().collect())
        pk = _collect_vec(ps[k].select("i", "p"), "i", "p",
                          {v: m for m, v in enumerate(src_rows[k])})
        trans[k] = np.outer(pk, pc)
        feats_p[k] = feats[k].select("i", "d", F.col("y").cast("double").alias("y")).persist()
        costs_p[k] = costs[k].select("i", "j", F.col("c").cast("double").alias("c")).persist()

    def _ship_t(k: Any) -> DataFrame:
        rows_ = src_rows[k]
        mat = trans[k]
        return spark.createDataFrame(
            [
                (rows_[i], ctr_rows[j], float(mat[i, j]))
                for i, j in zip(*np.nonzero(mat))
            ],
            "i long, j long, t double",
        )

    info: dict[str, Any] = {"err_feature": [], "err_structure": [], "iterations": 0}
    for it in range(1, max_iter + 1):
        c_prev, x_prev = c, x
        # trans[k] is read three times per iteration (feature step,
        # structure step, warm-start of the transport step) — ship the
        # coupling ONCE per (iteration, graph) instead of rebuilding
        # and re-uploading the identical DataFrame each time
        t_dfs = {k: _ship_t(k) for k in ids}
        # ---- feature update: X = sum_k lam_k T_k^T Y_k / p_c --------
        x = np.zeros((n, nd))
        for k in ids:
            t_df = t_dfs[k]
            rows = (
                t_df.join(feats_p[k], "i")
                .groupBy("j", "d")
                .agg(F.sum(F.col("t") * F.col("y")).alias("v"))
                .collect()
            )
            for r in rows:
                x[cid[r["j"]], did[r["d"]]] += lam[k] * float(r["v"])
        x = x / pc[:, None]
        # ---- structure update: C = sum_k lam_k T^T C_k T / p_c p_c^T
        c = np.zeros((n, n))
        for k in ids:
            t_df = t_dfs[k]
            # (C_k T)(i, j_c) then T^T . : (j_r, j_c)
            ckt = (
                costs_p[k]
                .select(F.col("i").alias("_i"), F.col("j").alias("_k"), "c")
                .join(t_df.select(F.col("i").alias("_k"), F.col("j").alias("_jc"), "t"), "_k")
                .groupBy("_i", "_jc")
                .agg(F.sum(F.col("c") * F.col("t")).alias("v"))
            )
            rows = (
                t_df.select(F.col("i").alias("_i"), F.col("j").alias("_jr"), "t")
                .join(ckt, "_i")
                .groupBy("_jr", "_jc")
                .agg(F.sum(F.col("t") * F.col("v")).alias("v"))
                .collect()
            )
            for r in rows:
                c[cid[r["_jr"]], cid[r["_jc"]]] += lam[k] * float(r["v"])
        c = c / np.outer(pc, pc)
        # ---- coupling updates via conditional gradient --------------
        c_df = spark.createDataFrame(
            [
                (ctr_rows[i], ctr_rows[j], float(c[i, j]))
                for i in range(n)
                for j in range(n)
            ],
            "i long, j long, c double",
        )
        x_df = spark.createDataFrame(
            [
                (ctr_rows[j], dims[d_], float(x[j, d_]))
                for j in range(n)
                for d_ in range(nd)
            ],
            "j long, d long, x double",
        )
        xnorm = x_df.groupBy("j").agg(F.sum(F.col("x") ** 2).alias("xn"))
        for k in ids:
            # M_k(i, j) = ||Y_k(i) - X(j)||^2 with feats as SPARSE COO
            # (implicit zeros): the naive join-on-d sum only covers
            # dims where node i HAS a row, silently dropping x_jd^2 for
            # the rest (and scoring featureless nodes 0 — maximally
            # attractive). Decompose instead:
            #   M(i,j) = sum_{d in D_i} [(y-x)^2 - x^2]  +  ||x_j||^2
            # which is exact for any sparsity pattern, including
            # feature-row-free nodes (left join -> coalesce 0).
            cross = (
                feats_p[k]
                .join(x_df, "d")
                .groupBy("i", "j")
                .agg(
                    F.sum(
                        (F.col("y") - F.col("x")) ** 2 - F.col("x") ** 2
                    ).alias("mc")
                )
            )
            i_df = spark.createDataFrame([(int(v),) for v in src_rows[k]], "i long")
            m_df = (
                i_df.crossJoin(xnorm)
                .join(cross, ["i", "j"], "left")
                .select(
                    "i",
                    "j",
                    (F.coalesce(F.col("mc"), F.lit(0.0)) + F.col("xn")).alias("m"),
                )
            )
            t_out, _, _ = gw_lp_transport(
                spark, costs_p[k], c_df, ps[k], p_center.select("j", "p"),
                reg=alpha, feature_cost=m_df, feature_weight=(1.0 - alpha),
                max_iter=fw_iter, trans0=t_dfs[k],
            )
            rows_ = {v: m for m, v in enumerate(src_rows[k])}
            g = np.zeros((len(src_rows[k]), n))
            for r in t_out.collect():
                g[rows_[r["i"]], cid[r["j"]]] = float(r["t"])
            trans[k] = g
        err_c = float(np.linalg.norm(c - c_prev))
        err_x = float(np.linalg.norm(x - x_prev))
        info["iterations"] = it
        info["err_structure"].append(err_c)
        info["err_feature"].append(err_x)
        if err_c < tol and err_x < tol:
            break
    for k in ids:
        feats_p[k].unpersist()
        costs_p[k].unpersist()
    x_out = spark.createDataFrame(
        [(ctr_rows[j], dims[d_], float(x[j, d_])) for j in range(n) for d_ in range(nd)],
        "j long, d long, x double",
    )
    c_out = spark.createDataFrame(
        [(ctr_rows[i], ctr_rows[j], float(c[i, j])) for i in range(n) for j in range(n)],
        "i long, j long, c double",
    )
    t_out_dfs = {k: _ship_t(k) for k in ids}
    return x_out, c_out, t_out_dfs, info
