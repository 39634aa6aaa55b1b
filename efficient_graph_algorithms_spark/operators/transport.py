"""Diffusion embeddings and entropic-OT operators.

- ``diffusion_state_distance``: DSD embeddings + pairwise L1 for a
  seed subset — the reference's ``diffusion_state_distance``
  (``reference src/ega/algorithms/graph_kernels.py:84-97``: accumulate
  c ← cP + I, then pairwise cityblock). Never materializes (N,N):
  each seed's row of Σ_j P^j is a k-step random-walk accumulation run
  for ALL seeds at once as one (id, seed)-keyed field — SURVEY §2.9's
  "k SpMV rounds + pairwise distance on a sampled vertex subset".

- ``sinkhorn_distance``: entropic regularized transport distance
  between two vertex distributions via alternating kernel-matvec
  scalings — the loop skeleton of the reference's
  ``convolutional_distance.py:12-89`` / ``sinkhorn_knopp_iteration``
  (``reference src/ega/algorithms/gromov_wasserstein_graphs.py:108-166``):
  every inner step is one gather-scatter (the engine's core primitive)
  plus element-wise column arithmetic, with the 1e-300 clamp guard
  (``reference src/ega/algorithms/convolutional_barycenter.py:66``).
  Kernel here: K = I + w·A over the symmetric graph (one-hop heat
  approximation); the reference's pluggable-integrator pattern means
  any ``integrate``-shaped callable can replace it.
"""

from __future__ import annotations

import math
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EPS_CLAMP = 1e-300


def _sym(edges: DataFrame) -> DataFrame:
    return (
        edges.select("src", "dst")
        .unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def diffusion_state_distance(
    spark: SparkSession,
    edges: DataFrame,
    seeds: list[int],
    k: int = 3,
) -> DataFrame:
    """Pairwise DSD among `seeds`: (a, b, dsd) with a < b.

    dsd(a,b) = || Σ_{j=0..k} (row_a(P^j) - row_b(P^j)) ||_1 over the
    directed out-normalized walk P (dangling rows stay absorbed).
    """
    deg = edges.groupBy("src").agg(F.count("*").alias("d"))
    p = edges.join(deg, "src").select(
        "src", "dst", (F.lit(1.0) / F.col("d")).alias("w")
    ).persist()

    seed_rows = [(int(s), int(s), 1.0) for s in seeds]
    x = spark.createDataFrame(seed_rows, "seed long, id long, value double")
    acc = x  # j = 0 term
    for _ in range(k):
        x = (
            p.join(x, p["src"] == x["id"])
            .groupBy(F.col("seed"), p["dst"].alias("id"))
            .agg(F.sum(F.col("w") * F.col("value")).alias("value"))
            .localCheckpoint(eager=False)
        )
        acc = (
            acc.join(x.withColumnRenamed("value", "xv"), ["seed", "id"], "full")
            .select(
                "seed",
                "id",
                (F.coalesce(F.col("value"), F.lit(0.0)) + F.coalesce(F.col("xv"), F.lit(0.0))).alias("value"),
            )
            .localCheckpoint(eager=False)
        )
    acc = acc.persist()
    # L1 over the union of supports without materializing it per pair:
    # L1(a,b) = Σ_∩|va-vb| + (T_a - Σ_∩|va|) + (T_b - Σ_∩|vb|)
    totals = acc.groupBy("seed").agg(F.sum(F.abs("value")).alias("tot"))
    a = acc.select(F.col("seed").alias("a"), "id", F.col("value").alias("va"))
    b = acc.select(F.col("seed").alias("b"), "id", F.col("value").alias("vb"))
    inner = (
        a.join(b, "id")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(
            F.sum(F.abs(F.col("va") - F.col("vb"))).alias("i_abs"),
            F.sum(F.abs("va")).alias("o_a"),
            F.sum(F.abs("vb")).alias("o_b"),
        )
    )
    # zero-overlap seed pairs (disconnected) still get a row
    ss = sorted(int(s) for s in seeds)
    all_pairs = spark.createDataFrame(
        [(x, y) for i, x in enumerate(ss) for y in ss[i + 1 :]], "a long, b long"
    )
    inner = all_pairs.join(inner, ["a", "b"], "left").select(
        "a",
        "b",
        F.coalesce("i_abs", F.lit(0.0)).alias("i_abs"),
        F.coalesce("o_a", F.lit(0.0)).alias("o_a"),
        F.coalesce("o_b", F.lit(0.0)).alias("o_b"),
    )
    out = (
        inner.join(totals.select(F.col("seed").alias("a"), F.col("tot").alias("t_a")), "a")
        .join(totals.select(F.col("seed").alias("b"), F.col("tot").alias("t_b")), "b")
        .select(
            "a",
            "b",
            (
                F.col("i_abs") + (F.col("t_a") - F.col("o_a")) + (F.col("t_b") - F.col("o_b"))
            ).alias("dsd"),
        )
    )
    p.unpersist()
    return out


def sinkhorn_distance(
    spark: SparkSession,
    edges: DataFrame,
    mu: DataFrame,
    nu: DataFrame,
    gamma: float = 1.0,
    kernel_weight: float = 0.5,
    n_iter: int = 20,
    tol: float = 1e-6,
    return_potentials: bool = False,
) -> tuple[float, dict[str, Any]] | tuple[float, dict[str, Any], DataFrame]:
    """Entropic OT distance between vertex distributions mu(id, m) and
    nu(id, m) (each sums to 1) with symmetric kernel K = I + w·A.

    Alternating scalings  v ← mu / (K u),  u ← nu / (K v)  until the
    L1 change of v falls below tol (reference's relative-error stop,
    ``gromov_wasserstein_graphs.py:159-162``); distance =
    γ · Σ [ mu·log(max(v,ε)) + nu·log(max(u,ε)) ].
    """
    sym = _sym(edges).persist()
    verts = (
        sym.select(F.col("src").alias("id")).distinct()
        .unionByName(mu.select("id"))
        .unionByName(nu.select("id"))
        .distinct()
        .persist()
    )

    def kmul(x: DataFrame) -> DataFrame:
        """(K x)(i) = x(i) + w · Σ_{j~i} x(j)."""
        nbr = (
            sym.join(x, sym["src"] == x["id"])
            .groupBy(sym["dst"].alias("id"))
            .agg(F.sum("value").alias("nv"))
        )
        return (
            x.join(nbr, "id", "full")
            .select(
                "id",
                (
                    F.coalesce(F.col("value"), F.lit(0.0))
                    + F.lit(kernel_weight) * F.coalesce(F.col("nv"), F.lit(0.0))
                ).alias("value"),
            )
        )

    mu_v = verts.join(mu, "id", "left").select(
        "id", F.coalesce(F.col("m"), F.lit(0.0)).alias("mu")
    )
    nu_v = verts.join(nu, "id", "left").select(
        "id", F.coalesce(F.col("m"), F.lit(0.0)).alias("nu")
    ).persist()
    state0 = state = mu_v.select("id", "mu", F.lit(1.0).alias("u")).persist()
    # per-iteration barrier = parquet state cut: each scaling references
    # the previous state twice (through K·u and the update join), so a
    # localCheckpoint chain doubles Catalyst's carried size estimate per
    # iteration (plans/lineage.py)
    from efficient_graph_algorithms_spark.plans.lineage import StateCutter

    # two interleaved streams (v, state), each iteration reads only the
    # previous generation of each → keep=4 bounds scratch to 4 cut dirs
    cut = StateCutter(spark, "sinkhorn", keep=4)
    info: dict[str, Any] = {"iterations": 0, "deltas": []}
    v_prev = None
    v = None
    for it in range(1, n_iter + 1):
        ku = kmul(state.select("id", F.col("u").alias("value")))
        v_new = (
            state.join(ku.withColumnRenamed("value", "ku"), "id")
            .select(
                "id", "mu",
                (F.col("mu") / F.greatest(F.col("ku"), F.lit(EPS_CLAMP))).alias("v"),
            )
        )
        # convergence delta vs the previous v rides the cut write as a
        # CollectMetrics partial (pagerank's observe() pattern) — two
        # jobs per iteration total instead of three. _obs_v0 is
        # observation-only scratch: the cutter drops it before the write.
        if v_prev is not None:
            v_new = v_new.join(
                v_prev.select("id", F.col("v").alias("_obs_v0")), "id", "left"
            )
            v, got = cut.observe(
                v_new,
                delta=F.sum(F.abs(F.col("v") - F.coalesce(F.col("_obs_v0"), F.col("v")))),
            )
            delta = float(got["delta"] or 0.0)
        else:
            v, delta = cut(v_new), None
        kv = kmul(v.select("id", F.col("v").alias("value")))
        u_new = (
            nu_v.join(kv.withColumnRenamed("value", "kv"), "id")
            .select(
                "id",
                (F.col("nu") / F.greatest(F.col("kv"), F.lit(EPS_CLAMP))).alias("u"),
            )
        )
        state = cut(
            mu_v.join(u_new, "id", "left")
            .select("id", "mu", F.coalesce(F.col("u"), F.lit(1.0)).alias("u"))
        )
        info["iterations"] = it
        if delta is not None:
            info["deltas"].append(delta)
            if delta < tol:
                break
        v_prev = v
    # distance = γ Σ [mu log v + nu log u]
    mu_term = (
        v.where(F.col("mu") > 0)
        .agg(F.sum(F.col("mu") * F.log(F.greatest(F.col("v"), F.lit(EPS_CLAMP)))))
        .collect()[0][0]
        or 0.0
    )
    nu_term = (
        nu_v.join(state.select("id", "u"), "id")
        .where(F.col("nu") > 0)
        .agg(F.sum(F.col("nu") * F.log(F.greatest(F.col("u"), F.lit(EPS_CLAMP)))))
        .collect()[0][0]
        or 0.0
    )
    dist = gamma * (float(mu_term) + float(nu_term))
    for df in (sym, verts, nu_v, state0):
        df.unpersist()
    if return_potentials:
        # pin before the cutter's backing files are removed
        pots = v.select("id", "v").join(state.select("id", "u"), "id") \
            .localCheckpoint(eager=True)
        cut.close()
        return dist, info, pots
    cut.close()
    return dist, info


def wasserstein_barycenter(
    spark: SparkSession,
    edges: DataFrame,
    distributions: DataFrame,
    weights: dict[int, float] | None = None,
    area_weights: DataFrame | None = None,
    kernel_weight: float = 0.5,
    n_iter: int = 100,
    tol: float = 1e-6,
    normalization: bool = False,
) -> tuple[DataFrame, dict[str, Any]]:
    """Entropic Wasserstein barycenter of K vertex distributions by
    iterated Bregman projection — the reference's
    ``ConvolutionalBarycenter.get_convolutional_barycenter``
    (``reference src/ega/algorithms/convolutional_barycenter.py:13-81``,
    Solomon et al. 2015 Alg. 2), re-expressed so ALL K distributions
    advance through each kernel matvec in ONE keyed gather-scatter
    (shuffle key (k, id)) instead of K dense columns:

        w_k ← p_k / K(a·v_k)
        d_k ← v_k · K(a·w_k)          (clamped at 1e-300)
        b   ← exp(Σ_k α_k log d_k)    (the geometric-mean update)
        v_k ← v_k · b / d_k
        stop when Σ_id a·|b - b_old| < tol   (checked from iteration 2,
        matching the reference's ``j > 1`` guard)

    distributions: (k:int, id:long, m:double) — distribution k over the
    vertex set (missing ids = 0 mass). weights: α_k per k (default
    uniform; normalized internally like the reference's
    ``alpha/np.sum(alpha)``). area_weights: optional (id, a) lumped
    vertex areas (default 1.0 — the reference's default). Kernel:
    K = I + w·A over the symmetrized graph, the same one-hop heat
    approximation ``sinkhorn_distance`` uses; any ``integrate``-shaped
    kernel can replace ``kmul``. normalization mirrors the reference's
    optional K-column normalization (K(x)/K(1)).

    Returns (barycenter(id, b), info). The per-iteration state (v and
    b) round-trips through a StateCutter with bounded retention — each
    iteration reads only the previous generation of each stream.
    """
    sym = _sym(edges).persist()
    verts = (
        sym.select(F.col("src").alias("id"))
        .unionByName(distributions.select("id"))
        .distinct()
        .persist()
    )
    ks = [int(r["k"]) for r in distributions.select("k").distinct().collect()]
    if weights is None:
        alpha = {k: 1.0 / len(ks) for k in ks}
    else:
        tot = float(sum(weights[k] for k in ks))
        alpha = {k: float(weights[k]) / tot for k in ks}
    alpha_df = spark.createDataFrame(
        [(k, a) for k, a in sorted(alpha.items())], "k int, alpha double"
    )

    area = (
        verts.join(area_weights.withColumnRenamed("a", "_a"), "id", "left")
        .select("id", F.coalesce(F.col("_a"), F.lit(1.0)).alias("a"))
        if area_weights is not None
        else verts.select("id", F.lit(1.0).alias("a"))
    ).persist()

    # p_k over the full vertex set (zeros off-support), area attached
    kv_grid = verts.crossJoin(alpha_df.select("k"))
    p = (
        kv_grid.join(distributions.withColumnRenamed("m", "_m"), ["k", "id"], "left")
        .select("k", "id", F.coalesce(F.col("_m"), F.lit(0.0)).alias("p"))
        .join(area, "id")
        .persist()
    )

    def kmul_k(x: DataFrame) -> DataFrame:
        """(K x_k)(i) = x_k(i) + w·Σ_{j~i} x_k(j), all k at once."""
        nbr = (
            sym.join(x, sym["src"] == x["id"])
            .groupBy(F.col("k"), sym["dst"].alias("id"))
            .agg(F.sum("value").alias("nv"))
        )
        out = x.join(nbr, ["k", "id"], "full").select(
            "k",
            "id",
            (
                F.coalesce(F.col("value"), F.lit(0.0))
                + F.lit(kernel_weight) * F.coalesce(F.col("nv"), F.lit(0.0))
            ).alias("value"),
        )
        return out

    kone = None
    if normalization:
        # K(1) per vertex is iteration-invariant: compute once
        ones = verts.crossJoin(alpha_df.select("k")).select(
            "k", "id", F.lit(1.0).alias("value")
        )
        kone = kmul_k(ones).withColumnRenamed("value", "k1").persist()

    def knorm(x: DataFrame) -> DataFrame:
        out = kmul_k(x)
        if kone is None:
            return out
        return out.join(kone, ["k", "id"]).select(
            "k", "id", (F.col("value") / F.col("k1")).alias("value")
        )

    from efficient_graph_algorithms_spark.plans.lineage import StateCutter

    # two interleaved streams (v table, b table), one generation of each
    # read per iteration → keep=4 bounds scratch at 4 cut dirs
    cut = StateCutter(spark, "wbary", keep=4)
    v = p.select("k", "id", F.lit(1.0).alias("v"))
    b_old: DataFrame | None = None
    info: dict[str, Any] = {"iterations": 0, "changes": [], "k": len(ks)}
    b = None
    try:
        for it in range(1, n_iter + 1):
            kv = knorm(
                p.join(v, ["k", "id"]).select("k", "id", (F.col("v") * F.col("a")).alias("value"))
            )
            w = (
                p.join(kv.withColumnRenamed("value", "kv"), ["k", "id"])
                .select(
                    "k", "id", "a",
                    (F.col("p") / F.greatest(F.col("kv"), F.lit(EPS_CLAMP))).alias("w"),
                )
            )
            kw = knorm(w.select("k", "id", (F.col("w") * F.col("a")).alias("value")))
            d = (
                v.join(kw.withColumnRenamed("value", "kw"), ["k", "id"])
                .select(
                    "k", "id", "v",
                    F.greatest(F.col("v") * F.col("kw"), F.lit(EPS_CLAMP)).alias("d"),
                )
            )
            d = cut(d)
            # geometric-mean update: b(i) = exp(Σ_k α_k log d_k(i)).
            # The convergence change Σ_id a·|b - b_old| rides the cut
            # write as a CollectMetrics partial (pagerank observe()
            # pattern) — two jobs per iteration, not three. _obs_*
            # columns are observation scratch the cutter drops pre-write.
            b_new = (
                d.join(alpha_df, "k")
                .groupBy("id")
                .agg(F.exp(F.sum(F.col("alpha") * F.log(F.col("d")))).alias("b"))
            )
            if b_old is not None:
                b_new = b_new.join(
                    b_old.select("id", F.col("b").alias("_obs_b0")), "id", "left"
                ).join(area.select("id", F.col("a").alias("_obs_a")), "id")
                b, got = cut.observe(
                    b_new,
                    change=F.sum(
                        F.col("_obs_a")
                        * F.abs(F.col("b") - F.coalesce(F.col("_obs_b0"), F.col("b")))
                    ),
                )
                change = float(got["change"] or 0.0)
            else:
                b, change = cut(b_new), None
            v = (
                d.join(b, "id")
                .select("k", "id", (F.col("v") * F.col("b") / F.col("d")).alias("v"))
            )
            info["iterations"] = it
            if change is not None:
                info["changes"].append(change)
                if it > 2 and change < tol:
                    break
            b_old = b
        out = b.localCheckpoint(eager=True)  # pin before cut dirs vanish
        return out, info
    finally:
        cut.close()
        for df in (sym, verts, area, p):
            df.unpersist()
        if kone is not None:
            kone.unpersist()
