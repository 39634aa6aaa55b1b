"""Kernel-score projection pipeline: seeds → kernel scores →
bias correction → ranking.

Semantics from the reference's ``get_projection``
(``reference src/ega/algorithms/graph_kernels.py:387-519``) and
``get_ranking`` (559-585):

    score = K · onehot(seeds)            (K = k-step random-walk kernel)
    corrections:
      seedset_size — score / |seeds|
      degree       — score / degree(v)
      rdm_seed     — z-score of the raw score against the score
                     distribution over R alternative seed sets
                     ((x − mean)/std, the reference's ZSCORE formula)
    optional norm — score / Σscore, then top-k ranking.

The R alternative seed sets are evaluated in ONE batched gather-scatter:
the field is (id, sample, value) and every SpMV is a single
edges ⋈ field → groupBy(dst, sample) — one shuffle for all samples
per step, not R sequential kernel runs. That is the distributed answer
to the reference's ``get_projections_batch`` loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _batch_rw_step(linked: DataFrame, field: DataFrame) -> DataFrame:
    """One batched SpMV: field(id, sample, value) → (id, sample, value)
    with value' = Σ_{u→v} field[u, s]/deg(u)."""
    return (
        linked.join(field, linked["src"] == field["id"])
        .groupBy(linked["dst"].alias("id"), "sample")
        .agg(F.sum(F.col("value") * F.col("inv_deg")).alias("value"))
    )


def kernel_projection(
    edges: DataFrame,
    seed_sets: DataFrame,
    steps: int = 2,
    correction: str | None = None,
    norm: bool = False,
) -> DataFrame:
    """seed_sets: (id, sample) — sample 0 is THE seed set, samples ≥ 1
    are the alternative sets used only by correction='rdm_seed'.
    Returns (id, score) over all vertices reachable in `steps`.

    correction ∈ {None, 'seedset_size', 'degree', 'rdm_seed'}."""
    deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    linked = edges.join(deg, "src").select(
        "src", "dst", (F.lit(1.0) / F.col("out_deg")).alias("inv_deg")
    )
    need_batch = correction == "rdm_seed"
    sets = seed_sets if need_batch else seed_sets.where(F.col("sample") == 0)
    field = sets.select("id", "sample", F.lit(1.0).alias("value"))
    for _ in range(steps):
        field = _batch_rw_step(linked, field).localCheckpoint(eager=False)
    main = field.where(F.col("sample") == 0).select("id", F.col("value").alias("score"))

    if correction is None:
        out = main
    elif correction == "seedset_size":
        n_seeds = seed_sets.where(F.col("sample") == 0).count()
        out = main.select("id", (F.col("score") / F.lit(float(n_seeds))).alias("score"))
    elif correction == "degree":
        # undirected degree, the reference's adj.sum(axis=1)
        und = (
            edges.select("src", "dst")
            .unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
            .where(F.col("src") != F.col("dst"))
            .distinct()
        )
        d = und.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("d"))
        out = main.join(d, "id", "left").select(
            "id", (F.col("score") / F.coalesce(F.col("d"), F.lit(1)).cast("double")).alias("score")
        )
    elif correction == "rdm_seed":
        # per-vertex mean/std over the R samples, counting absent rows
        # as zero scores (the reference's projections are dense): moment
        # sums divided by R, population std like np.std
        r = seed_sets.where(F.col("sample") >= 1).select("sample").distinct().count()
        stats = (
            field.where(F.col("sample") >= 1)
            .groupBy("id")
            .agg(F.sum("value").alias("s1"), F.sum(F.col("value") ** 2).alias("s2"))
            .select(
                "id",
                (F.col("s1") / F.lit(float(r))).alias("mu"),
                F.sqrt(
                    F.greatest(
                        F.col("s2") / F.lit(float(r)) - (F.col("s1") / F.lit(float(r))) ** 2,
                        F.lit(0.0),
                    )
                ).alias("sd"),
            )
        )
        # FULL join: a vertex the real seeds never reach still gets a
        # (negative) z-score when the random seed sets do reach it
        out = (
            main.join(stats, "id", "full")
            .select(
                "id",
                (
                    (F.coalesce(F.col("score"), F.lit(0.0)) - F.coalesce(F.col("mu"), F.lit(0.0)))
                    / F.when(
                        F.coalesce(F.col("sd"), F.lit(0.0)) > 0, F.col("sd")
                    ).otherwise(F.lit(1.0))
                ).alias("score"),
            )
        )
    else:
        raise ValueError(f"unknown correction {correction!r}")
    if norm:
        total = float(out.agg(F.sum("score")).collect()[0][0] or 0.0)
        if total != 0.0:
            out = out.select("id", (F.col("score") / F.lit(total)).alias("score"))
    return out


def projection_ranking(scores: DataFrame, k: int = 20) -> DataFrame:
    """Top-k report (reference get_ranking, graph_kernels.py:559-585)."""
    return scores.orderBy(F.desc("score"), F.asc("id")).limit(k)
