"""Approximate-nearest-neighbor layer: grid candidates, multi-table
RP-LSH, k-NN graph construction.

Three candidate-generation strategies, each a bucketed equi-join (the
plan NEVER contains CartesianProduct / BroadcastNestedLoop — asserted
in tests/test_plans.py):

- ``grid_candidate_pairs`` — EXACT radius candidates. Project each
  vector onto P deterministic unit directions; within-eps pairs differ
  by ≤ eps in every projection (Cauchy–Schwarz), so probing the 3^P
  neighboring cells of width eps has recall exactly 1. This turns
  ε-NN and threshold-cosine pairs into equi-joins with NO loss of
  exactness — pruning power grows as eps shrinks relative to the data
  spread (strong for near-dup thresholds ≥0.9, weak for loose ones).
- ``multi_table_buckets`` — L independent RP-LSH tables (recall-
  controlled: a pair at angle θ collides somewhere with prob
  1-(1-(1-θ/π)^planes)^L; raise L for recall, planes for precision).
- ``ann_topk`` — multi-probe query-side expansion (flip each signature
  bit once → n_planes+1 probes/table) so queries reach adjacent
  buckets without growing the corpus index.
- ``ivf_topk`` — inverted-file (IVF) index: a deterministic Lloyd
  coarse quantizer (trained on a bounded hash-ordered sample, like
  every production IVF) partitions the corpus into n_centroids
  disjoint lists; queries probe their n_probe nearest lists via an
  equi-join on list_id. n_probe = n_centroids degenerates to EXACT
  brute force (asserted in tests), so recall is a single dial.

``knn_graph`` composes them: candidates → exact cosine → per-vertex
top-k window → symmetrize. Reference parity: the symmetrized k-NN
build of ``reference scripts/experiments/vertex_normal_prediction.py:
250-251`` (exact small-N) generalized with the LSH scale path.

At 100 TB: the corpus is bucketed once (one shuffle by bucket key),
candidate joins are per-bucket equi-joins (skew-capped via
``bucket_cap``), and scoring stays in JVM higher-order functions.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from efficient_graph_algorithms_spark.functions.hashing import uniform01
from efficient_graph_algorithms_spark.operators.similarity import (
    ROUND_DP,
    _dot,
    cosine,
)


def unit_projections(n: int, dim: int, seed: int = 42, stream0: int = 500) -> list[list[float]]:
    """n deterministic unit-norm Rademacher directions (±1/sqrt(dim))."""
    s = 1.0 / math.sqrt(dim)
    return [
        [s if u >= 0.5 else -s for u in uniform01(seed, np.arange(dim, dtype=np.uint64), stream=stream0 + i)]
        for i in range(n)
    ]


def _cell(vec: Column, plane: list[float], eps: float) -> Column:
    return F.floor(_dot(vec, F.array(*[F.lit(x) for x in plane])) / F.lit(eps)).cast("long")


def grid_candidate_pairs(
    points: DataFrame,
    eps: float,
    n_proj: int = 2,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "id",
    vec_col: str = "vec",
) -> DataFrame:
    """EXACT candidate superset for pairs within Euclidean eps:
    (a, va, b, vb) directed (both orders, a != b). One side probes the
    3^n_proj neighboring grid cells; the other keeps its own cell —
    every within-eps pair meets in exactly one probe, so no dedup pass
    is needed and recall is exactly 1."""
    planes = unit_projections(n_proj, dim, seed)
    base = points.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    cells = [ _cell(F.col("_v"), p, eps) for p in planes ]

    probe_offsets = [[]]
    for _ in range(n_proj):
        probe_offsets = [po + [d] for po in probe_offsets for d in (-1, 0, 1)]
    probes = F.array(*[
        F.struct(*[(cells[j] + F.lit(off[j])).alias(f"c{j}") for j in range(n_proj)])
        for off in probe_offsets
    ])
    a = base.select(
        F.col("_id").alias("a"), F.col("_v").alias("va"),
        F.explode(probes).alias("_cell"),
    ).select("a", "va", *[F.col(f"_cell.c{j}").alias(f"c{j}") for j in range(n_proj)])
    b = base.select(
        F.col("_id").alias("b"), F.col("_v").alias("vb"),
        *[cells[j].alias(f"c{j}") for j in range(n_proj)],
    )
    return a.join(b, [f"c{j}" for j in range(n_proj)]).where(
        F.col("a") != F.col("b")
    ).select("a", "va", "b", "vb")


def multi_table_buckets(
    vectors: DataFrame,
    n_tables: int = 4,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, table, bucket) — one signature per LSH table. Recall is
    controlled by n_tables (union of collisions across tables).

    ONE scan (r6): all n_tables signatures are computed in a single
    projection and exploded, instead of a union of n_tables branches —
    the r5 union re-read the corpus (and re-evaluated the projection
    dot products, which are interpreted higher-order-function folds)
    once per table, and every downstream consumer of the union paid it
    again. The per-plane dot/sign/bucket expressions are byte-identical
    to the r5 ones, so signatures (and everything downstream) are
    unchanged."""
    from efficient_graph_algorithms_spark.sources.edges import spread_narrow_scan

    v = F.col(vec_col)
    sigs = []
    for t in range(n_tables):
        planes = unit_projections(n_planes, dim, seed, stream0=1000 + t * n_planes)
        bucket = F.lit(0).cast("long")
        for i, p in enumerate(planes):
            d = _dot(v, F.array(*[F.lit(x) for x in p]))
            bucket = bucket + F.when(d > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
        sigs.append(
            F.struct(F.lit(t).alias("table"), bucket.alias("bucket"))
        )
    # spread a one-split corpus so the n_tables·n_planes projection
    # folds parallelize (r6, guide §6); many-file corpora untouched
    return spread_narrow_scan(
        vectors.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias(vec_col))
    ).select(
        F.col("vec_id"), F.explode(F.array(*sigs)).alias("_tb")
    ).select("vec_id", F.col("_tb.table").alias("table"), F.col("_tb.bucket").alias("bucket"))


def knn_graph(
    points: DataFrame,
    k: int = 5,
    method: str = "lsh",
    n_tables: int = 4,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_cap: int = 10000,
) -> DataFrame:
    """Symmetrized k-NN graph by cosine: (src, dst, cos), both
    directions of every selected edge, deduplicated.

    method="lsh": candidates = union of same-bucket pairs over
    n_tables independent RP-LSH tables (recall < 1 by design — the
    scale path; buckets larger than bucket_cap are dropped with the
    same skew-cap rationale as dedup's hot-shingle cap).
    method="exact": full pairwise scoring — the small-N oracle path
    (still an equi-join shape? no — an explicit theta join; use only
    at test scale, reference parity vertex_normal_prediction.py:250).
    """
    v = points.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    if method == "exact":
        a = v.select(F.col("_id").alias("a"), F.col("_v").alias("va"))
        b = v.select(F.col("_id").alias("b"), F.col("_v").alias("vb"))
        cand = a.join(b, F.col("a") < F.col("b"))
    elif method == "lsh":
        # r6 plan shape: the signature table is computed ONCE (single-
        # scan multi_table_buckets) and pinned; the bucket-size cap is a
        # COUNT WINDOW over the same (table, bucket) shuffle the band
        # self-join needs, so histogram + cap-filter + self-join all
        # share ONE exchange (the r5 plan ran a separate groupBy
        # histogram plus a semi-join, re-shuffling the signatures three
        # times and recomputing the projection folds per consumer).
        # Cache lifecycle follows the build_edges precedent: the
        # returned DataFrame is lazy and still reads the persist, so it
        # is deliberately not unpersisted here; a long-lived session
        # doing repeated builds should clearCache() between them.
        wb = Window.partitionBy("table", "bucket")
        bk = (
            multi_table_buckets(points, n_tables, n_planes, dim, seed, id_col, vec_col)
            .withColumn("_n", F.count(F.lit(1)).over(wb))
            .where(F.col("_n") <= bucket_cap)
            .select("vec_id", "table", "bucket")
            .persist()
        )
        a = bk.select(F.col("vec_id").alias("a"), "table", "bucket")
        b = bk.select(F.col("vec_id").alias("b"), "table", "bucket")
        # candidates are deduplicated on IDS ONLY, and the vectors are
        # attached after (guide §8: decide with small rows, move heavy
        # rows once) — the r5 plan carried both 64-double payloads
        # through the band join AND the distinct shuffle
        cand = (
            a.join(b, ["table", "bucket"])
            .where(F.col("a") < F.col("b"))
            .select("a", "b")
            .distinct()  # same pair may collide in several tables
            .join(v.select(F.col("_id").alias("a"), F.col("_v").alias("va")), "a")
            .join(v.select(F.col("_id").alias("b"), F.col("_v").alias("vb")), "b")
            .select("a", "va", "b", "vb")
        )
    else:
        raise ValueError(f"unknown method {method!r}")
    scored = cand.select(
        "a", "b", F.round(cosine(F.col("va"), F.col("vb")), ROUND_DP).alias("cos")
    )
    both = scored.unionByName(
        scored.select(F.col("b").alias("a"), F.col("a").alias("b"), "cos")
    )
    w = Window.partitionBy("a").orderBy(F.desc("cos"), F.asc("b"))
    topk = (
        both.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(F.col("a").alias("src"), F.col("b").alias("dst"), "cos")
    )
    # symmetrize: keep edge (u,v) if u picked v OR v picked u
    return topk.unionByName(
        topk.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "cos")
    ).groupBy("src", "dst").agg(F.max("cos").alias("cos"))


def ann_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_tables: int = 4,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    multiprobe: bool = True,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k: multi-table RP-LSH with query-side multi-probe
    (each query also probes the n_planes buckets at Hamming distance 1,
    per table). Returns (qid, vec_id, cos, rn). Brute-force baseline:
    ``similarity.cosine_topk``."""
    corpus = multi_table_buckets(vectors, n_tables, n_planes, dim, seed, id_col, vec_col)
    qb = multi_table_buckets(queries, n_tables, n_planes, dim, seed, qid_col, vec_col)
    qb = qb.withColumnRenamed("vec_id", "qid")
    if multiprobe:
        flips = F.array(*([F.lit(0)] + [F.lit(1 << i) for i in range(n_planes)]))
        qb = qb.select(
            "qid", "table",
            F.explode(flips).alias("_flip"),
            F.col("bucket"),
        ).select(
            "qid", "table",
            F.expr("bucket").bitwiseXOR(F.col("_flip")).alias("bucket"),
        )
    cand = qb.join(corpus, ["table", "bucket"]).select("qid", "vec_id")
    if exclude_self:
        # shared-id-namespace semantics (queries drawn from the
        # corpus); pass exclude_self=False for an independent query id
        # space, where a coincidental equality would drop a neighbor
        cand = cand.where(F.col("qid") != F.col("vec_id"))
    cand = cand.distinct()
    v = vectors.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_cv"))
    q = queries.select(F.col(qid_col).alias("qid"), F.col(vec_col).alias("_qv"))
    scored = (
        cand.join(v, "vec_id")
        .join(q, "qid")
        .select("qid", "vec_id", F.round(cosine(F.col("_qv"), F.col("_cv")), ROUND_DP).alias("cos"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("qid", "vec_id", "cos", "rn")
    )


def _ivf_dist2(vec: Column, c: list[float]) -> Column:
    """Squared L2 distance to centroid c, up to the |v|^2 term shared by
    every centroid (irrelevant for the argmin): |c|^2 - 2 v.c."""
    cc = float(np.dot(c, c))
    return F.lit(cc) - 2.0 * _dot(vec, F.array(*[F.lit(float(x)) for x in c]))


def _ivf_dist_structs(vec: Column, centroids: list[list[float]]) -> Column:
    """array<struct<d, i>> of (distance, centroid-idx) pairs — the single
    source of truth for assignment (array_min) and probe ranking
    (array_sort); lexicographic struct order gives a deterministic idx
    tie-break in both."""
    return F.array(
        *[
            F.struct(_ivf_dist2(vec, c).alias("d"), F.lit(i).alias("i"))
            for i, c in enumerate(centroids)
        ]
    )


def _ivf_assign_expr(vec: Column, centroids: list[list[float]]) -> Column:
    """0-based index of the nearest centroid, pure JVM."""
    return F.array_min(_ivf_dist_structs(vec, centroids))["i"]


def ivf_centroids(
    vectors: DataFrame,
    n_centroids: int = 16,
    n_iter: int = 5,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_train: int = 100_000,
) -> list[list[float]]:
    """Deterministic Lloyd coarse quantizer for the IVF index.

    Trains on a hash-ordered sample of ``max_train`` vectors (orderBy +
    limit: TakeOrderedAndProject below
    ``spark.sql.execution.topKSortFallbackThreshold`` (default 10k), a
    bounded one-off sort above it — either way training cost is capped;
    production IVF quantizers train on a bounded sample regardless of
    corpus size, and the index assignment below still covers every
    vector). Init = first n_centroids sample rows in the same
    hash order, so the whole pipeline is seed-reproducible. Empty
    clusters keep their previous centroid. Driver state is
    n_centroids x dim floats per iteration — broadcast-sized by
    construction."""
    v = vectors.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    order = F.md5(F.concat_ws(":", F.lit(seed), F.col("_id").cast("string")))
    train = v.orderBy(order, F.col("_id")).limit(max_train).persist()
    try:
        init = train.limit(n_centroids).collect()
        cents = [[float(x) for x in r["_v"]] for r in init]
        if len(cents) < n_centroids:
            raise ValueError(
                f"need >= {n_centroids} vectors to train, got {len(cents)}"
            )
        for _ in range(n_iter):
            assigned = train.select(
                "_v", _ivf_assign_expr(F.col("_v"), cents).alias("cid")
            )
            sums = (
                assigned.select("cid", F.posexplode("_v").alias("pos", "x"))
                .groupBy("cid", "pos")
                .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
                .collect()
            )
            # empty clusters get no rows and keep their previous centroid
            nxt = [list(c) for c in cents]
            for r in sums:
                nxt[r["cid"]][r["pos"]] = r["s"] / r["n"]
            cents = nxt
        return cents
    finally:
        train.unpersist()


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    n_iter: int = 5,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    centroids: list[list[float]] | None = None,
    exclude_self: bool = True,
) -> DataFrame:
    """IVF approximate top-k: (qid, vec_id, cos, rn), same contract as
    ``ann_topk`` / ``similarity.cosine_topk``.

    Corpus vectors are assigned to their nearest coarse centroid
    (narrow, no shuffle); each query probes its n_probe nearest lists.
    Candidates come from ONE equi-join on list_id — lists are disjoint,
    so no distinct() is needed (unlike multi-table LSH). n_probe =
    n_centroids probes every list and reproduces exact brute force;
    recall at n_probe < n_centroids is the recall/cost dial. Pass
    ``centroids`` to reuse a trained quantizer across calls."""
    if centroids is None:
        centroids = ivf_centroids(
            vectors, n_centroids, n_iter, seed, id_col, vec_col
        )
    corpus = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("_cv"),
        _ivf_assign_expr(F.col(vec_col), centroids).alias("list_id"),
    )
    dist_arr = _ivf_dist_structs(F.col("_qv"), centroids)
    probes = (
        queries.select(F.col(qid_col).alias("qid"), F.col(vec_col).alias("_qv"))
        .select(
            "qid",
            "_qv",
            F.explode(F.slice(F.array_sort(dist_arr), 1, n_probe)).alias("_p"),
        )
        .select("qid", "_qv", F.col("_p.i").alias("list_id"))
    )
    scored = probes.join(corpus, "list_id")
    if exclude_self:
        # shared-namespace semantics — see ann_topk
        scored = scored.where(F.col("qid") != F.col("vec_id"))
    scored = (
        scored
        .select(
            "qid",
            "vec_id",
            F.round(cosine(F.col("_qv"), F.col("_cv")), ROUND_DP).alias("cos"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("qid", "vec_id", "cos", "rn")
    )
