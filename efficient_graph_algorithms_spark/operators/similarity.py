"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``      exact brute-force top-k per query (the baseline;
                       one broadcast of the query set, no shuffle of the
                       corpus — correct plan shape even at 100 TB when
                       the query set is small)
- ``cosine_pairs``     embedding-cosine near-duplicate pairs above a
                       threshold (candidate restriction by random-
                       hyperplane LSH bucket; the exact variant for the
                       oracle does the full pairwise join)
- ``rp_lsh_buckets``   random-hyperplane signature per vector — the
                       scale path: vectors sharing a bucket are the
                       only candidate pairs

All arithmetic is double precision inside JVM higher-order functions
(``zip_with`` / ``aggregate``) — no Python in the hot path. Outputs are
rounded (ROUND_DP) and tie-broken by id so Spark and the DuckDB oracle
order identically.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from efficient_graph_algorithms_spark.functions.hashing import uniform01

ROUND_DP = 4


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    # NOTE (r6): an element_at-unrolled variant of the fold was measured
    # bit-identical but NOT faster (1.55 s vs 1.43 s over 100k pairs) —
    # Spark 4's higher-order-function evaluation is no longer the
    # bottleneck it was; the HOF form stays.
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    vectors: (vec_id, embedding); queries: (qid, embedding). The query
    side is broadcast — corpus never shuffles. Returns
    (qid, vec_id, cos) with deterministic ordering (cos desc, vec_id asc).

    ``exclude_self`` (default True) drops rows where qid == vec_id —
    the right semantics when queries are drawn FROM the corpus (one
    shared id namespace). Pass False when query ids live in their own
    namespace: a coincidental qid == vec_id equality would otherwise
    silently drop a legitimate neighbor.
    """
    from efficient_graph_algorithms_spark.sources.edges import spread_narrow_scan

    q = F.broadcast(queries.select(F.col(qid_col).alias("qid"), F.col(vec_col).alias("qvec")))
    # spread the corpus side when it arrives as one scan split (small
    # single-file table): the per-row |q| cosine folds are the cost and
    # would otherwise run on one core (r6, guide §6)
    v = spread_narrow_scan(
        vectors.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vvec"))
    )
    pairs = v.crossJoin(q)
    if exclude_self:
        pairs = pairs.where(F.col("qid") != F.col("vec_id"))
    scored = pairs.select(
        "qid",
        "vec_id",
        F.round(cosine(F.col("qvec"), F.col("vvec")), ROUND_DP).alias("cos"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("qid", "vec_id", "cos", "rn")
    )


def cosine_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "grid",
    dim: int | None = None,
) -> DataFrame:
    """(a, b, cos) for all pairs a<b with cosine >= threshold — EXACT
    under both methods.

    method="grid" (default): normalize to the unit sphere, where
    cos(u,v) >= t  ⇔  ||u-v|| <= sqrt(2-2t); candidates come from the
    exact eps-grid equi-join (operators/ann.py) — no CartesianProduct
    in the plan, zero recall loss. Pruning strength grows with the
    threshold (near-dup thresholds >= 0.9 prune hard).
    method="brute": the all-pairs theta join (plan-comparison path)."""
    if method == "grid":
        from efficient_graph_algorithms_spark.operators.ann import grid_candidate_pairs

        if dim is None:
            first = (
                vectors.where(F.col(vec_col).isNotNull())
                .select(vec_col)
                .first()
            )
            if first is None:  # empty input: empty result, brute-compatible
                return vectors.sparkSession.createDataFrame(
                    [], f"a {vectors.schema[id_col].dataType.simpleString()}, "
                        f"b {vectors.schema[id_col].dataType.simpleString()}, "
                        "cos double"
                )
            dim = len(first[0])
        # eps covers the ROUNDED-cosine acceptance boundary: the final
        # filter keeps rounded cos >= t, which admits true cosines down
        # to t - 0.5*10^-ROUND_DP — deriving eps from the raw t would
        # let such boundary pairs land outside the grid's candidate
        # radius and silently diverge from the brute method/oracle
        t_eff = threshold - 0.5 * 10.0 ** (-ROUND_DP)
        eps = float(np.sqrt(max(2.0 - 2.0 * t_eff, 1e-12)))
        # norm projected FIRST: referencing _norm(vec) inside the
        # transform lambda would re-evaluate the O(dim) aggregate per
        # element (O(dim^2)/row — same Catalyst-inlining trap as
        # dedup.shingles)
        unit = vectors.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).alias("_raw"),
            _norm(F.col(vec_col)).alias("_n"),
        ).select(
            "_id",
            "_raw",
            F.transform(
                F.col("_raw"), lambda x: x.cast("double") / F.col("_n")
            ).alias("_unit"),
        )
        cand = grid_candidate_pairs(
            unit, eps, n_proj=2, dim=dim, id_col="_id", vec_col="_unit"
        ).where(F.col("a") < F.col("b"))
        ids = unit.select("_id", "_raw")
        scored = (
            cand.select("a", "b")
            .join(ids.select(F.col("_id").alias("a"), F.col("_raw").alias("ra")), "a")
            .join(ids.select(F.col("_id").alias("b"), F.col("_raw").alias("rb")), "b")
            .select("a", "b", F.round(cosine(F.col("ra"), F.col("rb")), ROUND_DP).alias("cos"))
        )
        return scored.where(F.col("cos") >= threshold)
    a = vectors.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
    b = vectors.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("a") < F.col("b"))
        .select("a", "b", F.round(cosine(F.col("va"), F.col("vb")), ROUND_DP).alias("cos"))
        .where(F.col("cos") >= threshold)
    )


def rp_lsh_buckets(
    vectors: DataFrame,
    n_planes: int = 16,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH: (vec_id, bucket bigint). bucket bit i =
    sign(v · r_i) with r_i deterministic (hash-based) Rademacher
    vectors.

    NOTE: ann.multi_table_buckets implements the same sign-bucket
    scheme with DIFFERENT hash-stream constants (100+i here vs
    1000+t*n_planes there); both families are pinned by their own SQL
    oracles, so delegating one to the other would change published
    bucket values — the duplication is deliberate and frozen.

    Vectors in the same bucket are near-duplicate candidates;
    expected collision prob = (1 - theta/pi)^n_planes."""
    planes = [
        [1.0 if u >= 0.5 else -1.0 for u in uniform01(seed, np.arange(dim, dtype=np.uint64), stream=100 + i)]
        for i in range(n_planes)
    ]
    bucket = F.lit(0).cast("long")
    v = F.col(vec_col)
    for i, p in enumerate(planes):
        d = _dot(v, F.array(*[F.lit(x) for x in p]))
        bucket = bucket + F.when(d > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return vectors.select(F.col(id_col).alias("vec_id"), bucket.alias("bucket"))


def cosine_pairs_lsh(
    vectors: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scale path for near-dup pairs: bucket join → exact cosine verify.
    May miss pairs straddling buckets (recall < 1 by design — standard
    LSH trade-off; raise bands/lower n_planes for recall)."""
    b = rp_lsh_buckets(vectors, n_planes, dim, seed, id_col, vec_col)
    withb = vectors.join(b, vectors[id_col] == b["vec_id"]).select(
        b["vec_id"].alias("id"), F.col(vec_col).alias("v"), "bucket"
    )
    a = withb.select(F.col("id").alias("a"), F.col("v").alias("va"), "bucket")
    c = withb.select(F.col("id").alias("b"), F.col("v").alias("vb"), "bucket")
    return (
        a.join(c, "bucket")
        .where(F.col("a") < F.col("b"))
        .select("a", "b", F.round(cosine(F.col("va"), F.col("vb")), ROUND_DP).alias("cos"))
        .where(F.col("cos") >= threshold)
    )


def semantic_dedup(
    vectors: DataFrame,
    threshold: float = 0.95,
    n_centroids: int = 16,
    n_iter: int = 5,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): embedding-level
    semantic deduplication. Returns (vec_id, list_id, keep) — keep=0
    iff some LOWER-id vector in the same coarse cluster has cosine >=
    threshold (the deterministic keep-first rule; non-recursive, so the
    kept set is a pure function of the pair table and replayable in
    plain SQL).

    Scale shape — the SemDeDup trick: the exact pairwise cosine runs
    ONLY inside coarse k-means clusters (one equi-join keyed on
    list_id), so the quadratic term is bounded by cluster size, never
    corpus size; cross-cluster near-dups are missed BY DESIGN (the
    documented recall trade-off — raising n_centroids tightens cost and
    loosens recall). Cluster assignment is a pure scan-stage expression
    over broadcast centroid literals (operators/ann.py Lloyd quantizer,
    driver state = n_centroids x dim floats). n_centroids=1 is the
    exhaustive face: exact brute-force dedup, the SQL-oracle config.
    """
    from efficient_graph_algorithms_spark.operators.ann import (
        _ivf_assign_expr,
        ivf_centroids,
    )

    v = vectors.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v"))
    if n_centroids > 1:
        if centroids is None:
            try:
                centroids = ivf_centroids(
                    vectors, n_centroids, n_iter, seed, id_col, vec_col
                )
            except ValueError:
                # fewer vectors than centroids (tiny/empty corpus):
                # the quadratic bound the clustering buys is moot at
                # this size — fall back to the exhaustive face
                centroids = None
        assign = (
            _ivf_assign_expr(F.col("_v"), centroids)
            if centroids is not None
            else F.lit(0)
        )
    else:
        assign = F.lit(0)
    # `assigned` feeds BOTH self-join sides and the final keep join; the
    # centroid-assignment scan (n_centroids distance structs per row) is
    # the expensive part, so persist it once instead of recomputing it
    # three times per action (same motive as betweenness/walks; unlike
    # their internal loops this operator returns lazily, so the cache is
    # released by Spark's ContextCleaner when the caller drops the
    # result rather than by an explicit unpersist).
    assigned = v.select(
        "vec_id", "_v", assign.cast("long").alias("list_id")
    ).persist()
    a = assigned.select(
        F.col("vec_id").alias("a"), F.col("_v").alias("_va"), "list_id"
    )
    b = assigned.select(
        F.col("vec_id").alias("b"), F.col("_v").alias("_vb"), "list_id"
    )
    dropped = (
        a.join(b, "list_id")
        .where(F.col("a") < F.col("b"))
        .where(F.round(cosine(F.col("_va"), F.col("_vb")), ROUND_DP) >= threshold)
        .select(F.col("b").alias("vec_id"))
        .distinct()
        .withColumn("_drop", F.lit(1))
    )
    return assigned.join(dropped, "vec_id", "left").select(
        "vec_id",
        "list_id",
        F.when(F.col("_drop").isNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("keep"),
    )
