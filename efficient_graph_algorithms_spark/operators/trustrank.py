"""TrustRank and spam-mass estimation over the link graph.

Gyöngyi, Garcia-Molina & Pedersen 2004 ("Combating Web Spam with
TrustRank", public) and Gyöngyi et al. 2006 ("Link Spam Detection
Based on Mass Estimation", public): trust propagates from a
human-vetted seed set through the SAME damped random walk as PageRank,
i.e. TrustRank IS personalized PageRank with the seed set as the
teleport distribution — the engine composes its existing
``operators/pagerank.py`` loop (one wide shuffle per iteration,
invariant edge side persisted, checkpoint/resume, the blob-stamped
plan the scaling records measure) rather than duplicating it.

``spam_mass`` adds the 2006 paper's detection signal: with p = the
PageRank vector and t = the TrustRank vector (both probability
distributions), the relative spam mass m(v) = (p(v) - t(v)) / p(v)
estimates the fraction of v's rank collected through spam — near 1
for pages ranked without any trusted support, negative for pages with
more trusted support than total rank (the paper's well-trusted case).
p(v) > 0 always (the (1-alpha)/n teleport floor), so the ratio is
total. One extra join over the two rank tables; no new shuffles beyond
the two PageRank runs.

No reference counterpart (the reference is a graph library); web-tier
engine extension alongside HITS/SALSA (SURVEY §2.9).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from efficient_graph_algorithms_spark.operators.pagerank import pagerank


def trustrank(
    spark: SparkSession,
    edges: DataFrame,
    seeds: DataFrame,
    vertices: DataFrame | None = None,
    **pr_kwargs: Any,
) -> tuple[DataFrame, dict[str, Any]]:
    """TrustRank scores: personalized PageRank with the trusted seed
    set as the teleport distribution. ``seeds``: (id) or (id, p) —
    unweighted seeds get uniform teleport weight."""
    s = seeds if "p" in seeds.columns else seeds.select("id", F.lit(1.0).alias("p"))
    # seed hygiene: curated trust lists routinely contain pages absent
    # from the current crawl — pagerank normalizes the teleport mass
    # over ALL personalization rows but drops non-graph ids in the
    # join, so absent seeds would silently leak trust mass every
    # iteration; duplicate ids would duplicate vertex rows. Restrict
    # to the vertex set, combine duplicates, and refuse an empty set.
    v = (
        vertices
        if vertices is not None
        else edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    s = (
        s.join(v.select("id"), "id", "left_semi")
        .groupBy("id")
        .agg(F.sum("p").alias("p"))
    )
    if s.limit(1).count() == 0:
        raise ValueError("no trusted seeds present in the graph")
    return pagerank(spark, edges, vertices=vertices, personalization=s, **pr_kwargs)


def spam_mass(
    spark: SparkSession,
    edges: DataFrame,
    seeds: DataFrame,
    vertices: DataFrame | None = None,
    **pr_kwargs: Any,
) -> tuple[DataFrame, dict[str, Any]]:
    """(id, rank, trust, spam_mass): PageRank, TrustRank, and the
    relative spam mass (rank - trust) / rank per vertex.

    A caller-provided ``checkpoint_dir`` is split into per-run
    subdirectories: the checkpoint params (alpha, tol, n) do NOT stamp
    the personalization vector, so sharing one directory would let the
    TrustRank run resume from the plain run's snapshots — restoring
    the uniform teleport vector and silently zeroing spam_mass."""
    pr_kw = dict(pr_kwargs)
    tr_kw = dict(pr_kwargs)
    ckpt = pr_kwargs.get("checkpoint_dir")
    if ckpt:
        pr_kw["checkpoint_dir"] = f"{ckpt}/pagerank"
        tr_kw["checkpoint_dir"] = f"{ckpt}/trustrank"
    ranks, pr_info = pagerank(spark, edges, vertices=vertices, **pr_kw)
    trust, tr_info = trustrank(spark, edges, seeds, vertices=vertices, **tr_kw)
    out = (
        ranks.join(trust.withColumnRenamed("rank", "trust"), "id")
        .select(
            "id",
            "rank",
            "trust",
            ((F.col("rank") - F.col("trust")) / F.col("rank")).alias("spam_mass"),
        )
    )
    return out, {"pagerank": pr_info, "trustrank": tr_info}
