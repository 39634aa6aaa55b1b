"""Warm-start (incremental-crawl) PageRank: init_ranks semantics.

The monthly-recrawl workflow: converge on crawl T, apply the snapshot
delta, warm-start crawl T+1 from the previous rank vector. The fixpoint
must be unchanged (the update map is a contraction with a unique fixed
point regardless of the start vector); only the iteration count drops.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from efficient_graph_algorithms_spark.operators.pagerank import pagerank

from tests.test_graph_algorithms import er_graph, spark_edges, spark_vertices


def _rank_vec(ranks, n):
    got = ranks.toPandas().set_index("id")["rank"]
    out = np.zeros(n)
    out[got.index] = got.to_numpy()
    return out


def test_warm_start_from_converged_is_instant(spark):
    n = 120
    edges = er_graph(n, 0.04, seed=7)
    e = spark_edges(spark, edges)
    v = spark_vertices(spark, n)
    cold, info0 = pagerank(spark, e, vertices=v, tol=1e-8)
    assert info0["converged"] and not info0["warm_start"]
    warm, info1 = pagerank(spark, e, vertices=v, tol=1e-8, init_ranks=cold)
    assert info1["warm_start"]
    # starting at the fixed point, the first delta is already < tol
    assert info1["converged"] and info1["iterations"] == 1
    assert np.allclose(_rank_vec(warm, n), _rank_vec(cold, n), atol=1e-10)


def test_warm_start_same_fixpoint_fewer_iterations(spark):
    """Perturb the graph (crawl delta), warm-start from the old ranks:
    same converged vector as a cold run, strictly fewer iterations."""
    n = 150
    old = er_graph(n, 0.03, seed=11)
    # the 'next crawl': drop ~5% of old edges, add a handful of new ones
    rng = np.random.default_rng(12)
    keep = rng.random(len(old)) >= 0.05
    added = er_graph(n, 0.002, seed=13)
    new = np.unique(np.vstack([old[keep], added]), axis=0)
    e_new = spark_edges(spark, new)
    v = spark_vertices(spark, n)
    prev, _ = pagerank(spark, spark_edges(spark, old), vertices=v, tol=1e-8)
    cold, ic = pagerank(spark, e_new, vertices=v, tol=1e-8)
    warm, iw = pagerank(spark, e_new, vertices=v, tol=1e-8, init_ranks=prev)
    assert ic["converged"] and iw["converged"]
    # a small crawl delta → the old vector is near the new fixpoint, so
    # the warm run needs fewer steps of the contraction than uniform
    assert iw["iterations"] < ic["iterations"]
    assert np.allclose(_rank_vec(warm, n), _rank_vec(cold, n), atol=1e-6)
    assert abs(_rank_vec(warm, n).sum() - 1.0) < 1e-9


def test_warm_start_scale_invariant_and_partial(spark):
    """init_ranks is renormalized (scaling it changes nothing) and may
    cover only part of the vertex set (new pages fall back to p)."""
    n = 100
    edges = er_graph(n, 0.05, seed=3)
    e = spark_edges(spark, edges)
    v = spark_vertices(spark, n)
    base = v.select("id", ((F.col("id") % 13) + 1.0).alias("rank"))
    partial = base.where(F.col("id") < 60)  # 40 vertices missing
    r1, i1 = pagerank(spark, e, vertices=v, tol=0.0, max_iter=3,
                      init_ranks=partial)
    r5, i5 = pagerank(spark, e, vertices=v, tol=0.0, max_iter=3,
                      init_ranks=partial.select("id", (F.col("rank") * 5.0).alias("rank")))
    assert i1["iterations"] == i5["iterations"] == 3
    assert np.allclose(_rank_vec(r1, n), _rank_vec(r5, n), atol=1e-12)


def test_warm_start_rejects_zero_mass(spark):
    n = 20
    edges = er_graph(n, 0.2, seed=1)
    zero = spark_vertices(spark, n).select("id", F.lit(0.0).alias("rank"))
    try:
        pagerank(spark, spark_edges(spark, edges), vertices=spark_vertices(spark, n),
                 init_ranks=zero, max_iter=2)
    except ValueError as exc:
        assert "positive total mass" in str(exc)
    else:
        raise AssertionError("zero-mass init_ranks must raise")
