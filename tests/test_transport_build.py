"""ε-NN build, induced subgraph, greedy matching, DSD, Sinkhorn vs oracles."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from efficient_graph_algorithms_spark.functions.hashing import uniform01
from efficient_graph_algorithms_spark.operators.graph_build import (
    epsilon_nn_graph,
    greedy_matching,
    induced_subgraph,
)
from efficient_graph_algorithms_spark.operators.transport import (
    diffusion_state_distance,
    sinkhorn_distance,
)
from efficient_graph_algorithms_spark.oracle import numpy_oracle as oracle
from tests.test_graph_algorithms import er_graph, spark_edges


def test_epsilon_nn_graph(spark):
    n, d = 30, 3
    pts = uniform01(3, np.arange(n * d, dtype=np.uint64)).reshape(n, d)
    df = spark.createDataFrame(
        [(i, [float(x) for x in pts[i]]) for i in range(n)], "id long, vec array<double>"
    )
    eps = 0.5
    got = {(r["src"], r["dst"]): r["weight"] for r in epsilon_nn_graph(df, eps).collect()}
    dm = np.sqrt(((pts[:, None, :] - pts[None, :, :]) ** 2).sum(axis=2))
    exp = {(i, j) for i in range(n) for j in range(n) if i != j and dm[i, j] <= eps}
    assert set(got) == exp
    for (i, j), w in got.items():
        assert w == pytest.approx(dm[i, j], abs=1e-12)


def test_induced_subgraph(spark):
    e = spark_edges(spark, er_graph(40, 0.1, seed=2))
    subset = spark.createDataFrame([(i,) for i in range(0, 40, 2)], "id long")
    got = {(r["src"], r["dst"]) for r in induced_subgraph(e, subset).collect()}
    all_e = {(r["src"], r["dst"]) for r in e.collect()}
    exp = {(a, b) for a, b in all_e if a % 2 == 0 and b % 2 == 0}
    assert got == exp


def test_greedy_matching(spark):
    rows = [
        (0, 10, 5.0), (0, 11, 4.0),
        (1, 10, 6.0), (1, 12, 1.0),
        (2, 11, 3.0), (2, 12, 2.0),
    ]
    df = spark.createDataFrame(rows, "src long, dst long, score double")
    got = {(r["src"], r["dst"]) for r in greedy_matching(df).collect()}
    # greedy by score: (1,10,6) wins 10; 0 falls to (0,11,4) beating (2,11,3);
    # 2 takes (2,12,2)
    assert got == {(1, 10), (0, 11), (2, 12)}


def test_greedy_matching_empty(spark):
    df = spark.createDataFrame([], "src long, dst long, score double")
    assert greedy_matching(df).count() == 0


def test_diffusion_state_distance(spark):
    n = 40
    edges = er_graph(n, 0.1, seed=6)
    seeds = [0, 5, 9]
    exp = oracle.diffusion_state_distance(edges, n, seeds, k=3)
    got = {
        (r["a"], r["b"]): r["dsd"]
        for r in diffusion_state_distance(spark, spark_edges(spark, edges), seeds, k=3).collect()
    }
    assert set(got) == set(exp)
    for pair in exp:
        assert got[pair] == pytest.approx(exp[pair], abs=1e-9)


def test_dsd_disconnected_seeds(spark):
    # two disjoint edges: seeds in different components
    e = spark.createDataFrame([(0, 1), (2, 3)], "src long, dst long")
    got = {
        (r["a"], r["b"]): r["dsd"]
        for r in diffusion_state_distance(spark, e, [0, 2], k=2).collect()
    }
    exp = oracle.diffusion_state_distance(np.array([[0, 1], [2, 3]]), 4, [0, 2], k=2)
    assert got[(0, 2)] == pytest.approx(exp[(0, 2)], abs=1e-12)


def test_sinkhorn_distance(spark):
    n = 30
    edges = er_graph(n, 0.15, seed=8)
    mu = uniform01(1, np.arange(n, dtype=np.uint64))
    nu = uniform01(2, np.arange(n, dtype=np.uint64))
    mu, nu = mu / mu.sum(), nu / nu.sum()
    exp_d, exp_it = oracle.sinkhorn_distance(edges, n, mu, nu, n_iter=15)
    mu_df = spark.createDataFrame([(i, float(v)) for i, v in enumerate(mu)], "id long, m double")
    nu_df = spark.createDataFrame([(i, float(v)) for i, v in enumerate(nu)], "id long, m double")
    got_d, info = sinkhorn_distance(spark, spark_edges(spark, edges), mu_df, nu_df, n_iter=15)
    assert info["iterations"] == exp_it
    assert got_d == pytest.approx(exp_d, abs=1e-9)


def test_sinkhorn_self_distance_small(spark):
    """mu == nu → potentials symmetric, distance near the entropy floor
    (sanity: identical distributions give the minimal value among
    perturbations)."""
    n = 20
    edges = er_graph(n, 0.2, seed=9)
    mu = np.full(n, 1.0 / n)
    mu_df = spark.createDataFrame([(i, float(v)) for i, v in enumerate(mu)], "id long, m double")
    d_same, _ = sinkhorn_distance(spark, spark_edges(spark, edges), mu_df, mu_df, n_iter=10)
    exp_d, _ = oracle.sinkhorn_distance(edges, n, mu, mu, n_iter=10)
    assert d_same == pytest.approx(exp_d, abs=1e-9)


def _bary_dists(n: int, k: int, seed: int) -> np.ndarray:
    out = []
    for i in range(k):
        m = uniform01(seed + i, np.arange(n, dtype=np.uint64))
        out.append(m / m.sum())
    return np.stack(out)


def test_wasserstein_barycenter_parity(spark):
    """Exact-arithmetic parity of the Bregman projection loop vs the
    vectorized NumPy mirror of reference
    convolutional_barycenter.py:13-81."""
    from efficient_graph_algorithms_spark.operators.transport import wasserstein_barycenter

    n, k = 25, 3
    edges = er_graph(n, 0.18, seed=21)
    dists = _bary_dists(n, k, seed=31)
    exp_b, exp_it = oracle.wasserstein_barycenter(edges, n, dists, n_iter=8)
    ddf = spark.createDataFrame(
        [(ki, i, float(dists[ki, i])) for ki in range(k) for i in range(n)],
        "k int, id long, m double",
    )
    got, info = wasserstein_barycenter(
        spark, spark_edges(spark, edges), ddf, n_iter=8
    )
    assert info["iterations"] == exp_it
    gb = {r["id"]: r["b"] for r in got.collect()}
    for i in range(n):
        assert gb[i] == pytest.approx(exp_b[i], abs=1e-9)


def test_wasserstein_barycenter_weighted_and_identity(spark):
    """α-weighted barycenter parity; and with K identical inputs the
    barycenter converges toward that distribution's blurred fixed
    point (sanity: mass stays normalized under uniform areas)."""
    from efficient_graph_algorithms_spark.operators.transport import wasserstein_barycenter

    n, k = 20, 2
    edges = er_graph(n, 0.2, seed=22)
    dists = _bary_dists(n, k, seed=41)
    w = {0: 3.0, 1: 1.0}
    exp_b, exp_it = oracle.wasserstein_barycenter(
        edges, n, dists, alpha=np.array([3.0, 1.0]), n_iter=6
    )
    ddf = spark.createDataFrame(
        [(ki, i, float(dists[ki, i])) for ki in range(k) for i in range(n)],
        "k int, id long, m double",
    )
    got, info = wasserstein_barycenter(
        spark, spark_edges(spark, edges), ddf, weights=w, n_iter=6
    )
    assert info["iterations"] == exp_it
    gb = {r["id"]: r["b"] for r in got.collect()}
    for i in range(n):
        assert gb[i] == pytest.approx(exp_b[i], abs=1e-9)


def test_wasserstein_barycenter_normalized_kernel(spark):
    """normalization=True (reference's K(x)/K(1) option) parity."""
    from efficient_graph_algorithms_spark.operators.transport import wasserstein_barycenter

    n, k = 15, 2
    edges = er_graph(n, 0.25, seed=23)
    dists = _bary_dists(n, k, seed=51)
    exp_b, exp_it = oracle.wasserstein_barycenter(
        edges, n, dists, n_iter=5, normalization=True
    )
    ddf = spark.createDataFrame(
        [(ki, i, float(dists[ki, i])) for ki in range(k) for i in range(n)],
        "k int, id long, m double",
    )
    got, info = wasserstein_barycenter(
        spark, spark_edges(spark, edges), ddf, n_iter=5, normalization=True
    )
    assert info["iterations"] == exp_it
    gb = {r["id"]: r["b"] for r in got.collect()}
    for i in range(n):
        assert gb[i] == pytest.approx(exp_b[i], abs=1e-9)
