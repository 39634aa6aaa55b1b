"""k-step random walk + heat kernel diffusion vs NumPy oracles."""

from __future__ import annotations

import numpy as np

from efficient_graph_algorithms_spark.functions.hashing import uniform01
from efficient_graph_algorithms_spark.operators.kernels import (
    heat_kernel_diffusion,
    k_step_random_walk,
    one_hot_seeds,
)
from efficient_graph_algorithms_spark.oracle import numpy_oracle as oracle
from tests.test_graph_algorithms import er_graph, spark_edges, spark_vertices


def _field(n, seed=5):
    return uniform01(seed, np.arange(n, dtype=np.uint64))


def _collect(df, n):
    pd = df.toPandas().set_index("id")["value"]
    out = np.zeros(n)
    out[pd.index] = pd.to_numpy()
    return out


def test_k_step_random_walk(spark):
    n = 70
    edges = er_graph(n, 0.06, seed=21)
    f = _field(n)
    for k in (1, 2, 3):
        exp = oracle.k_step_random_walk(edges, n, f, k=k)
        fdf = spark.createDataFrame(
            [(i, float(v)) for i, v in enumerate(f)], "id long, value double"
        )
        got = _collect(k_step_random_walk(spark_edges(spark, edges), fdf, k=k), n)
        assert np.allclose(got, exp, atol=1e-9)


def test_k_step_from_one_hot_seed(spark):
    n = 50
    edges = er_graph(n, 0.08, seed=22)
    seeds = [3, 7]
    f = np.zeros(n)
    f[seeds] = 1.0
    exp = oracle.k_step_random_walk(edges, n, f, k=2)
    fdf = one_hot_seeds(spark_vertices(spark, n), seeds)
    got = _collect(k_step_random_walk(spark_edges(spark, edges), fdf, k=2), n)
    assert np.allclose(got, exp, atol=1e-9)


def test_heat_kernel_diffusion(spark):
    n = 60
    edges = er_graph(n, 0.07, seed=23)
    f = _field(n)
    exp = oracle.heat_kernel_diffusion(edges, n, f, t=0.3, k=4)
    fdf = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(f)], "id long, value double"
    )
    got = _collect(heat_kernel_diffusion(spark_edges(spark, edges), fdf, t=0.3, k=4), n)
    assert np.allclose(got, exp, atol=1e-9)


def test_heat_kernel_mass_behavior(spark):
    """On a regular-ish graph, diffusion preserves total mass to first
    order and smooths the field (variance decreases)."""
    n = 40
    edges = np.array([[i, (i + 1) % n] for i in range(n)])  # cycle
    f = np.zeros(n)
    f[0] = 1.0
    fdf = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(f)], "id long, value double"
    )
    got = _collect(heat_kernel_diffusion(spark_edges(spark, edges), fdf, t=0.2, k=6), n)
    exp = oracle.heat_kernel_diffusion(edges, n, f, t=0.2, k=6)
    assert np.allclose(got, exp, atol=1e-9)
    assert abs(got.sum() - 1.0) < 1e-6  # exp(-tL) preserves mass on L's kernel
    assert got.var() < f.var()


def test_heat_kernel_weighted(spark):
    """weight_col engages the weighted Laplacian (was silently ignored)."""
    n = 50
    edges = er_graph(n, 0.08, seed=24)
    w = uniform01(9, np.arange(len(edges), dtype=np.uint64)) + 0.5
    f = _field(n, seed=6)
    exp = oracle.heat_kernel_diffusion(edges, n, f, t=0.3, k=4, weights=w)
    edf = spark.createDataFrame(
        [(int(a), int(b), float(x)) for (a, b), x in zip(edges, w)],
        "src long, dst long, wt double",
    )
    fdf = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(f)], "id long, value double"
    )
    got = _collect(heat_kernel_diffusion(edf, fdf, t=0.3, k=4, weight_col="wt"), n)
    assert np.allclose(got, exp, atol=1e-9)
    exp_u = oracle.heat_kernel_diffusion(edges, n, f, t=0.3, k=4)
    assert not np.allclose(got, exp_u, atol=1e-6)  # weights actually matter
