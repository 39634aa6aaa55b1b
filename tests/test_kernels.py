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


def test_damped_weighted_walk_matches_numpy(spark):
    """3 damped steps over a weighted transition vs dense NumPy."""
    import numpy as np

    from efficient_graph_algorithms_spark.operators.kernels import (
        damped_weighted_walk,
    )

    rng = np.random.default_rng(7)
    n = 40
    edges = sorted(
        {(int(a), int(b)) for a, b in zip(rng.integers(0, n, 160), rng.integers(0, n, 160)) if a != b}
    )
    wts = {e: 1 + (e[0] * 7 + e[1] * 13) % 5 for e in edges}
    edf = spark.createDataFrame(
        [(a, b, wts[(a, b)]) for a, b in edges], "src long, dst long, wt long"
    )
    ids = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(ids)}
    x0 = np.array([1.0 if v % 5 == 0 else 0.0 for v in ids])
    P = np.zeros((len(ids), len(ids)))
    for (a, b), w in wts.items():
        P[idx[a], idx[b]] = w
    row = P.sum(axis=1, keepdims=True)
    P = np.divide(P, row, out=np.zeros_like(P), where=row > 0)
    alpha = 0.85
    x = x0.copy()
    for _ in range(3):
        x = (1.0 - alpha) * x0 + alpha * (P.T @ x)

    field = spark.createDataFrame(
        [(v, 1.0 if v % 5 == 0 else 0.0) for v in ids], "id long, value double"
    )
    got = {
        r["id"]: r["value"]
        for r in damped_weighted_walk(edf, field, alpha=alpha, k=3, weight_col="wt").collect()
    }
    assert set(got) == set(ids)
    np.testing.assert_allclose(
        np.array([got[v] for v in ids]), x, rtol=0, atol=1e-12
    )


def test_damped_weighted_walk_uniform_matches_rw(spark):
    """weight_col=None at alpha=1 with one step equals one pure
    random-walk step (P identical to k_step_random_walk's)."""
    from efficient_graph_algorithms_spark.operators.kernels import (
        damped_weighted_walk,
        k_step_random_walk,
    )

    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (2, 0)], "src long, dst long"
    )
    field = spark.createDataFrame(
        [(0, 1.0), (1, 0.5), (2, 0.25)], "id long, value double"
    )
    a = {r["id"]: r["value"] for r in damped_weighted_walk(edges, field, alpha=1.0, k=1).collect()}
    b = {r["id"]: r["value"] for r in k_step_random_walk(edges, field, k=1).collect()}
    assert a == b
