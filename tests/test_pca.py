"""Distributed PCA: moments/eigen parity vs direct NumPy, projection
round-trip, and edge cases."""

from __future__ import annotations

import numpy as np
import pytest

from efficient_graph_algorithms_spark.operators.pca import (
    gram_matrix,
    pca_fit,
    project,
)


def _emb_df(spark, x):
    rows = [(int(i), [float(v) for v in row]) for i, row in enumerate(x)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _fixture(n=120, d=12, seed=3):
    rng = np.random.default_rng(seed)
    # anisotropic data so the spectrum is well-separated
    basis = rng.normal(size=(d, d))
    scales = np.linspace(3.0, 0.2, d)
    x = rng.normal(size=(n, d)) * scales @ basis
    # float32 round-trip: the engine reads array<float>
    return x.astype(np.float32).astype(np.float64)


def test_gram_matches_numpy(spark):
    x = _fixture()
    got = {(r["i"], r["j"]): r["g"] for r in gram_matrix(_emb_df(spark, x)).collect()}
    want = x.T @ x
    for (i, j), g in got.items():
        assert abs(g - want[i, j]) < 1e-8 * max(1.0, abs(want[i, j]))
    assert len(got) == x.shape[1] ** 2


def test_pca_fit_matches_direct_eigh(spark):
    x = _fixture()
    k = 5
    model = pca_fit(_emb_df(spark, x), k=k)
    mean = x.mean(axis=0)
    cov = (x - mean).T @ (x - mean) / (len(x) - 1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    assert np.allclose(model["mean"], mean, atol=1e-9)
    assert np.allclose(model["explained_variance"], evals[order], rtol=1e-9)
    assert np.allclose(
        model["explained_variance_ratio"], evals[order] / evals.sum(), rtol=1e-9
    )
    # components match up to sign; the model's sign convention makes the
    # comparison deterministic after applying it to the direct result
    direct = evecs[:, order].T
    for r in range(k):
        m = np.argmax(np.abs(direct[r]))
        if direct[r, m] < 0:
            direct[r] = -direct[r]
    assert np.allclose(model["components"], direct, atol=1e-8)


def test_projection_matches_numpy_and_decorrelates(spark):
    x = _fixture()
    k = 4
    df = _emb_df(spark, x)
    model = pca_fit(df, k=k)
    got = {r["vec_id"]: np.array(r["proj"]) for r in project(df, model).collect()}
    p = np.stack([got[i] for i in range(len(x))])
    want = (x - model["mean"]) @ model["components"].T
    assert np.allclose(p, want, atol=1e-8)
    # projected covariance is diagonal with the explained variances
    pc = p.T @ p / (len(x) - 1)
    assert np.allclose(np.diag(pc), model["explained_variance"], rtol=1e-6)
    off = pc - np.diag(np.diag(pc))
    assert np.max(np.abs(off)) < 1e-6 * np.max(np.diag(pc))


def test_uncentered_and_validation(spark):
    x = _fixture(n=40, d=6)
    df = _emb_df(spark, x)
    model = pca_fit(df, k=2, center=False)
    g = x.T @ x / (len(x) - 1)
    evals = np.sort(np.linalg.eigvalsh(g))[::-1]
    assert np.allclose(model["explained_variance"], evals[:2], rtol=1e-9)
    assert np.allclose(model["mean"], 0.0)
    with pytest.raises(ValueError):
        pca_fit(df, k=0)
    with pytest.raises(ValueError):
        pca_fit(df, k=7)


def test_null_vectors_skipped(spark):
    x = _fixture(n=30, d=5)
    rows = [(int(i), [float(v) for v in row]) for i, row in enumerate(x)]
    rows.append((999, None))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    model = pca_fit(df, k=2)
    assert model["n"] == 30
    got = project(df, model).collect()
    assert {r["vec_id"] for r in got} == set(range(30))  # null row dropped
