"""DFGF low-rank diffusion integrator vs the NumPy mirror of the
reference factor chain (graph_diffusion_gf_integrator.py:57-95)."""

from __future__ import annotations

import numpy as np
import pytest

from efficient_graph_algorithms_spark.operators.dfgf import (
    _expm,
    dfgf_integrate,
    gaussian_rff_features,
)


def _numpy_dfgf(a, b, x, lam):
    bta = b.T @ a
    y = (_expm(lam * bta) - np.eye(a.shape[1])) @ np.linalg.inv(bta) @ (b.T @ x)
    return x + a @ y


def test_expm_against_series():
    rng = np.random.default_rng(3)
    x = rng.normal(scale=0.7, size=(6, 6))
    # reference: high-order Taylor at small norm via repeated squaring of exact series
    exp1 = _expm(x)
    # numerically: exp(x) = (exp(x/64))^64 with 30-term series
    y = x / 64.0
    s = np.eye(6); t = np.eye(6)
    for j in range(1, 30):
        t = t @ y / j
        s = s + t
    for _ in range(6):
        s = s @ s
    assert np.allclose(exp1, s, atol=1e-10)


def test_dfgf_matches_numpy_chain(spark):
    """Spark factor-chain == NumPy factor-chain on identical features."""
    n, m, dim = 200, 8, 3
    rng = np.random.default_rng(11)
    pts = rng.uniform(-1, 1, size=(n, dim))
    pdf = spark.createDataFrame(
        [(i, [float(x) for x in p]) for i, p in enumerate(pts)], "id long, vec array<double>"
    ).persist()
    af_df = gaussian_rff_features(pdf, m, sigma=1.5, dim=dim)
    bf_df = gaussian_rff_features(pdf, m, sigma=1.5, dim=dim, negate=True)
    af = np.zeros((n, m)); bf = np.zeros((n, m))
    for r in af_df.collect():
        af[r["id"]] = r["feat"]
    for r in bf_df.collect():
        bf[r["id"]] = r["feat"]
    x = rng.uniform(-1, 1, size=n)
    fdf = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(x)], "id long, value double"
    )
    exp = _numpy_dfgf(af, bf, x, lam=0.4)
    got_df = dfgf_integrate(af_df, bf_df, fdf, lambda_par=0.4, num_features=m).toPandas()
    got = np.zeros(n)
    got[got_df["id"]] = got_df["value"]
    pdf.unpersist()
    assert np.allclose(got, exp, atol=1e-6)


def test_dfgf_approximates_true_diffusion(spark):
    """End-to-end sanity: with enough features, the integrator tracks
    exp(lam*K) x where K is the Gaussian-kernel matrix the RFF features
    approximate (the reference's correctness notion at small N)."""
    # lam must keep lam*λmax(K) ~ O(1): λmax(K) ≈ 101 for these points,
    # so lam=0.02 → e^2 regime where rank-M error stays linear. (At
    # lam=0.3 the e^30 amplification makes ANY rank-64 factorization
    # diverge — that's the problem being ill-posed, not the operator.)
    n, m, dim = 120, 64, 2
    rng = np.random.default_rng(12)
    pts = rng.uniform(-0.5, 0.5, size=(n, dim))
    sigma, lam = 1.0, 0.02
    k = np.exp(-((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1) / (2 * sigma**2))
    x = rng.uniform(-1, 1, size=n)
    true = _expm(lam * k) @ x

    pdf = spark.createDataFrame(
        [(i, [float(v) for v in p]) for i, p in enumerate(pts)], "id long, vec array<double>"
    ).persist()
    # Gaussian kernel is symmetric: same paired cos/sin features on both
    # factor sides (see gaussian_rff_features docstring)
    af_df = gaussian_rff_features(pdf, m, sigma=sigma, dim=dim).persist()
    fdf = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(x)], "id long, value double"
    )
    got_df = dfgf_integrate(af_df, af_df, fdf, lambda_par=lam, num_features=m).toPandas()
    got = np.zeros(n)
    got[got_df["id"]] = got_df["value"]
    pdf.unpersist()
    rel = np.linalg.norm(got - true) / np.linalg.norm(true)
    assert rel < 0.1  # low-rank approximation quality, not exactness
