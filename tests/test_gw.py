"""Gromov-Wasserstein discrepancy vs the dense NumPy mirror of the
reference loop (gromov_wasserstein_graphs.py:324-595, test protocol
scripts/experiments/test_gromov_wasserstein.py:44-60)."""

from __future__ import annotations

import numpy as np
import pytest

from efficient_graph_algorithms_spark.operators.gw import (
    gromov_wasserstein_discrepancy,
    gw_graph_matching,
)
from efficient_graph_algorithms_spark.oracle import numpy_oracle as oracle


def _ring_cost(n: int, noise_seed: int | None = None) -> np.ndarray:
    """Shortest-path cost matrix of an n-ring (+optional jitter)."""
    idx = np.arange(n)
    d = np.abs(idx[:, None] - idx[None, :])
    c = np.minimum(d, n - d).astype(np.float64)
    if noise_seed is not None:
        rng = np.random.default_rng(noise_seed)
        c = c + rng.uniform(0, 0.01, size=c.shape)
        c = (c + c.T) / 2
        np.fill_diagonal(c, 0.0)
    return c


def _to_coo(spark, m: np.ndarray):
    from pyspark.sql import functions as F  # noqa: F401

    rows = [
        (int(i), int(j), float(m[i, j]))
        for i in range(m.shape[0])
        for j in range(m.shape[1])
        if m[i, j] != 0.0
    ]
    return spark.createDataFrame(rows, "i long, j long, c double")


def _uniform_p(spark, n: int, col: str):
    return spark.createDataFrame(
        [(int(i), 1.0 / n) for i in range(n)], f"{col} long, p double"
    )


@pytest.mark.parametrize("n_s,n_t,beta", [(12, 12, 0.2), (10, 14, 0.1)])
def test_gw_discrepancy_matches_oracle(spark, n_s, n_t, beta):
    cs = _ring_cost(n_s, noise_seed=1)
    ct = _ring_cost(n_t, noise_seed=2)
    p_s = np.full(n_s, 1.0 / n_s)
    p_t = np.full(n_t, 1.0 / n_t)
    exp_trans, exp_dgw, exp_outer = oracle.gromov_wasserstein_discrepancy(
        cs, ct, p_s, p_t, beta=beta, outer_iter=8
    )
    trans, d_gw, info = gromov_wasserstein_discrepancy(
        spark,
        _to_coo(spark, cs),
        _to_coo(spark, ct),
        _uniform_p(spark, n_s, "i"),
        _uniform_p(spark, n_t, "j"),
        beta=beta,
        outer_iter=8,
    )
    assert info["outer_iterations"] == exp_outer
    got = np.zeros((n_s, n_t))
    for r in trans.collect():
        got[r["i"], r["j"]] = r["t"]
    assert np.allclose(got, exp_trans, atol=1e-9)
    assert abs(d_gw - exp_dgw) < 1e-9


def test_gw_matching_recovers_permutation(spark):
    """Matching a generic metric graph to a permuted copy of itself: the
    GW transport concentrates on the planted isomorphism and greedy
    assignment recovers it exactly. (A NOISELESS ring is deliberately
    avoided: its symmetry makes T0 = p·pᵀ a saddle point where the
    proximal loop stalls — the reference's own test protocol uses
    generic random point-cloud costs, test_gromov_wasserstein.py:49-66.)"""
    n = 10
    rng = np.random.default_rng(9)
    pts = rng.uniform(0, 1, size=(n, 3))
    c = np.abs(pts[:, None, :] - pts[None, :, :]).sum(-1)  # generic L1 metric
    perm = rng.permutation(n)
    ct = c[np.ix_(perm, perm)]
    m, d_gw = gw_graph_matching(
        spark,
        _to_coo(spark, c),
        _to_coo(spark, ct),
        _uniform_p(spark, n, "i"),
        _uniform_p(spark, n, "j"),
        beta=0.02,
        outer_iter=6,
        inner_iter=15,
        sk_bound=1e-2,
    )
    rows = m.collect()
    assert len(rows) == n
    assert len({r["src"] for r in rows}) == n and len({r["dst"] for r in rows}) == n
    inv = np.argsort(perm)
    assert {(r["src"], r["dst"]) for r in rows} == {(i, int(inv[i])) for i in range(n)}
    assert d_gw < 1e-3  # exact isomorphism → near-zero discrepancy


def test_fgw_fused_objective_matches_oracle(spark):
    """Fused GW: (1-a)<M,T> + a*GW — feature term steers the transport
    (reference objective fused_gromov_wasserstein.py:677-898, entropic
    solver)."""
    n_s, n_t, alpha = 10, 10, 0.5
    cs = _ring_cost(n_s, noise_seed=3)
    ct = _ring_cost(n_t, noise_seed=4)
    rng = np.random.default_rng(5)
    m = rng.uniform(0, 1, size=(n_s, n_t))
    p_s = np.full(n_s, 1.0 / n_s)
    p_t = np.full(n_t, 1.0 / n_t)
    exp_trans, exp_dgw, exp_outer = oracle.gromov_wasserstein_discrepancy(
        cs, ct, p_s, p_t, beta=0.1, outer_iter=6, inner_iter=20, sk_bound=5e-3,
        feature_cost=m, alpha=alpha
    )
    mdf = spark.createDataFrame(
        [(int(i), int(j), float(m[i, j])) for i in range(n_s) for j in range(n_t)],
        "i long, j long, m double",
    )
    trans, d_gw, info = gromov_wasserstein_discrepancy(
        spark,
        _to_coo(spark, cs),
        _to_coo(spark, ct),
        _uniform_p(spark, n_s, "i"),
        _uniform_p(spark, n_t, "j"),
        beta=0.1,
        outer_iter=6,
        inner_iter=20,
        sk_bound=5e-3,
        feature_cost=mdf,
        alpha=alpha,
    )
    assert info["outer_iterations"] == exp_outer
    got = np.zeros((n_s, n_t))
    for r in trans.collect():
        got[r["i"], r["j"]] = r["t"]
    assert np.allclose(got, exp_trans, atol=1e-9)
    assert abs(d_gw - exp_dgw) < 1e-9


def test_gw_barycenter_matches_oracle(spark):
    """2-graph barycenter, fixed 2 rounds — exact parity with the dense
    mirror of the reference loop (gromov_wasserstein_graphs.py:598-715)."""
    from efficient_graph_algorithms_spark.operators.gw import (
        gromov_wasserstein_barycenter,
    )

    n1, n2, nc = 8, 9, 6
    c1 = _ring_cost(n1, noise_seed=6)
    c2 = _ring_cost(n2, noise_seed=7)
    p1 = np.full(n1, 1.0 / n1)
    p2 = np.full(n2, 1.0 / n2)
    pc = np.full(nc, 1.0 / nc)
    kw = dict(beta=0.2, outer_iter=3, max_iter=2, cost_bound=1e-12)
    exp_bary, exp_tr, exp_rounds = oracle.gromov_wasserstein_barycenter(
        {0: c1, 1: c2}, {0: p1, 1: p2}, pc, **kw
    )
    pc_df = spark.createDataFrame(
        [(int(j), 1.0 / nc) for j in range(nc)], "j long, p double"
    )
    bary, tr, rounds = gromov_wasserstein_barycenter(
        spark,
        {0: _to_coo(spark, c1), 1: _to_coo(spark, c2)},
        {0: _uniform_p(spark, n1, "i"), 1: _uniform_p(spark, n2, "i")},
        pc_df,
        **kw,
    )
    got = np.zeros((nc, nc))
    for r in bary.collect():
        got[r["i"], r["j"]] = r["c"]
    assert np.allclose(got, exp_bary, atol=1e-9)
    assert len(rounds) == len(exp_rounds)
    for k in (0, 1):
        assert abs(rounds[-1][k] - exp_rounds[-1][k]) < 1e-9


def test_gw_update_p_matches_oracle_and_changes_fixed_point(spark):
    """update_p (reference update_distribution,
    gromov_wasserstein_graphs.py:72-105 applied at 563-572): parity of
    the transport AND the updated source distribution vs the mirror,
    on a case where the update measurably moves the fixed point."""
    from pyspark.sql import functions as F

    n_s, n_t = 10, 10
    cs = _ring_cost(n_s, noise_seed=5)
    ct = _ring_cost(n_t, noise_seed=6)
    # non-uniform source distribution so log(p) regularizer is active
    p_s = np.arange(1, n_s + 1, dtype=float)
    p_s = p_s / p_s.sum()
    p_t = np.full(n_t, 1.0 / n_t)

    extras: dict = {}
    exp_trans, exp_dgw, exp_outer = oracle.gromov_wasserstein_discrepancy(
        cs, ct, p_s, p_t, beta=0.2, outer_iter=5, iter_bound=0.0, sk_bound=0.0,
        inner_iter=5, update_p=True, lr=0.5, p_reg_weight=0.1, extras=extras,
    )
    # the update must actually change the result vs update_p=False
    base_trans, _, _ = oracle.gromov_wasserstein_discrepancy(
        cs, ct, p_s, p_t, beta=0.2, outer_iter=5, iter_bound=0.0, sk_bound=0.0,
        inner_iter=5,
    )
    assert np.abs(exp_trans - base_trans).sum() > 1e-6
    assert np.abs(extras["p_s"] - p_s).sum() > 1e-6

    ps_df = spark.createDataFrame(
        [(int(i), float(v)) for i, v in enumerate(p_s)], "i long, p double"
    )
    trans, d_gw, info = gromov_wasserstein_discrepancy(
        spark, _to_coo(spark, cs), _to_coo(spark, ct), ps_df,
        _uniform_p(spark, n_t, "j"), beta=0.2, outer_iter=5, iter_bound=0.0,
        sk_bound=0.0, inner_iter=5, update_p=True, lr=0.5, p_reg_weight=0.1,
    )
    got = np.zeros((n_s, n_t))
    for r in trans.collect():
        got[r["i"], r["j"]] = r["t"]
    assert np.allclose(got, exp_trans, atol=1e-9)
    assert d_gw == pytest.approx(exp_dgw, abs=1e-9)
    got_ps = np.zeros(n_s)
    for r in info["p_s"].collect():
        got_ps[r["i"]] = r["p"]
    assert np.allclose(got_ps, extras["p_s"], atol=1e-9)
