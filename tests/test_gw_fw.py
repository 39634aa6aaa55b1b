"""Frank-Wolfe / exact-EMD face of GW: LP optimality certificates and
exact parity of the distributed solver against the NumPy mirror
(reference optimization.py:245-416 `cg` + fused_gromov_wasserstein.py
gw_lp/fgw_lp/fgw_barycenters)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from efficient_graph_algorithms_spark.operators.emd import emd
from efficient_graph_algorithms_spark.oracle import numpy_oracle as oracle


# ---------------------------------------------------------------------------
# the LP kernel: optimality proven by duality, not by another solver
# ---------------------------------------------------------------------------

def test_emd_optimality_certificate():
    """Random instances: the returned plan satisfies the marginals and
    the returned duals certify optimality (feasible duals + complementary
    slackness + zero duality gap <=> optimal primal, LP strong duality)."""
    rng = np.random.default_rng(7)
    for _ in range(120):
        ns, nt = rng.integers(1, 10, 2)
        p = rng.random(ns) + 0.01
        p /= p.sum()
        q = rng.random(nt) + 0.01
        q /= q.sum()
        m = rng.random((ns, nt))
        t, cost, u, v = emd(p, q, m)
        assert np.allclose(t.sum(1), p, atol=1e-9)
        assert np.allclose(t.sum(0), q, atol=1e-9)
        assert (t >= -1e-12).all()
        red = m - u[:, None] - v[None, :]
        assert red.min() >= -1e-9  # dual feasibility
        if (t > 1e-12).any():
            assert np.abs(red[t > 1e-12]).max() < 1e-9  # compl. slackness
        assert abs(cost - (u @ p + v @ q)) < 1e-9  # zero duality gap


def test_emd_matches_independent_1d_value():
    """1D |x-y| cost: compare against the closed-form W1 integral of
    quantile functions — an independent exact value, no LP involved."""
    rng = np.random.default_rng(11)
    for _ in range(40):
        ns, nt = rng.integers(2, 11, 2)
        x = np.sort(rng.random(ns))
        y = np.sort(rng.random(nt))
        p = rng.random(ns) + 0.01
        p /= p.sum()
        q = rng.random(nt) + 0.01
        q /= q.sum()
        _, cost, _, _ = emd(p, q, np.abs(x[:, None] - y[None, :]))
        grid = np.unique(np.concatenate([np.cumsum(p), np.cumsum(q), [0.0]]))
        w1 = 0.0
        cp, cq = np.cumsum(p), np.cumsum(q)
        for a, b in zip(grid[:-1], grid[1:]):
            mid = (a + b) / 2
            xi = x[min(int(np.searchsorted(cp, mid, side="right")), ns - 1)]
            yi = y[min(int(np.searchsorted(cq, mid, side="right")), nt - 1)]
            w1 += (b - a) * abs(xi - yi)
        assert abs(cost - w1) < 1e-9


def test_emd_degenerate_and_unbalanced():
    p = np.array([0.5, 0.0, 0.5])  # zero-mass row
    q = np.array([0.25, 0.75])
    m = np.arange(6, dtype=float).reshape(3, 2)
    t, cost, u, v = emd(p, q, m)
    assert np.allclose(t.sum(1), p) and np.allclose(t.sum(0), q)
    with pytest.raises(ValueError):
        emd(np.array([0.7, 0.7]), q, np.zeros((2, 2)))


def test_emd_float_noise_marginals_stress():
    """Regression: subtraction noise in the NW-corner rule can leave
    pi a few ulp above qj at the LAST column; without the j == nt-1
    guard the corner walks off the marginal (IndexError). Irrational
    masses maximize the noise; feasibility + the duality certificate
    must hold at every size."""
    rng = np.random.default_rng(7)
    for ns, nt in [(3, 17), (17, 3), (23, 29), (40, 11)]:
        p = np.sqrt(rng.uniform(0.01, 1.0, ns))
        p /= p.sum()
        q = np.sqrt(rng.uniform(0.01, 1.0, nt))
        q /= q.sum()
        m = rng.uniform(0.0, 5.0, (ns, nt))
        t, cost, u, v = emd(p, q, m)
        assert np.allclose(t.sum(1), p, atol=1e-12)
        assert np.allclose(t.sum(0), q, atol=1e-12)
        red = m - u[:, None] - v[None, :]
        assert red.min() >= -1e-8  # dual feasibility
        assert abs((t * red).sum()) < 1e-8  # complementary slackness


# ---------------------------------------------------------------------------
# fixtures: small deterministic graphs (same arithmetic on both sides)
# ---------------------------------------------------------------------------

def _fixture(n_s=6, n_t=5):
    cs = np.zeros((n_s, n_s))
    ct = np.zeros((n_t, n_t))
    for i in range(n_s):
        for j in range(n_s):
            if i != j:
                cs[i, j] = ((i * 2 + j * 3) % 5) / 4.0
    cs = (cs + cs.T) / 2.0  # closed-form line search needs symmetry
    for i in range(n_t):
        for j in range(n_t):
            if i != j:
                ct[i, j] = ((i * 3 + j) % 7) / 6.0
    ct = (ct + ct.T) / 2.0
    p = (np.arange(n_s) + 2.0)
    p /= p.sum()
    q = (np.arange(n_t) + 1.0)
    q /= q.sum()
    return cs, ct, p, q


def _coo(spark, mat, cols):
    rows = [
        (int(i), int(j), float(mat[i, j]))
        for i, j in zip(*np.nonzero(mat))
    ]
    return spark.createDataFrame(rows, f"{cols[0]} long, {cols[1]} long, {cols[2]} double")


def _vec(spark, v, key):
    return spark.createDataFrame(
        [(int(i), float(x)) for i, x in enumerate(v)], f"{key} long, p double"
    )


def _gather_t(df, ns, nt):
    out = np.zeros((ns, nt))
    for r in df.collect():
        out[int(r["i"]), int(r["j"])] = float(r["t"])
    return out


# ---------------------------------------------------------------------------
# FW solver parity: Spark assemblies == dense mirror, iteration for iteration
# ---------------------------------------------------------------------------

def test_gw_lp_matches_numpy_mirror(spark):
    from efficient_graph_algorithms_spark.operators.gw_fw import gw_lp_transport

    cs, ct, p, q = _fixture()
    exp_t, exp_d, exp_used, exp_losses = oracle.gw_lp(
        cs, ct, p, q, max_iter=5, stop_thr=0.0, stop_thr2=0.0
    )
    got_df, d_gw, info = gw_lp_transport(
        spark,
        _coo(spark, cs, "ijc"),
        _coo(spark, ct, "ijc"),
        _vec(spark, p, "i"),
        _vec(spark, q, "j"),
        max_iter=5,
        stop_thr=0.0,
        stop_thr2=0.0,
    )
    got = _gather_t(got_df, 6, 5)
    assert info["iterations"] == exp_used
    assert np.allclose(got, exp_t, atol=1e-9)
    assert abs(d_gw - exp_d) < 1e-9
    # the engine's quadratic line-search evaluation == the mirror's full
    # re-evaluation (the documented algebraic identity)
    assert np.allclose(info["loss"], exp_losses, atol=1e-9)


def test_gw_lp_converges_and_stops(spark):
    from efficient_graph_algorithms_spark.operators.gw_fw import gw_lp_transport

    cs, ct, p, q = _fixture()
    exp_t, exp_d, exp_used, _ = oracle.gw_lp(cs, ct, p, q, max_iter=50)
    got_df, d_gw, info = gw_lp_transport(
        spark,
        _coo(spark, cs, "ijc"),
        _coo(spark, ct, "ijc"),
        _vec(spark, p, "i"),
        _vec(spark, q, "j"),
        max_iter=50,
    )
    assert info["iterations"] == exp_used < 50
    assert np.allclose(_gather_t(got_df, 6, 5), exp_t, atol=1e-9)
    assert abs(d_gw - exp_d) < 1e-9
    # marginals preserved through every FW step (convex combination of
    # feasible plans stays feasible)
    got = _gather_t(got_df, 6, 5)
    assert np.allclose(got.sum(1), p, atol=1e-9)
    assert np.allclose(got.sum(0), q, atol=1e-9)


def test_fgw_lp_fused_matches_mirror(spark):
    from efficient_graph_algorithms_spark.operators.gw_fw import gw_lp_transport

    cs, ct, p, q = _fixture()
    m = np.fromfunction(lambda i, j: ((i * 5 + j * 2) % 9) / 8.0, (6, 5))
    alpha = 0.4
    exp_t, exp_d, exp_used, exp_losses = oracle.gw_lp(
        cs, ct, p, q, reg=alpha, feature_cost=m, feature_weight=1.0 - alpha,
        max_iter=6, stop_thr=0.0, stop_thr2=0.0,
    )
    got_df, d_gw, info = gw_lp_transport(
        spark,
        _coo(spark, cs, "ijc"),
        _coo(spark, ct, "ijc"),
        _vec(spark, p, "i"),
        _vec(spark, q, "j"),
        reg=alpha,
        feature_cost=spark.createDataFrame(
            [(i, j, float(m[i, j])) for i in range(6) for j in range(5)],
            "i long, j long, m double",
        ),
        feature_weight=1.0 - alpha,
        max_iter=6,
        stop_thr=0.0,
        stop_thr2=0.0,
    )
    assert info["iterations"] == exp_used
    assert np.allclose(_gather_t(got_df, 6, 5), exp_t, atol=1e-9)
    assert abs(d_gw - exp_d) < 1e-9
    assert np.allclose(info["loss"], exp_losses, atol=1e-9)


# ---------------------------------------------------------------------------
# FGW barycenter with feature update
# ---------------------------------------------------------------------------

def test_fgw_barycenter_matches_mirror(spark):
    from efficient_graph_algorithms_spark.operators.gw_fw import fgw_barycenter

    n, d = 3, 2
    sizes = [4, 5]
    costs, feats, ps = [], [], []
    for g, ns in enumerate(sizes):
        c = np.zeros((ns, ns))
        for i in range(ns):
            for j in range(ns):
                if i != j:
                    c[i, j] = ((i + j * (g + 2)) % 4) / 3.0
        c = (c + c.T) / 2.0
        costs.append(c)
        feats.append(
            np.fromfunction(lambda i, k: ((i * 3 + k + g) % 5) / 4.0, (ns, d))
        )
        p = np.arange(1.0, ns + 1.0)
        ps.append(p / p.sum())
    p_c = np.array([0.5, 0.3, 0.2])
    init_c = np.fromfunction(lambda i, j: abs(i - j) / 2.0, (n, n))
    init_x = np.zeros((n, d))
    lambdas = [0.6, 0.4]
    alpha = 0.5

    exp_x, exp_c, exp_ts = oracle.fgw_barycenter(
        feats, costs, ps, p_c, lambdas, alpha, init_c, init_x,
        max_iter=3, tol=0.0, fw_iter=4,
    )

    feats_df = {
        k: spark.createDataFrame(
            [(i, kk, float(y[i, kk])) for i in range(y.shape[0]) for kk in range(d)],
            "i long, d long, y double",
        )
        for k, y in enumerate(feats)
    }
    costs_df = {k: _coo(spark, c, "ijc") for k, c in enumerate(costs)}
    ps_df = {k: _vec(spark, p, "i") for k, p in enumerate(ps)}
    x_df, c_df, t_dfs, info = fgw_barycenter(
        spark,
        feats_df,
        costs_df,
        ps_df,
        _vec(spark, p_c, "j"),
        lambdas={0: 0.6, 1: 0.4},
        alpha=alpha,
        init_c=_coo(spark, init_c, "ijc"),
        init_x=spark.createDataFrame(
            [(j, kk, float(init_x[j, kk])) for j in range(n) for kk in range(d)],
            "j long, d long, x double",
        ),
        max_iter=3,
        tol=0.0,
        fw_iter=4,
    )
    got_x = np.zeros((n, d))
    for r in x_df.collect():
        got_x[int(r["j"]), int(r["d"])] = float(r["x"])
    got_c = np.zeros((n, n))
    for r in c_df.collect():
        got_c[int(r["i"]), int(r["j"])] = float(r["c"])
    assert np.allclose(got_x, exp_x, atol=1e-9)
    assert np.allclose(got_c, exp_c, atol=1e-9)
    for k, exp_t in enumerate(exp_ts):
        got_t = _gather_t(t_dfs[k], sizes[k], n)
        assert np.allclose(got_t, exp_t, atol=1e-9)
    # the feature update actually moved X off its init
    assert np.abs(got_x - init_x).sum() > 1e-6
