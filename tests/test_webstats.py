"""Whole-graph web statistics vs closed-form / NumPy oracles."""

from __future__ import annotations

import numpy as np

from efficient_graph_algorithms_spark.operators.webstats import web_stats


def test_closed_form_triangle_plus_tail(spark):
    # triangle {0,1,2} (one direction each) + reciprocal pair 3<->4
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (3, 4), (4, 3)], "src long, dst long"
    )
    stats, info = web_stats(spark, edges)
    r = stats.first()
    assert info["n_edges_directed"] == 5 and info["n_reciprocal"] == 2
    assert r.reciprocity == round(2 / 5, 9)
    # K3 degrees (2,2,2): one wedge per vertex = 3; pair degrees (1,1): 0
    assert info["triangles"] == 1 and info["wedges"] == 3
    assert r.clustering == 1.0  # 3 * 1 / 3
    # all K3 endpoint degrees are 2 and pair degrees are 1: corr is defined
    # and equals 1 (deg(u)==deg(v) on every edge)
    assert r.assortativity == 1.0


def test_random_graph_matches_numpy(spark):
    rng = np.random.default_rng(23)
    pairs = sorted(
        {
            (int(a), int(b))
            for a, b in zip(rng.integers(0, 80, 500), rng.integers(0, 80, 500))
            if a != b
        }
    )
    edges = spark.createDataFrame(pairs, "src long, dst long")
    stats, info = web_stats(spark, edges)
    r = stats.first()

    es = set(pairs)
    recip = sum(1 for (a, b) in es if (b, a) in es) / len(es)
    und = {tuple(sorted(p)) for p in es}
    deg: dict[int, int] = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    xs, ys = [], []
    for a, b in und:
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    assort = float(np.corrcoef(xs, ys)[0, 1])
    adj: dict[int, set[int]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    # und is canonical (a < b); requiring c > b counts each triangle once
    tri = sum(1 for a, b in und for c in (adj[a] & adj[b]) if c > b)
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    assert r.reciprocity == round(recip, 9)
    assert abs(r.assortativity - assort) < 1e-8
    assert info["triangles"] == tri and info["wedges"] == wedges
    assert r.clustering == round(3 * tri / wedges, 9)


def test_wedge_free_graph_null_clustering(spark):
    # perfect matching: no wedges, clustering undefined (NULL not 0)
    edges = spark.createDataFrame([(0, 1), (2, 3)], "src long, dst long")
    stats, info = web_stats(spark, edges)
    r = stats.first()
    assert info["wedges"] == 0 and r.clustering is None
    assert r.reciprocity == 0.0


def test_degree_powerlaw_matches_numpy(spark):
    import math

    from efficient_graph_algorithms_spark.operators.webstats import (
        degree_powerlaw,
    )

    rng = np.random.default_rng(5)
    pairs = sorted(
        {
            (int(a), int(b))
            for a, b in zip(rng.integers(0, 70, 300), rng.integers(0, 70, 300))
            if a != b
        }
    )
    edges = spark.createDataFrame(pairs, "src long, dst long")
    adj = {}
    for s, d in pairs:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    degs = [len(v) for v in adj.values()]
    for xmin in (2, 4):
        tail = [d for d in degs if d >= xmin]
        alpha = round(1.0 + len(tail) / sum(math.log(d / xmin) for d in tail), 6)
        row = degree_powerlaw(edges, xmin=xmin).first()
        assert (row["xmin"], row["n_tail"], row["alpha"]) == (xmin, len(tail), alpha)


def test_degree_powerlaw_degenerate_tails(spark):
    from efficient_graph_algorithms_spark.operators.webstats import (
        degree_powerlaw,
    )

    # star: center degree 3, leaves degree 1
    edges = spark.createDataFrame([(0, 1), (0, 2), (0, 3)], "src long, dst long")
    # all tail degrees equal xmin -> zero log-sum -> NULL alpha
    row = degree_powerlaw(edges, xmin=3).first()
    assert (row["n_tail"], row["alpha"]) == (1, None)
    # empty tail -> NULL alpha
    row = degree_powerlaw(edges, xmin=10).first()
    assert (row["n_tail"], row["alpha"]) == (0, None)
    try:
        degree_powerlaw(edges, xmin=0)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
