"""Neighborhood function (ANF / HyperBall): exact mode vs a NumPy BFS
oracle, sketch mode vs exact mode, determinism, fixpoint contracts."""

from __future__ import annotations

import numpy as np
import pytest

from efficient_graph_algorithms_spark.operators.anf import neighborhood_function


def _random_edges(spark, n=120, m=420, seed=11):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    pairs = [(int(a), int(b)) for a, b in zip(src, dst) if a != b]
    return spark.createDataFrame(pairs, "src long, dst long"), pairs


def _bfs_ball_sizes(pairs, radius, directed=False):
    """{(v, r): |ball(v, r)|} for every vertex present in the graph."""
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set())
        if not directed:
            adj[b].add(a)
            adj.setdefault(a, set())
    out = {}
    for v in adj:
        ball = {v}
        for r in range(1, radius + 1):
            ball = ball | {w for u in ball for w in adj.get(u, ())}
            out[(v, r)] = len(ball)
    return out


def test_exact_matches_bfs(spark):
    edges, pairs = _random_edges(spark)
    res, info = neighborhood_function(spark, edges, max_radius=3, mode="exact")
    want = _bfs_ball_sizes(pairs, 3)
    got = {(r.id, r.r): r.nf for r in res.collect()}
    assert got == {k: v for k, v in want.items() if k[1] <= info["rounds"]}
    # totals are the per-round pair counts = sum of ball sizes
    per_round = {}
    for (v, r), nf in got.items():
        per_round[r] = per_round.get(r, 0) + nf
    assert info["totals"] == [per_round[r] for r in sorted(per_round)]


def test_exact_directed_and_sources(spark):
    # path 0 -> 1 -> 2 -> 3: out-balls shrink along the path
    edges = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], "src long, dst long")
    seeds = spark.createDataFrame([(0,), (3,)], "id long")
    res, info = neighborhood_function(
        spark, edges, max_radius=5, mode="exact", sources=seeds, directed=True
    )
    got = {(r.id, r.r): r.nf for r in res.collect()}
    assert got[(0, 1)] == 2 and got[(0, 2)] == 3 and got[(0, 3)] == 4
    assert got[(3, 1)] == 1  # sink: ball never grows
    assert info["converged"]
    assert info["rounds"] <= 4  # fixpoint at the path diameter


def test_exact_pinned_rounds_contract(spark):
    # stop_early=False keeps emitting fixpoint rows — one row per (v, r)
    edges = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    res, info = neighborhood_function(
        spark, edges, max_radius=4, mode="exact", stop_early=False
    )
    rows = res.collect()
    assert len(rows) == 3 * 4  # 3 vertices x 4 radii
    final = {r.id: r.nf for r in rows if r.r == 4}
    assert final == {0: 3, 1: 3, 2: 3}
    assert info["converged"]


def test_sketch_tracks_exact(spark):
    edges, pairs = _random_edges(spark, n=300, m=900, seed=5)
    res, info = neighborhood_function(
        spark, edges, max_radius=12, mode="sketch", registers=64
    )
    assert info["converged"]
    want = _bfs_ball_sizes(pairs, info["rounds"])
    rows = res.collect()
    rel = [
        abs(r.nf_est - want[(r.id, info["rounds"])]) / want[(r.id, info["rounds"])]
        for r in rows
    ]
    # HLL with m=64 registers: sigma ~ 1.04/sqrt(64) = 13%; allow 3 sigma
    assert float(np.mean(rel)) < 0.15
    assert float(np.max(rel)) < 0.40
    # harmonic centrality estimates are positive for non-isolated vertices
    assert all(r.harmonic_est > 0 for r in rows)
    assert info["effective_diameter_90"] <= info["rounds"]


def test_sketch_deterministic(spark):
    edges, _ = _random_edges(spark, n=80, m=240, seed=3)
    a, _ = neighborhood_function(spark, edges, max_radius=8, mode="sketch")
    b, _ = neighborhood_function(spark, edges, max_radius=8, mode="sketch")
    ra = sorted((r.id, r.nf_est, r.harmonic_est) for r in a.collect())
    rb = sorted((r.id, r.nf_est, r.harmonic_est) for r in b.collect())
    assert ra == rb


def test_validation(spark):
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError, match="mode"):
        neighborhood_function(spark, edges, mode="bogus")
    with pytest.raises(ValueError, match="registers"):
        neighborhood_function(spark, edges, mode="sketch", registers=48)


def _bfs_distances(pairs, radius, directed=False):
    """{v: {u: d(v,u)}} truncated at radius, excluding v itself."""
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set())
        if not directed:
            adj[b].add(a)
    dists = {}
    for v in adj:
        d = {v: 0}
        frontier = [v]
        for r in range(1, radius + 1):
            nxt = []
            for u in frontier:
                for w in adj.get(u, ()):
                    if w not in d:
                        d[w] = r
                        nxt.append(w)
            frontier = nxt
        dists[v] = {u: r for u, r in d.items() if r > 0}
    return dists


def test_truncated_closeness_matches_bfs(spark):
    from efficient_graph_algorithms_spark.operators.anf import truncated_closeness

    edges, pairs = _random_edges(spark, n=80, m=260, seed=3)
    res, info = truncated_closeness(spark, edges, max_radius=3)
    want = _bfs_distances(pairs, 3)
    got = {r.id: (r.n_reached, r.sum_dist, r.closeness) for r in res.collect()}
    assert set(got) == set(want)
    for v, dd in want.items():
        n, s = len(dd), sum(dd.values())
        cl = round(n / s, 6) if s else 0.0
        assert got[v] == (n, s, cl), v
    assert info["rounds"] <= 3 and info["frontier_sizes"][0] > 0


def test_truncated_closeness_sources_and_directed(spark):
    from efficient_graph_algorithms_spark.operators.anf import truncated_closeness

    # path 0 -> 1 -> 2 -> 3, directed: closeness differs per direction
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "src long, dst long"
    )
    srcs = spark.createDataFrame([(0,), (3,)], "id long")
    res, _ = truncated_closeness(
        spark, edges, max_radius=2, sources=srcs, directed=True
    )
    got = {r.id: (r.n_reached, r.sum_dist, r.closeness) for r in res.collect()}
    # 0 reaches 1 (d1) and 2 (d2); 3 reaches nothing downstream
    assert got == {0: (2, 3, round(2 / 3, 6)), 3: (0, 0, 0.0)}


def test_truncated_closeness_harmonic_face(spark):
    from efficient_graph_algorithms_spark.operators.anf import truncated_closeness

    edges, pairs = _random_edges(spark, n=70, m=220, seed=19)
    res, _ = truncated_closeness(spark, edges, max_radius=3, with_harmonic=True)
    want = _bfs_distances(pairs, 3)
    got = {r.id: (r.n_reached, r.harmonic) for r in res.collect()}
    assert set(got) == set(want)
    for v, dd in want.items():
        h = round(sum(1.0 / d for d in dd.values()), 6)
        assert got[v] == (len(dd), h), v
    # default schema unchanged (opt-in column)
    res2, _ = truncated_closeness(spark, edges, max_radius=2)
    assert res2.columns == ["id", "n_reached", "sum_dist", "closeness"]


def test_max_radius_must_be_positive(spark):
    import pytest

    from efficient_graph_algorithms_spark.operators.anf import (
        neighborhood_function,
    )

    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    for mode in ("exact", "sketch"):
        with pytest.raises(ValueError, match="max_radius"):
            neighborhood_function(spark, edges, max_radius=0, mode=mode)
