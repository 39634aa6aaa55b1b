"""Weighted SSSP vs a pure-Python Dijkstra / bounded-hop oracle."""

from __future__ import annotations

import heapq
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from efficient_graph_algorithms_spark.operators.sssp import shortest_paths

from tests.test_graph_algorithms import er_graph


def _wedges(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long, w double")


def _src(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id long")


def py_dijkstra(rows, sources):
    adj = {}
    for s, d, w in rows:
        adj.setdefault(s, []).append((d, w))
    dist = {s: 0.0 for s in sources}
    pq = [(0.0, s) for s in sources]
    heapq.heapify(pq)
    while pq:
        dd, u = heapq.heappop(pq)
        if dd > dist.get(u, math.inf):
            continue
        for v, w in adj.get(u, []):
            nd = dd + w
            if nd < dist.get(v, math.inf):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


def py_bounded(rows, sources, r):
    dist = {s: 0.0 for s in sources}
    for _ in range(r):
        nxt = dict(dist)
        for s, d, w in rows:
            if s in dist and dist[s] + w < nxt.get(d, math.inf):
                nxt[d] = min(nxt.get(d, math.inf), dist[s] + w)
        dist = nxt
    return dist


def test_converges_to_dijkstra_on_random_graph(spark):
    n = 120
    rng = np.random.default_rng(17)
    base = er_graph(n, 0.05, seed=17)
    rows = [(int(s), int(d), float(1 + ((s * 7 + d) % 9))) for s, d in base]
    dist, info = shortest_paths(
        spark, _wedges(spark, rows), _src(spark, [0, 50])
    )
    assert info["converged"]
    got = {r["id"]: r["dist"] for r in dist.collect()}
    want = py_dijkstra(rows, [0, 50])
    assert got == pytest.approx(want)


def test_bounded_hops_contract(spark):
    """max_iter=r gives exactly min-cost-over-<=r-edge paths (the
    unrolled-oracle contract)."""
    rows = [(0, 1, 10.0), (0, 2, 1.0), (2, 3, 1.0), (3, 1, 1.0), (1, 4, 1.0)]
    for r in (1, 2, 3):
        with pytest.warns(UserWarning, match="max_iter"):
            dist, info = shortest_paths(
                spark, _wedges(spark, rows), _src(spark, [0]), max_iter=r
            )
        got = {x["id"]: x["dist"] for x in dist.collect()}
        assert got == pytest.approx(py_bounded(rows, [0], r))
        assert not info["converged"]


def test_unreachable_stay_absent_and_seed_zero(spark):
    rows = [(0, 1, 2.0), (5, 6, 1.0)]
    dist, info = shortest_paths(spark, _wedges(spark, rows), _src(spark, [0, 0]))
    got = {r["id"]: r["dist"] for r in dist.collect()}
    assert got == {0: 0.0, 1: 2.0}  # 5/6 unreached; duplicate seed deduped
    assert info["converged"]


def test_negative_weight_rejected(spark):
    rows = [(0, 1, -1.0)]
    with pytest.raises(ValueError, match="negative"):
        shortest_paths(spark, _wedges(spark, rows), _src(spark, [0]))


def test_shorter_path_wins_through_relaxation(spark):
    # direct expensive edge vs longer cheap chain
    rows = [(0, 9, 100.0)] + [(i, i + 1, 1.0) for i in range(9)]
    dist, _ = shortest_paths(spark, _wedges(spark, rows), _src(spark, [0]))
    got = {r["id"]: r["dist"] for r in dist.collect()}
    assert got[9] == 9.0
