"""Maximal independent set vs an exact pure-Python round mirror."""

from __future__ import annotations

import numpy as np

from efficient_graph_algorithms_spark.functions.hashing import md5_60bit
from efficient_graph_algorithms_spark.operators.mis import (
    maximal_independent_set,
)


def _random_edges(spark, n=80, m=400, seed=7):
    rng = np.random.default_rng(seed)
    pairs = {
        (int(a), int(b))
        for a, b in zip(rng.integers(0, n, m), rng.integers(0, n, m))
        if a != b
    }
    return spark.createDataFrame(sorted(pairs), "src long, dst long"), sorted(pairs)


def _mirror(pairs, max_rounds=100):
    adj: dict[int, set[int]] = {}
    for s, d in pairs:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    p = {v: md5_60bit(f"mis:{v}") for v in adj}
    state = {v: ("live", 0) for v in adj}
    for r in range(1, max_rounds + 1):
        live = {v for v, (c, _) in state.items() if c == "live"}
        if not live:
            break
        winners = {
            v
            for v in live
            if all(
                (p[v], v) < (p[u], u) for u in adj[v] if u in live
            )
        }
        removed = {u for v in winners for u in adj[v] if u in live} - winners
        for v in winners:
            state[v] = ("mis", r)
        for v in removed:
            state[v] = ("out", r)
    return state


def test_mis_matches_mirror_exactly(spark):
    edges, pairs = _random_edges(spark)
    out, info = maximal_independent_set(spark, edges)
    got = {r["id"]: (r["cls"], r["round"]) for r in out.collect()}
    assert got == _mirror(pairs)
    assert info["converged"]


def test_mis_independent_and_maximal(spark):
    edges, pairs = _random_edges(spark, n=60, m=250, seed=31)
    out, _ = maximal_independent_set(spark, edges)
    cls = {r["id"]: r["cls"] for r in out.collect()}
    mis = {v for v, c in cls.items() if c == "mis"}
    adj: dict[int, set[int]] = {}
    for s, d in pairs:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    # independence: no edge inside the set
    assert not any(u in mis and v in mis for u, v in pairs)
    # maximality: every non-member has a member neighbor
    for v, c in cls.items():
        if c != "mis":
            assert adj[v] & mis, v
    # every vertex decided
    assert set(cls.values()) <= {"mis", "out"}


def test_mis_path_graph_closed_form(spark):
    # Path 0-1-2-3-4: winners/rounds follow the (hash, id) order exactly.
    pairs = [(0, 1), (1, 2), (2, 3), (3, 4)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    out, info = maximal_independent_set(spark, edges)
    got = {r["id"]: (r["cls"], r["round"]) for r in out.collect()}
    assert got == _mirror(pairs)
    assert info["converged"]


def test_mis_isolated_vertices_join_round_one(spark):
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    vertices = spark.createDataFrame([(0,), (1,), (9,)], "id long")
    out, _ = maximal_independent_set(spark, edges, vertices=vertices)
    got = {r["id"]: (r["cls"], r["round"]) for r in out.collect()}
    assert got[9] == ("mis", 1)
    assert {got[0][0], got[1][0]} == {"mis", "out"}
