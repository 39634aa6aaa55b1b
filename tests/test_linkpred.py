"""Link prediction (Adamic–Adar / Jaccard) and local clustering
coefficient vs pure-Python oracles."""

from __future__ import annotations

import math
from itertools import combinations

import numpy as np

from efficient_graph_algorithms_spark.operators.linkpred import (
    link_prediction_topk,
    local_clustering,
)


def _random_edges(spark, n=50, m=300, seed=11):
    rng = np.random.default_rng(seed)
    pairs = {
        (int(a), int(b))
        for a, b in zip(rng.integers(0, n, m), rng.integers(0, n, m))
        if a != b
    }
    return spark.createDataFrame(sorted(pairs), "src long, dst long"), sorted(pairs)


def _und_adj(pairs):
    adj: dict[int, set[int]] = {}
    for s, d in pairs:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    return adj


def _linkpred_oracle(pairs, k, min_common, cap):
    adj = _und_adj(pairs)
    deg = {v: len(ns) for v, ns in adj.items()}
    scores: dict[tuple[int, int], tuple[int, float]] = {}
    for w, ns in adj.items():
        if deg[w] < 2 or (cap is not None and deg[w] > cap):
            continue
        for a, b in combinations(sorted(ns), 2):
            n, s = scores.get((a, b), (0, 0.0))
            scores[(a, b)] = (n + 1, s + 1.0 / math.log(deg[w]))
    rows = []
    for (a, b), (n, s) in scores.items():
        if n < min_common or b in adj[a]:
            continue
        jac = n / (deg[a] + deg[b] - n)
        rows.append((round(s, 9), a, b, n, round(jac, 9)))
    rows.sort(key=lambda r: (-r[0], r[1], r[2]))
    return [(a, b, n, aa, jac) for aa, a, b, n, jac in rows[:k]]


def test_linkpred_matches_oracle_uncapped(spark):
    edges, pairs = _random_edges(spark)
    out, info = link_prediction_topk(edges, k=15, min_common=2, degree_cap=None)
    got = [
        (r["a"], r["b"], r["n_common"], r["aa"], r["jaccard"]) for r in out.collect()
    ]
    assert got == _linkpred_oracle(pairs, 15, 2, None)
    assert info["n_capped_centers"] == 0


def test_linkpred_matches_oracle_with_cap(spark):
    edges, pairs = _random_edges(spark, seed=29)
    out, info = link_prediction_topk(edges, k=10, min_common=1, degree_cap=10)
    got = [
        (r["a"], r["b"], r["n_common"], r["aa"], r["jaccard"]) for r in out.collect()
    ]
    assert got == _linkpred_oracle(pairs, 10, 1, 10)
    deg = {v: len(ns) for v, ns in _und_adj(pairs).items()}
    assert info["n_capped_centers"] == sum(1 for d in deg.values() if d > 10)


def test_linkpred_never_returns_existing_edges(spark):
    edges, pairs = _random_edges(spark, seed=3)
    adj = _und_adj(pairs)
    out, _ = link_prediction_topk(edges, k=50, min_common=1, degree_cap=None)
    for r in out.collect():
        assert r["b"] not in adj[r["a"]]
        assert r["a"] < r["b"]


def test_linkpred_path_graph_closed_form(spark):
    # Path 0-1-2-3: candidates (0,2) and (1,3) via a degree-2 center
    # (aa = 1/ln 2), and (0,3) fails min_common=1? No — (0,3) has no
    # common neighbor at all. Jaccard: (0,2): 1/(1+2-1) = 0.5.
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "src long, dst long"
    )
    out, _ = link_prediction_topk(edges, k=10, min_common=1, degree_cap=None)
    got = {(r["a"], r["b"]): (r["n_common"], r["aa"], r["jaccard"]) for r in out.collect()}
    w = round(1.0 / math.log(2.0), 9)
    assert got == {(0, 2): (1, w, 0.5), (1, 3): (1, w, 0.5)}


def _lcc_oracle(pairs):
    adj = _und_adj(pairs)
    out = {}
    for v, ns in adj.items():
        d = len(ns)
        tri = sum(
            1 for a, b in combinations(sorted(ns), 2) if b in adj[a]
        )
        lcc = round(2.0 * tri / (d * (d - 1)), 9) if d >= 2 else 0.0
        out[v] = (d, tri, lcc)
    return out


def test_local_clustering_matches_oracle(spark):
    edges, pairs = _random_edges(spark, seed=41)
    got = {
        r["id"]: (r["deg"], r["triangles"], r["lcc"])
        for r in local_clustering(edges).collect()
    }
    assert got == _lcc_oracle(pairs)


def test_local_clustering_triangle_plus_pendant(spark):
    # Triangle 0-1-2 plus pendant 2-3: lcc(0)=lcc(1)=1, lcc(2)=1/3,
    # lcc(3)=0 (degree 1).
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (2, 3)], "src long, dst long"
    )
    got = {r["id"]: (r["deg"], r["triangles"], r["lcc"]) for r in local_clustering(edges).collect()}
    assert got == {
        0: (2, 1, 1.0),
        1: (2, 1, 1.0),
        2: (3, 1, round(1.0 / 3.0, 9)),
        3: (1, 0, 0.0),
    }
