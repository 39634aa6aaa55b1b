"""k-truss: synchronous peel vs a sequential NumPy-set oracle
(fixpoint across k values, support values, pinned rounds, degenerates)."""

from __future__ import annotations

import numpy as np
import pytest

from efficient_graph_algorithms_spark.operators.ktruss import k_truss


def _numpy_ktruss(pairs, k):
    """Sequential peel oracle: (surviving canonical edges, their support)."""
    edges = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    while True:
        adj: dict[int, set[int]] = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        sup = {e: len(adj[e[0]] & adj[e[1]]) for e in edges}
        drop = {e for e, s in sup.items() if s < k - 2}
        if not drop:
            return edges, sup
        edges = edges - drop


def _random_pairs(n, m, seed):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    return [(int(a), int(b)) for a, b in zip(src, dst) if a != b]


@pytest.mark.parametrize("n,m,k,seed", [(60, 400, 4, 13), (60, 400, 5, 13), (100, 300, 3, 7), (30, 200, 6, 3)])
def test_fixpoint_matches_sequential_peel(spark, n, m, k, seed):
    pairs = _random_pairs(n, m, seed)
    edges = spark.createDataFrame(pairs, "src long, dst long")
    truss, info = k_truss(spark, edges, k)
    got = {(r.lo, r.hi): r.support for r in truss.collect()}
    want_edges, want_sup = _numpy_ktruss(pairs, k)
    assert set(got) == want_edges
    # at the fixpoint the stored support IS the support within the truss
    assert all(got[e] == want_sup[e] for e in got)
    assert info["converged"]
    assert info["truss_edges"] == len(want_edges)


def test_k2_is_whole_simple_graph(spark):
    edges = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (5, 6), (3, 3)], "src long, dst long"
    )
    truss, info = k_truss(spark, edges, 2)
    assert {(r.lo, r.hi, r.support) for r in truss.collect()} == {
        (0, 1, 0), (1, 2, 0), (5, 6, 0)
    }
    assert info["converged"] and info["rounds"] == 1


def test_pinned_rounds_is_prefix_of_peel(spark):
    # a triangle chain that cascades: pinned max_iter gives the graph
    # after exactly that many synchronous peels
    pairs = _random_pairs(40, 220, seed=21)
    edges = spark.createDataFrame(pairs, "src long, dst long")
    full, info_full = k_truss(spark, edges, 4)
    assert info_full["converged"]
    if info_full["rounds"] < 2:
        pytest.skip("peel converged too fast to pin")
    with pytest.warns(UserWarning, match="max_iter"):
        part, info_part = k_truss(spark, edges, 4, max_iter=1)
    assert not info_part["converged"]
    # one synchronous peel = drop all edges with support < 2 on the full set
    und = {tuple(sorted(p)) for p in pairs}
    adj: dict[int, set[int]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want1 = {e for e in und if len(adj[e[0]] & adj[e[1]]) >= 2}
    assert {(r.lo, r.hi) for r in part.collect()} == want1
    # and the truss is inside every intermediate peel
    assert {(r.lo, r.hi) for r in full.collect()} <= want1


def test_empty_and_triangle_free(spark):
    # star graph: every edge has support 0 — 3-truss is empty
    edges = spark.createDataFrame([(0, i) for i in range(1, 6)], "src long, dst long")
    truss, info = k_truss(spark, edges, 3)
    assert truss.count() == 0
    assert info["converged"] and info["truss_edges"] == 0


def test_validation(spark):
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError, match="k must be"):
        k_truss(spark, edges, 1)
