"""Graph algorithms vs NumPy oracle (the reference's oracle pattern:
approximate vs brute force, allclose 1e-6 / exact —
reference scripts/experiments/test_spanning_trees.py:70-76)."""

from __future__ import annotations

import numpy as np
import pytest

from efficient_graph_algorithms_spark.functions.hashing import hash_u64, uniform01
from efficient_graph_algorithms_spark.oracle import numpy_oracle as oracle
from efficient_graph_algorithms_spark.operators.components import connected_components
from efficient_graph_algorithms_spark.operators.gather_scatter import integrate
from efficient_graph_algorithms_spark.operators.lpa import label_propagation
from efficient_graph_algorithms_spark.operators.pagerank import pagerank, top_k
from efficient_graph_algorithms_spark.operators.triangles import (
    triangle_count,
    triangles_per_vertex,
)


def er_graph(n: int, p: float, seed: int = 42, directed: bool = True) -> np.ndarray:
    """Deterministic Erdős–Rényi edges (mirrors reference's seeded
    random graph families, test/test_graph_kernels.py:7)."""
    idx = np.arange(n * n, dtype=np.uint64)
    u = uniform01(seed, idx, stream=11).reshape(n, n)
    a = u < p
    np.fill_diagonal(a, False)
    if not directed:
        a = np.triu(a)
    src, dst = np.nonzero(a)
    return np.stack([src, dst], axis=1).astype(np.int64)


def blobs_graph(k: int = 5, n: int = 40, seed: int = 42) -> tuple[np.ndarray, int]:
    """k disjoint ER blobs + isolated vertices (FIXTURES g_components)."""
    parts = []
    for b in range(k):
        e = er_graph(n, 0.15, seed=seed + b)
        parts.append(e + b * n)
    total = k * n + 10  # 10 isolated vertices
    return np.concatenate(parts), total


def spark_edges(spark, edges):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "src long, dst long"
    )


def spark_vertices(spark, n):
    return spark.range(n).withColumnRenamed("id", "id")


# --- gather-scatter (core primitive) ---------------------------------------

def test_integrate_matches_dense_matvec(spark):
    edges = er_graph(60, 0.1)
    n = 60
    w = uniform01(1, np.arange(len(edges), dtype=np.uint64))
    field = uniform01(2, np.arange(n, dtype=np.uint64))
    exp = oracle.integrate_graph_field(edges, w, field, n)
    e = spark.createDataFrame(
        [(int(a), int(b), float(x)) for (a, b), x in zip(edges, w)],
        "src long, dst long, weight double",
    )
    f = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(field)], "id long, value double"
    )
    got = integrate(e, f, weight_col="weight").toPandas().set_index("id")["value"]
    dense = np.zeros(n)
    dense[got.index] = got.to_numpy()
    assert np.allclose(dense, exp, atol=1e-9)


# --- PageRank ----------------------------------------------------------------

@pytest.mark.parametrize("n,p", [(80, 0.05), (150, 0.02)])
def test_pagerank_matches_oracle(spark, n, p):
    edges = er_graph(n, p)
    exp, exp_iters = oracle.pagerank(edges, n)
    ranks, info = pagerank(spark, spark_edges(spark, edges), vertices=spark_vertices(spark, n))
    got_pd = ranks.toPandas().set_index("id")["rank"]
    got = np.zeros(n)
    got[got_pd.index] = got_pd.to_numpy()
    assert info["converged"]
    assert info["iterations"] == exp_iters
    assert np.allclose(got, exp, atol=1e-6)
    assert abs(got.sum() - 1.0) < 1e-9


def test_pagerank_dangling_heavy(spark):
    # explicit dangling vertices: 0->1->2, 2 dangles; isolated 3
    edges = np.array([[0, 1], [1, 2]])
    exp, _ = oracle.pagerank(edges, 4)
    ranks, info = pagerank(spark, spark_edges(spark, edges), vertices=spark_vertices(spark, 4))
    got = ranks.toPandas().set_index("id")["rank"].reindex(range(4)).to_numpy()
    assert np.allclose(got, exp, atol=1e-6)


def test_personalized_pagerank(spark):
    n = 60
    edges = er_graph(n, 0.08, seed=3)
    pers = np.zeros(n)
    pers[5] = 1.0
    pers[17] = 2.0
    exp, _ = oracle.pagerank(edges, n, personalization=pers)
    pdf = spark.createDataFrame([(5, 1.0), (17, 2.0)], "id long, p double")
    ranks, _ = pagerank(
        spark, spark_edges(spark, edges), vertices=spark_vertices(spark, n), personalization=pdf
    )
    got = ranks.toPandas().set_index("id")["rank"].reindex(range(n), fill_value=0).to_numpy()
    assert np.allclose(got, exp, atol=1e-6)


def test_top_k(spark):
    n = 50
    edges = er_graph(n, 0.1, seed=9)
    exp, _ = oracle.pagerank(edges, n)
    ranks, _ = pagerank(spark, spark_edges(spark, edges), vertices=spark_vertices(spark, n))
    got_ids = [r["id"] for r in top_k(ranks, 5).collect()]
    order = np.lexsort((np.arange(n), -exp))
    assert got_ids == list(order[:5])


# --- Connected components ----------------------------------------------------

def test_components_exact(spark):
    edges, n = blobs_graph()
    exp = oracle.connected_components(edges, n)
    labels, info = connected_components(
        spark, spark_edges(spark, edges), vertices=spark_vertices(spark, n)
    )
    got = labels.toPandas().set_index("id")["component"].reindex(range(n)).to_numpy()
    assert np.array_equal(got, exp)


def test_components_path_graph(spark):
    # long path stresses pointer jumping
    n = 200
    edges = np.array([[i, i + 1] for i in range(n - 1)])
    exp = oracle.connected_components(edges, n)
    labels, info = connected_components(
        spark, spark_edges(spark, edges), vertices=spark_vertices(spark, n)
    )
    got = labels.toPandas().set_index("id")["component"].reindex(range(n)).to_numpy()
    assert np.array_equal(got, exp)
    assert (got == 0).all()
    assert info["rounds"] < 20  # log-ish, not linear


# --- k-core --------------------------------------------------------------------

def _kcore_map(labels_df):
    return {r["id"]: r["degree"] for r in labels_df.collect()}


def test_kcore_matches_oracle_to_fixpoint(spark):
    from efficient_graph_algorithms_spark.operators.kcore import k_core

    edges = er_graph(80, 0.06, seed=5)
    for k in (2, 3, 4):
        exp, _, exp_conv = oracle.k_core(edges, k)
        core, info = k_core(spark, spark_edges(spark, edges), k)
        assert info["converged"] is True and exp_conv is True
        got = _kcore_map(core)
        assert got == exp, f"k={k}"
        assert all(d >= k for d in got.values())


def test_kcore_bounded_rounds_match(spark):
    """max_iter=N equals the oracle's synchronous peel after exactly N
    rounds — the contract the unrolled-SQL driver oracle relies on."""
    from efficient_graph_algorithms_spark.operators.kcore import k_core

    edges = er_graph(80, 0.06, seed=5)
    for rounds in (1, 2):
        exp, _, _ = oracle.k_core(edges, 4, max_rounds=rounds)
        core, _ = k_core(spark, spark_edges(spark, edges), 4, max_iter=rounds)
        assert _kcore_map(core) == exp, f"rounds={rounds}"


def test_kcore_edge_cases(spark):
    from efficient_graph_algorithms_spark.operators.kcore import k_core

    # two triangles plus a pendant path hanging off one: the 2-core is
    # the triangles only — the path peels leaf-first over two rounds
    edges = np.array(
        [[0, 1], [1, 2], [2, 0], [2, 3], [3, 7], [4, 5], [5, 6], [6, 4]]
    )
    core, info = k_core(spark, spark_edges(spark, edges), 2)
    got = _kcore_map(core)
    assert set(got) == {0, 1, 2, 4, 5, 6}
    assert all(d == 2 for d in got.values())
    assert info["converged"] and info["rounds"] == 3  # peel, peel, no-op

    # k above the degeneracy: peels to empty
    core, info = k_core(spark, spark_edges(spark, edges), 3)
    assert core.count() == 0 and info["converged"]

    # k <= 1 keeps every non-isolated vertex, converging in one round
    core, info = k_core(spark, spark_edges(spark, edges), 1)
    assert core.count() == 8 and info["rounds"] == 1


# --- Label propagation --------------------------------------------------------

def test_lpa_matches_oracle_exactly(spark):
    edges, n = blobs_graph(k=3, n=30)
    max_iter = 7
    exp, exp_rounds = oracle.label_propagation(edges, n, max_iter=max_iter)
    labels, info = label_propagation(
        spark, spark_edges(spark, edges), vertices=spark_vertices(spark, n), max_iter=max_iter
    )
    got = labels.toPandas().set_index("id")["label"].reindex(range(n)).to_numpy()
    assert np.array_equal(got, exp)


def test_lpa_two_cliques(spark):
    # two 5-cliques joined by one edge: converges to two (or one) labels
    cl = [[i, j] for i in range(5) for j in range(i + 1, 5)]
    edges = np.array(cl + [[i + 5, j + 5] for i, j in cl] + [[4, 5]])
    n = 10
    exp, _ = oracle.label_propagation(edges, n, max_iter=10)
    labels, _ = label_propagation(
        spark, spark_edges(spark, edges), vertices=spark_vertices(spark, n), max_iter=10
    )
    got = labels.toPandas().set_index("id")["label"].reindex(range(n)).to_numpy()
    assert np.array_equal(got, exp)


# --- Triangles ----------------------------------------------------------------

def test_triangles_known_graphs(spark):
    # K4 has 4 triangles; C5 has 0
    k4 = np.array([[i, j] for i in range(4) for j in range(i + 1, 4)])
    c5 = np.array([[i, (i + 1) % 5] for i in range(5)])
    assert triangle_count(spark_edges(spark, k4)).first()["triangles"] == 4
    assert triangle_count(spark_edges(spark, c5)).first()["triangles"] == 0


def test_triangles_match_oracle(spark):
    n = 70
    edges = er_graph(n, 0.08, seed=5)
    exp_per, exp_total = oracle.triangle_counts(edges, n)
    e = spark_edges(spark, edges)
    assert triangle_count(e).first()["triangles"] == exp_total
    got = (
        triangles_per_vertex(e, vertices=spark_vertices(spark, n))
        .toPandas()
        .set_index("id")["triangles"]
        .reindex(range(n), fill_value=0)
        .to_numpy()
    )
    assert np.array_equal(got, exp_per)


# --- determinism / hashing ----------------------------------------------------

def test_hash_determinism():
    idx = np.arange(100, dtype=np.uint64)
    assert np.array_equal(hash_u64(42, idx), hash_u64(42, idx))
    assert not np.array_equal(hash_u64(42, idx), hash_u64(43, idx))
    u = uniform01(42, idx)
    assert (u >= 0).all() and (u < 1).all()


def test_betweenness_matches_brandes_oracle(spark):
    """Truncated-Brandes betweenness vs an exact pure-Python Brandes
    (BFS sigma counting + dependency accumulation with the deepest
    level's delta pinned to 0): radii 2 and 3, full and sampled
    sources, on a random 25-vertex digraph (symmetrized)."""
    from collections import defaultdict

    import numpy as np

    from efficient_graph_algorithms_spark.operators.betweenness import betweenness

    rng = np.random.default_rng(11)
    E = set()
    while len(E) < 60:
        a, b = rng.integers(0, 25, 2)
        if a != b:
            E.add((int(a), int(b)))
    E = sorted(E)

    def oracle(sources, R):
        adj = defaultdict(set)
        for a, b in E:
            adj[a].add(b)
            adj[b].add(a)
        bc = defaultdict(float)
        for s in sources:
            dist = {s: 0}
            sigma = {s: 1.0}
            levels = [[s]]
            for d in range(1, R + 1):
                nxt = defaultdict(float)
                for v in levels[d - 1]:
                    for w in adj[v]:
                        if w not in dist:
                            nxt[w] += sigma[v]
                if not nxt:
                    break
                for w, sg in nxt.items():
                    dist[w] = d
                    sigma[w] = sg
                levels.append(sorted(nxt))
            delta = defaultdict(float)
            for d in range(len(levels) - 2, 0, -1):
                for v in levels[d]:
                    for w in adj[v]:
                        if dist.get(w) == d + 1:
                            delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
                    bc[v] += delta[v]
        return {v: round(x, 6) for v, x in bc.items() if round(x, 6) > 0}

    edf = spark.createDataFrame(E, "src long, dst long")
    for R in (2, 3):
        for mod in (1, 5):
            srcs = sorted({v for e in E for v in e if v % mod == 0})
            sdf = spark.createDataFrame([(v,) for v in srcs], "id long")
            res, info = betweenness(spark, edf, sources=sdf, max_radius=R)
            got = {r["id"]: r["bc"] for r in res.collect()}
            exp = oracle(srcs, R)
            assert set(got) == set(exp), (R, mod)
            for k, v in exp.items():
                assert abs(got[k] - v) < 1e-9, (R, mod, k, got[k], v)
            assert info["rounds"] >= 1
