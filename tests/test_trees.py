"""Tree-GFI 2-pass DP + Borůvka MST vs NumPy oracles
(reference semantics: trees.py:93-125, spanning_trees.py:98-124,
test protocol of scripts/experiments/test_spanning_trees.py:70-76)."""

from __future__ import annotations

import numpy as np

from efficient_graph_algorithms_spark.operators.trees import (
    boruvka_mst,
    mst_as_rooted_tree,
    tree_depths,
    tree_gfi_matvec,
)
from efficient_graph_algorithms_spark.oracle import numpy_oracle as oracle
from tests.test_graph_algorithms import er_graph


def random_tree(n: int, seed: int) -> dict[int, tuple[int, float]]:
    """Random rooted tree: parent(i) uniform in [0, i), weight in (0.1, 1.1)."""
    rng = np.random.default_rng(seed)
    return {
        i: (int(rng.integers(0, i)), float(rng.uniform(0.1, 1.1)))
        for i in range(1, n)
    }


def _matvec_case(spark, n, seed, a):
    parents = random_tree(n, seed)
    rng = np.random.default_rng(seed + 1)
    field = rng.uniform(-1, 1, size=n)
    exp = oracle.tree_gfi_matvec(parents, n, field, a=a)

    tree = spark.createDataFrame(
        [(c, p, w) for c, (p, w) in parents.items()], "id long, parent long, w double"
    )
    fdf = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(field)], "id long, value double"
    )
    twd = tree_depths(tree, root=0)
    got_df = tree_gfi_matvec(twd, fdf, a=a).toPandas().set_index("id")["value"]
    got = np.zeros(n)
    got[got_df.index] = got_df.to_numpy()
    assert np.allclose(got, exp, atol=1e-6), np.abs(got - exp).max()


def test_tree_gfi_matvec_random_trees(spark):
    for seed, a in ((31, -0.8), (32, -1.5), (33, -0.3)):
        _matvec_case(spark, 60, seed, a)


def test_tree_gfi_matvec_path_and_star(spark):
    # path graph: parent(i) = i-1; star: parent(i) = 0
    n = 30
    field = np.linspace(-1, 1, n)
    for parents in (
        {i: (i - 1, 0.5) for i in range(1, n)},
        {i: (0, 0.25 + 0.01 * i) for i in range(1, n)},
    ):
        exp = oracle.tree_gfi_matvec(parents, n, field, a=-1.0)
        tree = spark.createDataFrame(
            [(c, p, w) for c, (p, w) in parents.items()], "id long, parent long, w double"
        )
        fdf = spark.createDataFrame(
            [(i, float(v)) for i, v in enumerate(field)], "id long, value double"
        )
        got_df = tree_gfi_matvec(tree_depths(tree, root=0), fdf, a=-1.0).toPandas()
        got = np.zeros(n)
        got[got_df["id"]] = got_df["value"]
        assert np.allclose(got, exp, atol=1e-6)


def test_boruvka_mst_matches_kruskal(spark):
    n = 80
    edges = er_graph(n, 0.08, seed=41)
    rng = np.random.default_rng(42)
    w = rng.uniform(0.1, 5.0, size=len(edges))
    ew = [(int(a), int(b), float(x)) for (a, b), x in zip(edges, w)]
    exp = oracle.kruskal_mst(ew, n)
    df = spark.createDataFrame(ew, "src long, dst long, w double")
    mst, info = boruvka_mst(spark, df)
    got = {(r["src"], r["dst"], round(r["w"], 9)) for r in mst.collect()}
    assert got == {(s, d, round(x, 9)) for s, d, x in exp}
    assert info["converged"]


def test_boruvka_mst_duplicate_weights(spark):
    """Lexicographic tie-break keeps Borůvka == Kruskal with ties."""
    n = 40
    edges = er_graph(n, 0.12, seed=43)
    w = [0.5 + (i % 3) * 0.25 for i in range(len(edges))]  # many duplicates
    ew = [(int(a), int(b), float(x)) for (a, b), x in zip(edges, w)]
    exp = oracle.kruskal_mst(ew, n)
    df = spark.createDataFrame(ew, "src long, dst long, w double")
    mst, _ = boruvka_mst(spark, df)
    got = {(r["src"], r["dst"], round(r["w"], 9)) for r in mst.collect()}
    assert got == {(s, d, round(x, 9)) for s, d, x in exp}


def test_mst_tree_gfi_end_to_end(spark):
    """The reference's num_trees=1 spanning-tree integrator: MST →
    rooted tree → exact exp-kernel matvec (spanning_trees.py:80-96)."""
    n = 50
    edges = er_graph(n, 0.1, seed=44)
    rng = np.random.default_rng(45)
    w = rng.uniform(0.2, 2.0, size=len(edges))
    ew = [(int(a), int(b), float(x)) for (a, b), x in zip(edges, w)]
    df = spark.createDataFrame(ew, "src long, dst long, w double")
    mst, _ = boruvka_mst(spark, df)
    rooted = mst_as_rooted_tree(spark, mst, root=0)

    rows = rooted.collect()
    assert len(rows) > 0
    parents = {r["id"]: (r["parent"], r["w"]) for r in rows}
    covered = sorted({r["id"] for r in rows} | {0})
    # restrict to the component of the root
    remap = {v: i for i, v in enumerate(covered)}
    m = len(covered)
    parents_c = {remap[c]: (remap[p], w) for c, (p, w) in parents.items()}
    field = np.linspace(0.5, 1.5, m)
    exp = oracle.tree_gfi_matvec(parents_c, m, field, a=-1.0)

    fdf = spark.createDataFrame(
        [(v, float(field[remap[v]])) for v in covered], "id long, value double"
    )
    got_df = tree_gfi_matvec(rooted, fdf, a=-1.0, root=0).toPandas()
    got = np.zeros(m)
    for _, r in got_df.iterrows():
        got[remap[int(r["id"])]] = r["value"]
    assert np.allclose(got, exp, atol=1e-6)


def _connected_weighted_graph(n: int, p: float, seed: int):
    """ER graph + ring backbone (guaranteed connected), seeded weights."""
    rng = np.random.default_rng(seed)
    edges = {(int(a), int(b)) for a, b in er_graph(n, p, seed=seed)}
    edges |= {(i, (i + 1) % n) for i in range(n)}
    ew = sorted((a, b) if a < b else (b, a) for a, b in edges)
    ew = sorted(set(ew))
    return [(a, b, float(rng.uniform(0.3, 2.0))) for a, b in ew]


def test_frt_tree_matches_oracle(spark):
    """Spark's Pareto-frontier FRT == the direct-definition NumPy mirror
    (same seeded π/β, exact Dijkstra) — node-for-node, weight-for-weight."""
    from efficient_graph_algorithms_spark.operators.trees import frt_tree

    for seed, n, p in ((21, 30, 0.15), (22, 40, 0.1)):
        ew = _connected_weighted_graph(n, p, seed)
        exp_rows, exp_root = oracle.frt_tree(ew, n, seed=seed)
        df = spark.createDataFrame(ew, "src long, dst long, w double")
        tree, info = frt_tree(spark, df, seed=seed)
        got = {
            (r["id"], r["parent"], round(r["w"], 9), r["depth"]) for r in tree.collect()
        }
        assert info["root"] == exp_root
        assert got == {(i, pa, round(w, 9), d) for i, pa, w, d in exp_rows}


def test_frt_tree_fails_loudly_when_max_hops_exhausted(spark):
    """A hop-diameter larger than max_hops must raise, not silently use a
    half-relaxed eccentricity/frontier (under-estimated r_max would
    truncate the decomposition without any signal)."""
    import pytest

    from efficient_graph_algorithms_spark.operators.trees import frt_tree

    path = [(i, i + 1, 1.0) for i in range(8)]  # hop-diameter 8 > max_hops
    df = spark.createDataFrame(path, "src long, dst long, w double")
    with pytest.raises(ValueError, match="fixpoint"):
        frt_tree(spark, df, seed=7, max_hops=3)


def test_frt_tree_dominates_graph_metric(spark):
    """FRT tree distances dominate the graph metric (dist_T >= dist_G)
    — the defining low-stretch-embedding property."""
    import heapq

    from efficient_graph_algorithms_spark.operators.trees import frt_tree

    n, seed = 24, 23
    ew = _connected_weighted_graph(n, 0.15, seed)
    adj = {v: [] for v in range(n)}
    for s, t, w in ew:
        adj[s].append((t, w)); adj[t].append((s, w))

    def dij(s):
        dist = {v: float("inf") for v in range(n)}
        dist[s] = 0.0
        pq = [(0.0, s)]
        while pq:
            d, u = heapq.heappop(pq)
            if d > dist[u]:
                continue
            for v, w in adj[u]:
                if d + w < dist[v]:
                    dist[v] = d + w
                    heapq.heappush(pq, (d + w, v))
        return dist

    df = spark.createDataFrame(ew, "src long, dst long, w double")
    tree, info = frt_tree(spark, df, seed=seed)
    parent = {r["id"]: (r["parent"], r["w"]) for r in tree.collect()}

    def tdist(u, v):
        anc_u = {}
        x, d = u, 0.0
        while x in parent:
            anc_u[x] = d
            p, w = parent[x]
            d += w
            x = p
        anc_u[x] = d
        x, d = v, 0.0
        while x not in anc_u:
            p, w = parent[x]
            d += w
            x = p
        return d + anc_u[x]

    g0 = dij(0)
    for v in range(1, n):
        assert tdist(0, v) >= g0[v] - 1e-9, (v, tdist(0, v), g0[v])


def test_frt_gfi_integrate_matches_oracle_trees(spark):
    """num_trees-averaged FRT integrator == NumPy DP on the mirror trees
    (reference frt_trees.py:40-45)."""
    from efficient_graph_algorithms_spark.operators.trees import frt_gfi_integrate

    n, seed, a, num_trees = 20, 24, -0.7, 2
    ew = _connected_weighted_graph(n, 0.2, seed)
    rng = np.random.default_rng(seed + 1)
    field = rng.uniform(-1, 1, size=n)

    acc = np.zeros(n)
    for t in range(num_trees):
        rows, root = oracle.frt_tree(ew, n, seed=seed + 1000 * t)
        ids = sorted({i for i, _, _, _ in rows} | {root})
        remap = {v: k for k, v in enumerate(ids)}
        parents = {remap[i]: (remap[p], w) for i, p, w, _ in rows}
        full_field = np.zeros(len(ids))
        for v in range(n):
            full_field[remap[v]] = field[v]
        out = oracle.tree_gfi_matvec(parents, len(ids), full_field, a=a)
        acc += np.array([out[remap[v]] for v in range(n)])
    exp = acc / num_trees

    fdf = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(field)], "id long, value double"
    )
    df = spark.createDataFrame(ew, "src long, dst long, w double")
    got_df = frt_gfi_integrate(spark, df, fdf, a=a, num_trees=num_trees, seed=seed).toPandas()
    got = np.zeros(n)
    got[got_df["id"]] = got_df["value"]
    assert np.allclose(got, exp, atol=1e-6), np.abs(got - exp).max()


def test_bartal_tree_matches_oracle(spark):
    """Spark's level-synchronous parallel-LDD Bartal sampler == the
    sequential NumPy mirror of the same deterministic algorithm
    (reference semantics bartal_trees.py:15-122) — child-for-child,
    weight-for-weight."""
    from efficient_graph_algorithms_spark.operators.trees import bartal_tree

    for seed, n, p in ((31, 24, 0.18), (32, 32, 0.12)):
        ew = _connected_weighted_graph(n, p, seed)
        exp_parent, exp_root = oracle.bartal_tree(ew, n, seed=seed)
        df = spark.createDataFrame(ew, "src long, dst long, w double")
        tree, info = bartal_tree(spark, df, seed=seed)
        assert info["root"] == exp_root
        got = {(r["id"], r["parent"], round(r["w"], 9)) for r in tree.collect()}
        exp = {(c, pa, round(w, 9)) for c, (pa, w) in exp_parent.items()}
        assert got == exp
        # a valid tree over all n vertices: n-1 parent edges
        assert len(got) == n - 1


def test_bartal_tree_seed_sensitivity_and_no_steiner(spark):
    """Different seeds give different trees (it IS a sampler); every
    tree node is an original vertex (reference: Bartal trees add no
    Steiner nodes, unlike FRT)."""
    from efficient_graph_algorithms_spark.operators.trees import bartal_tree

    n = 20
    ew = _connected_weighted_graph(n, 0.2, 33)
    df = spark.createDataFrame(ew, "src long, dst long, w double")
    t1, i1 = bartal_tree(spark, df, seed=1)
    t2, i2 = bartal_tree(spark, df, seed=2)
    s1 = {(r["id"], r["parent"]) for r in t1.collect()}
    s2 = {(r["id"], r["parent"]) for r in t2.collect()}
    assert s1 != s2
    ids = {r["id"] for r in t1.collect()} | {i1["root"]}
    assert ids == set(range(n))
    # determinism: same seed → identical sample
    t1b, _ = bartal_tree(spark, df, seed=1)
    assert {(r["id"], r["parent"]) for r in t1b.collect()} == s1


def test_bartal_gfi_integrate_matches_oracle_trees(spark):
    """bartal_gfi_integrate == average of exact exp-kernel matvecs over
    the mirror's trees (reference integrate_graph_field, trees.py:40-45)."""
    from efficient_graph_algorithms_spark.operators.trees import bartal_gfi_integrate

    n, seed, a = 18, 34, -0.7
    ew = _connected_weighted_graph(n, 0.2, seed)
    rng = np.random.default_rng(seed)
    field = rng.uniform(-1, 1, size=n)
    acc = np.zeros(n)
    num_trees = 2
    for t in range(num_trees):
        par, root = oracle.bartal_tree(ew, n, seed=seed + 1000 * t)
        acc += oracle.tree_gfi_matvec(par, n, field, a=a)
    exp = acc / num_trees
    df = spark.createDataFrame(ew, "src long, dst long, w double")
    fdf = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(field)], "id long, value double"
    )
    got = bartal_gfi_integrate(spark, df, fdf, a=a, num_trees=num_trees, seed=seed)
    gm = {r["id"]: r["value"] for r in got.collect()}
    for i in range(n):
        assert abs(gm[i] - exp[i]) < 1e-9


def test_deep_tree_accumulators_bounded(spark):
    """tree_depths on a depth-100 path keeps Catalyst's size estimates
    bounded (the union-chain accumulator collapses every 16 levels) and
    stays correct; tree_gfi_matvec with batched cuts (cut_every) equals
    the per-level-cut result exactly."""
    import contextlib
    import io
    import re

    from pyspark.sql import functions as F

    from efficient_graph_algorithms_spark.operators.trees import tree_gfi_matvec

    n = 101  # path 0-1-2-...-100 → depth 100
    parents = {i: (i - 1, 0.01 * ((i % 7) + 1)) for i in range(1, n)}
    tree = spark.createDataFrame(
        [(c, p, w) for c, (p, w) in parents.items()], "id long, parent long, w double"
    )
    twd = tree_depths(tree, root=0)
    rows = {r["id"]: r["depth"] for r in twd.collect()}
    assert rows == {i: i for i in range(1, n)}

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        twd.explain("cost")
    sizes = re.findall(r"sizeInBytes=([\d.E+]+) (\S+)", buf.getvalue())
    assert sizes, buf.getvalue()
    # the carried estimate multiplies per level WITHIN a cut batch, so
    # it is bounded by the cut cadence (~1e96 at cut_every=8) and
    # INDEPENDENT of tree depth. Without the parquet cuts it grows with
    # depth — 1e1891 at depth 100 (float() overflows to inf), BigInt
    # melt beyond — which is exactly what this asserts against.
    import math as _math

    for coef, unit in sizes:
        v = float(coef)
        assert _math.isfinite(v) and v < 1e150, (coef, unit, sizes)

    field = [(i, float((i % 5) - 2)) for i in range(n)]
    fdf = spark.createDataFrame(field, "id long, value double")
    exp = oracle.tree_gfi_matvec(parents, n, [v for _, v in field], a=-0.9)
    got = tree_gfi_matvec(twd, fdf, a=-0.9, root=0, cut_every=8)
    gm = {r["id"]: r["value"] for r in got.collect()}
    for i in range(n):
        assert abs(gm[i] - exp[i]) < 1e-9


def _doubling_case(spark, parents, n, field, a, method="doubling", atol=1e-9):
    exp = oracle.tree_gfi_matvec(parents, n, field, a=a)
    tree = spark.createDataFrame(
        [(c, p, w) for c, (p, w) in parents.items()], "id long, parent long, w double"
    )
    fdf = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(field)], "id long, value double"
    )
    got_df = tree_gfi_matvec(
        tree_depths(tree, root=0), fdf, a=a, method=method
    ).toPandas()
    got = np.zeros(n)
    got[got_df["id"]] = got_df["value"]
    assert np.allclose(got, exp, atol=atol), np.abs(got - exp).max()


def test_tree_gfi_doubling_matches_oracle_random(spark):
    """O(log depth) pointer-doubling path: exact parity with the NumPy
    2-pass DP oracle on random trees, several kernels."""
    for seed, a in ((41, -0.8), (42, -1.5), (43, -0.3)):
        parents = random_tree(50, seed)
        rng = np.random.default_rng(seed + 1)
        _doubling_case(spark, parents, 50, rng.uniform(-1, 1, 50), a)


def test_tree_gfi_doubling_path_star_deep(spark):
    """Degenerate shapes: depth-60 weighted path (the doubling path's
    reason to exist), star (n_rounds=1), and a two-vertex tree."""
    n = 60
    field = np.linspace(-1, 1, n)
    cases = [
        {i: (i - 1, 0.3 + 0.02 * (i % 7)) for i in range(1, n)},  # path
        {i: (0, 0.25 + 0.01 * i) for i in range(1, n)},           # star
    ]
    for parents in cases:
        _doubling_case(spark, parents, n, field, a=-1.0)
    _doubling_case(spark, {1: (0, 0.7)}, 2, np.array([0.4, -0.2]), a=-1.0)


def test_tree_gfi_auto_dispatch_agrees(spark):
    """method='auto' (doubling engages above depth_switch) and
    method='levels' agree to ~1 ulp on a deep path tree."""
    n = 40
    parents = {i: (i - 1, 0.5) for i in range(1, n)}
    field = np.sin(np.arange(n))
    tree = spark.createDataFrame(
        [(c, p, w) for c, (p, w) in parents.items()], "id long, parent long, w double"
    )
    fdf = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(field)], "id long, value double"
    )
    twd = tree_depths(tree, root=0)
    auto = tree_gfi_matvec(twd, fdf, a=-1.0, method="auto", depth_switch=24).toPandas()
    lvl = tree_gfi_matvec(twd, fdf, a=-1.0, method="levels").toPandas()
    m_auto = dict(zip(auto["id"], auto["value"]))
    m_lvl = dict(zip(lvl["id"], lvl["value"]))
    assert set(m_auto) == set(m_lvl)
    for i in m_auto:
        assert abs(m_auto[i] - m_lvl[i]) <= 1e-12 * max(1.0, abs(m_lvl[i])), i


def test_tree_gfi_doubling_envelope_fallback(spark):
    """|a|·range(D)/2 beyond the double exp envelope → warn + fall back
    to the level-sync DP (whose incremental products underflow
    gracefully); results still match the oracle."""
    import warnings as _w

    n = 32
    parents = {i: (i - 1, 50.0) for i in range(1, n)}  # D range = 1550
    field = np.ones(n)
    tree = spark.createDataFrame(
        [(c, p, w) for c, (p, w) in parents.items()], "id long, parent long, w double"
    )
    fdf = spark.createDataFrame(
        [(i, 1.0) for i in range(n)], "id long, value double"
    )
    twd = tree_depths(tree, root=0)
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        got_df = tree_gfi_matvec(twd, fdf, a=-1.0, method="doubling").toPandas()
    assert any("envelope" in str(r.message) for r in rec)
    exp = oracle.tree_gfi_matvec(parents, n, field, a=-1.0)
    got = np.zeros(n)
    got[got_df["id"]] = got_df["value"]
    assert np.allclose(got, exp, atol=1e-9)


def test_tree_depths_doubling_parity(spark):
    """Pointer-doubling depths == level-sync depths, including dropping
    vertices of other forest components (no path to the given root)."""
    parents = random_tree(40, seed=77)
    # second component rooted at 100 (ids 100..104 chain) — unreachable
    for i in range(101, 105):
        parents[i] = (i - 1, 0.5)
    rows = [(c, p, w) for c, (p, w) in parents.items()]
    tree = spark.createDataFrame(rows, "id long, parent long, w double")
    lvl = {
        (r["id"], r["depth"])
        for r in tree_depths(tree, root=0, method="levels").collect()
    }
    dbl = {
        (r["id"], r["depth"])
        for r in tree_depths(tree, root=0, method="doubling").collect()
    }
    assert lvl == dbl
    assert all(i < 100 for i, _ in dbl)  # other component dropped

    # deep path: auto restarts into doubling past depth_switch
    chain = {i: (i - 1, 1.0) for i in range(1, 70)}
    t2 = spark.createDataFrame(
        [(c, p, w) for c, (p, w) in chain.items()], "id long, parent long, w double"
    )
    auto = {
        (r["id"], r["depth"])
        for r in tree_depths(t2, root=0, method="auto", depth_switch=16).collect()
    }
    assert auto == {(i, i) for i in range(1, 70)}
