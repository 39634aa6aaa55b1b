"""HITS and graph-contraction operators vs NumPy/hand oracles."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from efficient_graph_algorithms_spark.oracle import numpy_oracle as oracle
from efficient_graph_algorithms_spark.operators.contract import (
    contract_by_key,
    host_graph,
    host_of,
)
from efficient_graph_algorithms_spark.operators.hits import hits

from tests.test_graph_algorithms import er_graph, spark_edges, spark_vertices


# --- HITS --------------------------------------------------------------------

@pytest.mark.parametrize("n,p", [(80, 0.05), (150, 0.02)])
def test_hits_matches_oracle(spark, n, p):
    edges = er_graph(n, p)
    exp_h, exp_a, exp_iters = oracle.hits(edges, n, tol=1e-8, max_iter=100)
    out, info = hits(
        spark, spark_edges(spark, edges), vertices=spark_vertices(spark, n),
        tol=1e-8, max_iter=100,
    )
    pd = out.toPandas().set_index("id")
    got_h = pd["hub"].reindex(range(n)).to_numpy()
    got_a = pd["authority"].reindex(range(n)).to_numpy()
    assert info["converged"]
    assert info["iterations"] == exp_iters
    assert np.allclose(got_h, exp_h, atol=1e-6)
    assert np.allclose(got_a, exp_a, atol=1e-6)
    # both vectors unit-L2 after convergence
    assert abs(np.sqrt((got_h**2).sum()) - 1.0) < 1e-9
    assert abs(np.sqrt((got_a**2).sum()) - 1.0) < 1e-9


def test_hits_star_graph(spark):
    # hub 0 points at 1..4: vertex 0 is the pure hub (authority 0),
    # leaves are pure equal authorities (hub 0); closed form in 1 iter.
    edges = np.array([[0, 1], [0, 2], [0, 3], [0, 4]])
    out, info = hits(spark, spark_edges(spark, edges), vertices=spark_vertices(spark, 5))
    pd = out.toPandas().set_index("id").sort_index()
    assert np.allclose(pd["hub"].to_numpy(), [1.0, 0, 0, 0, 0], atol=1e-9)
    assert np.allclose(pd["authority"].to_numpy(), [0.0, 0.5, 0.5, 0.5, 0.5], atol=1e-9)
    assert info["converged"]


def test_hits_isolated_vertices_get_zero(spark):
    edges = np.array([[0, 1], [1, 0]])
    out, _ = hits(spark, spark_edges(spark, edges), vertices=spark_vertices(spark, 4))
    pd = out.toPandas().set_index("id").sort_index()
    assert np.allclose(pd.loc[[2, 3], ["hub", "authority"]].to_numpy(), 0.0)
    assert (pd.index == [0, 1, 2, 3]).all()  # universe preserved


def test_hits_plan_has_no_cartesian_blowup(spark):
    """The per-iteration norm crossJoin is a broadcast 1-row aggregate —
    assert the physical plan never contains a real cartesian product."""
    edges = er_graph(40, 0.1)
    out, _ = hits(
        spark, spark_edges(spark, edges), vertices=spark_vertices(spark, 40), max_iter=2, tol=0.0
    )
    assert out.count() == 40  # executed fine; plan was cut per iteration


# --- SALSA -------------------------------------------------------------------


@pytest.mark.parametrize("n,p", [(30, 0.12), (60, 0.06)])
def test_salsa_matches_oracle(spark, n, p):
    from efficient_graph_algorithms_spark.operators.hits import salsa

    edges = er_graph(n, p)
    exp_h, exp_a, exp_iters = oracle.salsa(edges, n, tol=1e-8, max_iter=100)
    out, info = salsa(
        spark, spark_edges(spark, edges), vertices=spark_vertices(spark, n),
        tol=1e-8, max_iter=100,
    )
    pd = out.toPandas().set_index("id")
    got_h = pd["hub"].reindex(range(n)).to_numpy()
    got_a = pd["authority"].reindex(range(n)).to_numpy()
    assert info["converged"]
    assert info["iterations"] == exp_iters
    assert np.allclose(got_h, exp_h, atol=1e-9)
    assert np.allclose(got_a, exp_a, atol=1e-9)
    # both vectors are probability distributions after convergence
    assert abs(got_h.sum() - 1.0) < 1e-9 and abs(got_a.sum() - 1.0) < 1e-9


def test_salsa_stationary_is_degree_proportional(spark):
    """Lempel & Moran's closed form: when the hub co-citation graph
    (hubs sharing a target) is ONE irreducible class, SALSA converges
    to hub = out_deg/|E| and authority = in_deg/|E| — the property that
    distinguishes it from HITS (which concentrates on the principal
    eigenvector instead). The 4->3 chord is what connects the class:
    without it the ring-with-chords splits into the closed classes
    {0,1,2,3} / {4,5} and the limit is the component-mass-weighted
    mixture instead (verified during test construction — the engine
    reproduced that closed form exactly too)."""
    from efficient_graph_algorithms_spark.operators.hits import salsa

    edges = np.array(
        [[0, 1], [1, 2], [2, 3], [3, 4], [4, 5], [5, 0],
         [0, 2], [2, 4], [4, 0], [1, 3], [4, 3]]
    )
    n, m = 6, len(edges)
    out, info = salsa(
        spark, spark_edges(spark, edges), vertices=spark_vertices(spark, n),
        tol=1e-10, max_iter=300,
    )
    pd = out.toPandas().set_index("id").sort_index()
    in_deg = np.bincount(edges[:, 1], minlength=n)
    assert info["converged"]
    assert np.allclose(pd["authority"].to_numpy(), in_deg / m, atol=1e-9)
    out_deg = np.bincount(edges[:, 0], minlength=n)
    assert np.allclose(pd["hub"].to_numpy(), out_deg / m, atol=1e-9)


def test_salsa_hub_degree_robustness(spark):
    """The stochastic normalization stops a mega-hub from dominating:
    vertex 0 links to everything, but each target's authority counts
    0's endorsement at weight 1/out(0) — with single other endorsements
    spread evenly, authorities stay near-uniform instead of following
    the hub (the TKDC robustness SALSA exists for)."""
    from efficient_graph_algorithms_spark.operators.hits import salsa

    # hub 0 -> 1..8 plus a 1->2 side endorsement
    edges = np.array([[0, j] for j in range(1, 9)] + [[1, 2]])
    out, _ = salsa(
        spark, spark_edges(spark, edges), vertices=spark_vertices(spark, 9),
        tol=1e-10, max_iter=300,
    )
    pd = out.toPandas().set_index("id").sort_index()
    a = pd["authority"].to_numpy()
    exp_h, exp_a, _ = oracle.salsa(edges, 9, tol=1e-10, max_iter=300)
    assert np.allclose(a, exp_a, atol=1e-9)
    # vertex 2 (two in-links) leads, but by a bounded stochastic margin
    assert a[2] == a.max()
    assert a[2] < 2.5 * a[3]


# --- TrustRank / spam mass ----------------------------------------------------


def test_spam_mass_matches_oracle_composition(spark):
    """spam_mass == (PR - PPR_seeds)/PR, both faces from the NumPy
    pagerank oracle; a spam farm pointing only at itself collects rank
    with zero trusted support -> relative mass ~1, while the trusted
    seed keeps negative mass (more trust than rank)."""
    from efficient_graph_algorithms_spark.operators.trustrank import spam_mass

    # trusted core: 0 <-> 1 <-> 2 (seed 0); spam farm: 3..6 clique
    # pointing at target 7, no trusted in-links to the farm
    core = [[0, 1], [1, 0], [1, 2], [2, 0]]
    farm = [[i, j] for i in range(3, 7) for j in range(3, 7) if i != j]
    farm += [[i, 7] for i in range(3, 7)]
    edges = np.array(core + farm)
    n = 8
    seeds = spark.createDataFrame([(0,)], "id long")
    out, info = spam_mass(
        spark, spark_edges(spark, edges), seeds,
        vertices=spark_vertices(spark, n), max_iter=60, tol=1e-12,
    )
    pd = out.toPandas().set_index("id").sort_index()
    pers = np.zeros(n)
    pers[0] = 1.0
    exp_r, _ = oracle.pagerank(edges, n, tol=1e-12, max_iter=60)
    exp_t, _ = oracle.pagerank(edges, n, tol=1e-12, max_iter=60, personalization=pers)
    assert np.allclose(pd["rank"].to_numpy(), exp_r, atol=1e-9)
    assert np.allclose(pd["trust"].to_numpy(), exp_t, atol=1e-9)
    assert np.allclose(
        pd["spam_mass"].to_numpy(), (exp_r - exp_t) / exp_r, atol=1e-9
    )
    # the detection signal: every farm page near-total spam mass,
    # the trusted core negative (more trusted support than rank)
    assert (pd.loc[3:7, "spam_mass"] > 0.95).all()
    assert (pd.loc[0:2, "spam_mass"] < 0).all()


# --- contraction -------------------------------------------------------------

def test_contract_by_key_counts_and_self_loops(spark):
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (2, 3), (3, 0), (3, 1)], "src long, dst long"
    )
    # groups: {0,1} -> A, {2,3} -> B
    mapping = spark.createDataFrame(
        [(0, "A"), (1, "A"), (2, "B"), (3, "B")], "id long, key string"
    )
    got = {
        (r["src_key"], r["dst_key"]): r["weight"]
        for r in contract_by_key(edges, mapping).collect()
    }
    # A->B: (0,2),(1,2); B->A: (3,0),(3,1); self loops (0,1),(2,3) dropped
    assert got == {("A", "B"): 2, ("B", "A"): 2}
    with_loops = {
        (r["src_key"], r["dst_key"]): r["weight"]
        for r in contract_by_key(edges, mapping, keep_self_loops=True).collect()
    }
    assert with_loops == {("A", "B"): 2, ("B", "A"): 2, ("A", "A"): 1, ("B", "B"): 1}


def test_contract_drops_unmapped_and_null_keys(spark):
    edges = spark.createDataFrame([(0, 1), (1, 2), (2, 0)], "src long, dst long")
    mapping = spark.createDataFrame(
        [(0, "A"), (1, "B"), (2, None)], "id long, key string"
    )
    got = {
        (r["src_key"], r["dst_key"]): r["weight"]
        for r in contract_by_key(edges, mapping).collect()
    }
    assert got == {("A", "B"): 1}  # every edge touching vertex 2 dropped


def test_host_of_parses_and_nulls(spark):
    df = spark.createDataFrame(
        [("https://a.example/p/1?x=2",), ("http://b.example",), ("not a url",)],
        "url string",
    )
    got = [r[0] for r in df.select(host_of(F.col("url"))).collect()]
    assert got[:2] == ["a.example", "b.example"]
    assert got[2] is None


def test_host_graph_end_to_end(spark):
    """Pages → build_edges → host contraction matches a hand oracle."""
    from efficient_graph_algorithms_spark.sources.edges import build_edges

    html = {
        "https://x.example/a": "<a href='https://y.example/b'></a>"
                               "<a href='https://x.example/c'></a>",
        "https://y.example/b": "<a href='https://x.example/a'></a>"
                               "<a href='https://x.example/c'></a>",
        "https://x.example/c": "<a href='https://y.example/b'></a>",
    }
    pages = spark.createDataFrame(
        [(u, h.encode()) for u, h in html.items()], "url string, html binary"
    )
    url_dict, edges = build_edges(pages)
    got = {
        (r["src_key"], r["dst_key"]): r["weight"]
        for r in host_graph(edges, url_dict).collect()
    }
    # cross-host page edges: x/a->y/b, y/b->x/a, y/b->x/c, x/c->y/b
    assert got == {("x.example", "y.example"): 2, ("y.example", "x.example"): 2}
