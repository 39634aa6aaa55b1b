"""Directed partition modularity vs a pure-Python Leicht–Newman oracle."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from efficient_graph_algorithms_spark.operators.modularity import (
    community_contributions,
    partition_modularity,
)

from tests.test_graph_algorithms import er_graph, spark_edges, spark_vertices


def py_modularity(edges, comm):
    """comm: dict id -> label (missing ids are singletons)."""
    c = lambda v: comm.get(v, f"__v{v}")
    m = len(edges)
    internal = sum(1 for s, d in edges if c(s) == c(d))
    douts, dins = {}, {}
    for s, d in edges:
        douts[c(s)] = douts.get(c(s), 0) + 1
        dins[c(d)] = dins.get(c(d), 0) + 1
    x = sum(do * dins.get(k, 0) for k, do in douts.items())
    return internal / m - x / (m * m)


def _assign(spark, comm):
    return spark.createDataFrame(
        [(int(k), str(v)) for k, v in comm.items()], "id long, community string"
    )


def test_matches_python_oracle_random_partition(spark):
    n = 160
    edges = [tuple(map(int, e)) for e in er_graph(n, 0.04, seed=5)]
    comm = {i: f"g{(i * 7 + 3) % 6}" for i in range(n)}
    summary, info = partition_modularity(
        spark_edges(spark, np.array(edges)), _assign(spark, comm)
    )
    want = py_modularity(edges, comm)
    assert abs(info["modularity"] - want) < 1e-12
    row = summary.collect()[0]
    assert row["m"] == len(edges)
    assert row["modularity"] == pytest.approx(want, abs=1e-9)
    assert row["n_communities"] == 6
    # Σ per-community contributions = Q exactly (same arithmetic)
    contrib = community_contributions(
        spark_edges(spark, np.array(edges)), _assign(spark, comm), decimals=12
    )
    tot = contrib.agg(F.sum("contribution")).collect()[0][0]
    assert tot == pytest.approx(want, abs=1e-9)


def test_perfect_and_antagonistic_partitions(spark):
    # two disjoint directed cliques: own-cluster partition is strong,
    # the everything-in-one partition scores exactly 0
    cliq = lambda off: [(off + i, off + j) for i in range(6) for j in range(6) if i != j]
    edges = cliq(0) + cliq(6)
    e = spark_edges(spark, np.array(edges))
    good = {i: "a" if i < 6 else "b" for i in range(12)}
    one = {i: "all" for i in range(12)}
    _, ig = partition_modularity(e, _assign(spark, good))
    _, io = partition_modularity(e, _assign(spark, one))
    assert ig["modularity"] == pytest.approx(0.5, abs=1e-12)  # 1 - 2*(1/2)^2
    assert io["modularity"] == pytest.approx(0.0, abs=1e-12)
    assert ig["internal_edges"] == len(edges)


def test_unassigned_vertices_become_singletons(spark):
    edges = [(0, 1), (1, 0), (2, 3), (3, 2), (0, 2)]
    comm = {0: "a", 1: "a"}  # 2 and 3 unassigned
    _, info = partition_modularity(
        spark_edges(spark, np.array(edges)), _assign(spark, comm)
    )
    want = py_modularity(edges, comm)
    assert abs(info["modularity"] - want) < 1e-12
    assert info["m"] == 5  # nothing dropped
    assert info["n_communities"] == 3  # a, __v2, __v3


def test_empty_edges_raise(spark):
    e = spark.createDataFrame([], "src long, dst long")
    with pytest.raises(ValueError, match="empty edge set"):
        partition_modularity(e, _assign(spark, {0: "a"}))


def test_lpa_labels_flow_through(spark):
    """The operator consumes LPA output directly (label col name)."""
    from efficient_graph_algorithms_spark.operators.lpa import label_propagation

    n = 80
    edges = er_graph(n, 0.06, seed=9)
    e = spark_edges(spark, edges)
    labels, _ = label_propagation(spark, e, vertices=spark_vertices(spark, n), max_iter=3)
    summary, info = partition_modularity(e, labels, community_col="label")
    comm = {int(r["id"]): str(r["label"]) for r in labels.collect()}
    want = py_modularity([tuple(map(int, x)) for x in edges], comm)
    assert abs(info["modularity"] - want) < 1e-12
