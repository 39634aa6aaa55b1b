"""Kernel projection + corrections vs the NumPy get_projection oracle."""

from __future__ import annotations

import numpy as np
import pytest

from efficient_graph_algorithms_spark.operators.projection import (
    kernel_projection,
    projection_ranking,
)
from efficient_graph_algorithms_spark.oracle import numpy_oracle as oracle
from tests.test_graph_algorithms import er_graph, spark_edges


def _dense(df, n):
    pd = df.toPandas().set_index("id")["score"]
    out = np.zeros(n)
    out[pd.index] = pd.to_numpy()
    return out


@pytest.mark.parametrize(
    "correction,norm",
    [(None, False), ("seedset_size", False), ("degree", False),
     ("rdm_seed", False), ("degree", True)],
)
def test_kernel_projection_corrections(spark, correction, norm):
    n = 70
    edges = er_graph(n, 0.07, seed=51)
    seed_sets = {0: [0, 7, 14], 1: [3, 9, 30], 2: [5, 21, 33], 3: [2, 11, 40]}
    exp = oracle.kernel_projection(edges, n, seed_sets, steps=2,
                                   correction=correction, norm=norm)
    rows = [(int(v), s) for s, ids in seed_sets.items() for v in ids]
    sets_df = spark.createDataFrame(rows, "id long, sample int")
    got = _dense(
        kernel_projection(spark_edges(spark, edges), sets_df, steps=2,
                          correction=correction, norm=norm),
        n,
    )
    assert np.allclose(got, exp, atol=1e-9)


def test_projection_ranking(spark):
    n = 50
    edges = er_graph(n, 0.1, seed=52)
    sets_df = spark.createDataFrame([(0, 0), (9, 0)], "id long, sample int")
    scores = kernel_projection(spark_edges(spark, edges), sets_df, steps=2)
    top = projection_ranking(scores, k=5).collect()
    assert len(top) == 5
    vals = [r["score"] for r in top]
    assert vals == sorted(vals, reverse=True)
