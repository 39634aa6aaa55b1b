"""Resumability: kill after iteration k, resume, identical final state
(north rule: 'resumable from per-iteration checkpoints carrying
per-partition lineage and convergence metrics')."""

from __future__ import annotations

import json
import os
import shutil

import numpy as np

from efficient_graph_algorithms_spark.operators.pagerank import pagerank
from tests.test_graph_algorithms import er_graph, spark_edges, spark_vertices


def _ranks_np(df, n):
    pd = df.toPandas().set_index("id")["rank"]
    out = np.zeros(n)
    out[pd.index] = pd.to_numpy()
    return out


def test_pagerank_resume_identical(spark, tmp_path):
    n = 80
    edges = er_graph(n, 0.05, seed=11)
    e, v = spark_edges(spark, edges), spark_vertices(spark, n)

    full_dir = str(tmp_path / "full")
    ranks_full, info_full = pagerank(spark, e, vertices=v, checkpoint_dir=full_dir)
    full = _ranks_np(ranks_full, n)

    # simulate a crash: drop everything after iteration 3
    resume_dir = str(tmp_path / "resumed")
    shutil.copytree(full_dir, resume_dir)
    state = os.path.join(resume_dir, "state")
    for d in os.listdir(state):
        if int(d.split("=")[1]) > 3:
            shutil.rmtree(os.path.join(state, d))

    ranks_res, info_res = pagerank(spark, e, vertices=v, checkpoint_dir=resume_dir, resume=True)
    res = _ranks_np(ranks_res, n)

    assert info_res["iterations"] == info_full["iterations"]
    assert np.array_equal(full, res)  # bit-identical, not just allclose


def test_checkpoint_metrics_lineage(spark, tmp_path):
    n = 40
    edges = er_graph(n, 0.1, seed=12)
    d = str(tmp_path / "ck")
    _, info = pagerank(spark, spark_edges(spark, edges), vertices=spark_vertices(spark, n), checkpoint_dir=d)
    with open(os.path.join(d, "metrics.jsonl")) as f:
        rows = [json.loads(line) for line in f]
    assert len(rows) == info["iterations"]
    for i, r in enumerate(rows, start=1):
        assert r["iteration"] == i
        assert r["delta"] >= 0 and "dangling_mass" in r
        assert r["n_partitions"] >= 1
        assert isinstance(r["input_files"], list) and r["input_files"]
    # deltas decrease overall and end < tol
    assert rows[-1]["delta"] < 1e-6
    meta = json.load(open(os.path.join(d, "_META.json")))
    assert meta["algorithm"] == "pagerank"
