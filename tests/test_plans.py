"""Physical-plan property tests — the plan shapes the 100 TB design
depends on, asserted at small scale via explain(formatted).

These catch regressions like: a filter that stops reaching the parquet
scan, a projection that stops pruning columns, the query side of
similarity search losing its broadcast, or an aggregate losing its
map-side partial phase.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


@pytest.fixture(scope="module")
def pages_parquet(spark, tmp_path_factory):
    from efficient_graph_algorithms_spark.sources.pages import pages_df

    p = str(tmp_path_factory.mktemp("plans") / "pages")
    pages_df(spark, 500, seed=42, partitions=2).write.parquet(p)
    return p


def test_filter_pushdown_and_column_pruning(spark, pages_parquet):
    df = spark.read.parquet(pages_parquet).where(F.col("lang") == "en").select("url")
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan
    # only url+lang read, html (the heavy column) pruned
    assert "html" not in plan.split("ReadSchema")[1][:200]


def test_gather_scatter_partial_aggregation(spark):
    from efficient_graph_algorithms_spark.operators.gather_scatter import integrate

    e = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    f = spark.createDataFrame([(0, 1.0), (1, 2.0)], "id long, value double")
    plan = _plan(integrate(e, f))
    # two-phase hash aggregate: partial (map-side combine) + final
    assert plan.count("HashAggregate") >= 2
    assert "partial_sum" in plan


def test_cosine_topk_broadcasts_queries_not_corpus(spark):
    from efficient_graph_algorithms_spark.operators.similarity import cosine_topk

    vecs = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(100)], "vec_id long, embedding array<double>"
    )
    q = vecs.where(F.col("vec_id") < 2).select(F.col("vec_id").alias("qid"), "embedding")
    plan = _plan(cosine_topk(vecs, q, k=3))
    assert "Broadcast" in plan  # query side broadcast; corpus not shuffled for the join


def test_triangle_orientation_no_cartesian(spark):
    from efficient_graph_algorithms_spark.operators.triangles import triangle_count

    e = spark.createDataFrame([(0, 1), (1, 2), (2, 0)], "src long, dst long")
    plan = _plan(triangle_count(e))
    assert "CartesianProduct" not in plan


def test_pagerank_linked_is_single_wide_shuffle(spark):
    """The per-iteration contrib plan: join + groupBy — the join and the
    aggregate are the only exchanges (plus AQE reads)."""
    e = spark.createDataFrame([(0, 1), (1, 2), (2, 0)], "src long, dst long")
    deg = e.groupBy("src").agg(F.count("*").alias("d"))
    linked = e.join(deg, "src").select("src", "dst", (F.lit(1.0) / F.col("d")).alias("inv_deg"))
    ranks = spark.createDataFrame([(0, 0.3), (1, 0.3), (2, 0.4)], "id long, rank double")
    contrib = (
        linked.join(ranks, linked["src"] == ranks["id"])
        .groupBy(linked["dst"].alias("id"))
        .agg(F.sum(F.col("rank") * F.col("inv_deg")).alias("c"))
    )
    plan = _plan(contrib)
    assert "partial_sum" in plan  # map-side combine on the wide agg


def test_epsilon_nn_default_no_cartesian(spark):
    """The shipped ε-NN path must be the grid equi-join, not a
    cartesian theta join (which only survives behind method='brute')."""
    from efficient_graph_algorithms_spark.operators.graph_build import epsilon_nn_graph

    pts = spark.createDataFrame(
        [(i, [float(i % 7), float(i % 5), 0.0, 0.0]) for i in range(40)],
        "id long, vec array<double>",
    )
    plan = _plan(epsilon_nn_graph(pts, eps=1.5, dim=4))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_cosine_pairs_default_no_cartesian(spark):
    from efficient_graph_algorithms_spark.operators.similarity import cosine_pairs

    vecs = spark.createDataFrame(
        [(i, [float(i % 3) + 0.1, float(i % 4) + 0.1]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    plan = _plan(cosine_pairs(vecs, threshold=0.95, dim=2))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_knn_lsh_no_cartesian(spark):
    from efficient_graph_algorithms_spark.operators.ann import knn_graph

    vecs = spark.createDataFrame(
        [(i, [float((i * 13 + j) % 9) for j in range(8)]) for i in range(30)],
        "vec_id long, embedding array<double>",
    )
    plan = _plan(knn_graph(vecs, k=3, method="lsh", dim=8))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_state_cutter_bounds_stats(spark):
    """Iterated self-joins barriered by StateCutter keep Catalyst's size
    estimate bounded and real. Through localCheckpoint, Spark 4 carries
    the source plan's ESTIMATED stats onto the checkpoint, and join
    estimates multiply — the estimate's digit count doubles per
    iteration until the driver spends minutes in BigInt multiplication
    (observed on the Borůvka fixpoint; see plans/lineage.py)."""
    import contextlib
    import io
    import re

    from efficient_graph_algorithms_spark.plans.lineage import StateCutter

    df = spark.range(100).select("id", (F.col("id") % 7).alias("v"))
    with StateCutter(spark, "statstest") as cut:
        state = cut(df)
        for _ in range(8):
            nxt = (
                state.alias("a")
                .join(state.select("id", F.col("v").alias("v2")).alias("b"), "id")
                .select("id", ((F.col("v") + F.col("v2")) % 7).alias("v"))
            )
            state = cut(nxt)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            state.alias("x").join(state.select("id").alias("y"), "id").explain("cost")
        sizes = re.findall(r"sizeInBytes=([\d.]+) (\S+)", buf.getvalue())
        assert sizes, buf.getvalue()
        # bounded: every estimate in the plan stays in human units, no
        # astronomically-multiplied carried stats
        assert all(unit.rstrip(",)") in ("B", "KiB", "MiB") for _, unit in sizes), sizes
        assert state.count() == 100


def test_state_cutter_keep_bounds_scratch(spark):
    """keep=k rotates superseded cut generations: scratch directory
    count stays O(keep) over arbitrarily many iterations (round-2
    verdict: unbounded retention accumulated |V|-row parquet × iters)."""
    import os

    from efficient_graph_algorithms_spark.plans.lineage import StateCutter

    df = spark.range(50).select("id", (F.col("id") % 5).alias("v"))
    with StateCutter(spark, "keeptest", keep=2) as cut:
        state = cut(df)
        for _ in range(9):
            state = cut(state.select("id", (F.col("v") + 1).alias("v")))
            n_dirs = len([d for d in os.listdir(cut.dir) if d.startswith("cut=")])
            assert n_dirs <= 2, n_dirs
        assert state.count() == 50
