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
