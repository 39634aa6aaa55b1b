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


def test_ivf_topk_no_cartesian(spark):
    """IVF candidates come from one equi-join on list_id; the plan must
    never fall back to a cartesian/nested-loop shape."""
    from efficient_graph_algorithms_spark.operators.ann import ivf_topk

    vecs = spark.createDataFrame(
        [(i, [float((i * 7 + j) % 11) for j in range(8)]) for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    q = vecs.limit(5).withColumnRenamed("vec_id", "qid")
    plan = _plan(ivf_topk(vecs, q, k=3, n_centroids=4, n_probe=2, n_iter=2))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_image_near_dups_no_cartesian(spark):
    """dHash near-dup candidates come from the pigeonhole band
    equi-join (hamming_pairs) — never a cartesian/nested-loop."""
    import numpy as np

    from efficient_graph_algorithms_spark.operators.imagehash import image_near_dups
    from efficient_graph_algorithms_spark.operators.multimodal import encode_bmp24

    rng = np.random.default_rng(5)
    media = spark.createDataFrame(
        [(i, bytearray(encode_bmp24(rng.random((16, 18, 3))))) for i in range(6)],
        "media_id long, payload binary",
    )
    plan = _plan(image_near_dups(media, max_hamming=6))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_bloom_and_cms_join_shapes(spark):
    """Bloom membership is a plain long equi-join on position; the CMS
    estimate joins a broadcast sketch — both cartesian-free."""
    from efficient_graph_algorithms_spark.operators.bloom import (
        bloom_build, bloom_contains)
    from efficient_graph_algorithms_spark.operators.cms import (
        cms_build, cms_estimate)

    keys = spark.createDataFrame([(f"k{i}",) for i in range(20)], "key string")
    bloom = bloom_build(keys, m_bits=256, n_hashes=3)
    plan = _plan(bloom_contains(keys, bloom, m_bits=256, n_hashes=3))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma {i}") for i in range(10)], "doc_id long, text string"
    )
    sketch = cms_build(docs, depth=2, width=32)
    eplan = _plan(cms_estimate(sketch, docs.selectExpr("text as term"), width=32))
    assert "CartesianProduct" not in eplan
    assert "BroadcastHashJoin" in eplan  # the sketch side is broadcast


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


def test_state_cutter_observe_rides_write_job(spark):
    """cut.observe(): the metric aggregates ride the parquet write as
    CollectMetrics partials — ONE Spark job total, _obs_* scratch
    columns dropped from the written state (r3 verdict item 7: the
    sinkhorn/wbary convergence delta must not cost a second full-scan
    job per iteration)."""
    from efficient_graph_algorithms_spark.plans.lineage import StateCutter

    sc = spark.sparkContext
    df = spark.range(100).select(
        "id", (F.col("id") % 7).cast("double").alias("v"),
        F.lit(1.0).alias("_obs_w"),
    )
    with StateCutter(spark, "obstest", keep=2) as cut:
        # baseline: a plain cut costs (write job + 1-task footer-read job
        # from the parquet read-back's schema inference)
        sc.setJobGroup("plain_probe", "plain cut")
        try:
            cut(df.drop("_obs_w"))
        finally:
            sc.setJobGroup(None, None)
        base_jobs = len(sc.statusTracker().getJobIdsForGroup("plain_probe"))

        sc.setJobGroup("obs_probe", "observe cut")
        try:
            out, got = cut.observe(
                df, total=F.sum(F.col("_obs_w") * F.col("v"))
            )
        finally:
            sc.setJobGroup(None, None)
        obs_jobs = len(sc.statusTracker().getJobIdsForGroup("obs_probe"))
        assert obs_jobs == base_jobs, (
            f"observe() must add no jobs over a plain cut: {obs_jobs} vs {base_jobs}"
        )
        assert got["total"] == sum(i % 7 for i in range(100))
        assert out.columns == ["id", "v"]  # _obs_ scratch not persisted
        assert out.count() == 100


def test_transport_loops_one_observed_job_per_iteration(spark):
    """sinkhorn_distance/wasserstein_barycenter: the per-iteration
    convergence delta rides the state-cut write as a CollectMetrics
    partial — the loop runs NO driver-collect jobs. Only the constant
    setup/final aggregates (distance terms, k-list) may collect, so the
    count of collect-stage jobs is iteration-independent (the pre-r4
    shape collected once per iteration past the first)."""
    import numpy as np

    from efficient_graph_algorithms_spark.operators.transport import (
        sinkhorn_distance,
        wasserstein_barycenter,
    )

    sc = spark.sparkContext

    def n_collect_jobs(group: str) -> int:
        tr = sc.statusTracker()
        n = 0
        for j in tr.getJobIdsForGroup(group):
            ji = tr.getJobInfo(j)
            stages = [tr.getStageInfo(s) for s in (ji.stageIds if ji else [])]
            if any(si and si.name.startswith("collect") for si in stages):
                n += 1
        return n

    rng = np.random.default_rng(5)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 20, (60, 2)) if a != b]
    e = spark.createDataFrame(edges, "src long, dst long")
    mu = rng.random(20); mu /= mu.sum()
    nu = rng.random(20); nu /= nu.sum()
    mu_df = spark.createDataFrame([(i, float(v)) for i, v in enumerate(mu)], "id long, m double")
    nu_df = spark.createDataFrame([(i, float(v)) for i, v in enumerate(nu)], "id long, m double")

    sc.setJobGroup("sink_probe", "sinkhorn loop")
    try:
        _, info = sinkhorn_distance(spark, e, mu_df, nu_df, n_iter=8, tol=0.0)
    finally:
        sc.setJobGroup(None, None)
    it = info["iterations"]
    assert it == 8
    # constant: the two final distance-term aggregates (+1 slack); the
    # old shape added it-1 = 7 more
    assert n_collect_jobs("sink_probe") <= 3, n_collect_jobs("sink_probe")

    dists = spark.createDataFrame(
        [(k, i, float(v)) for k in range(2)
         for i, v in enumerate((lambda x: x / x.sum())(rng.random(20)))],
        "k int, id long, m double",
    )
    sc.setJobGroup("wbary_probe", "wbary loop")
    try:
        _, winfo = wasserstein_barycenter(spark, e, dists, n_iter=8, tol=0.0)
    finally:
        sc.setJobGroup(None, None)
    assert winfo["iterations"] == 8
    # constant: the k-list distinct collect (+1 slack); old shape +7
    assert n_collect_jobs("wbary_probe") <= 2, n_collect_jobs("wbary_probe")
