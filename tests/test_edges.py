"""Edge-build pipeline: url dictionary, edge set vs pure-pandas oracle,
degree table, salted adjacency blocks round-trip."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from efficient_graph_algorithms_spark.sources.edges import (
    adjacency_blocks,
    assign_dense_ids,
    build_edges,
    out_degrees,
    symmetrize,
)
from efficient_graph_algorithms_spark.sources.pages import pages_df
from tests.conftest import edges_from_pages_pd


@pytest.fixture(scope="module")
def built(spark, tiny_pages_pd):
    pages = pages_df(spark, 300, seed=42, partitions=3)
    url_dict, edges = build_edges(pages, id_partitions=5)
    return url_dict.toPandas(), edges.toPandas()


def test_url_dictionary_dense_and_sorted(built, tiny_pages_pd):
    url_dict, _ = built
    urls_expected, _ = edges_from_pages_pd(tiny_pages_pd)
    d = url_dict.sort_values("id").reset_index(drop=True)
    assert list(d["url"]) == urls_expected
    assert list(d["id"]) == list(range(len(urls_expected)))


def test_edges_match_pandas_oracle(built, tiny_pages_pd):
    _, edges = built
    _, expected = edges_from_pages_pd(tiny_pages_pd)
    got = sorted(map(tuple, edges[["src", "dst"]].itertuples(index=False)))
    assert got == list(map(tuple, expected))


def test_edges_invariants(built):
    _, edges = built
    assert len(edges) == len(edges.drop_duplicates())
    assert (edges["src"] != edges["dst"]).all()


def test_assign_dense_ids_partition_invariance(spark):
    df = spark.createDataFrame([(f"u{i:03d}",) for i in range(97)], ["url"])
    a = assign_dense_ids(df, partitions=3).toPandas().sort_values("url")
    b = assign_dense_ids(df, partitions=9).toPandas().sort_values("url")
    assert list(a["id"]) == list(b["id"]) == list(range(97))


def test_adjacency_blocks_roundtrip(spark, built):
    _, edges_pd = built
    edges = spark.createDataFrame(edges_pd)
    adj = adjacency_blocks(edges, salt_threshold=8)
    back = (
        adj.select(F.col("src"), F.explode("dsts").alias("dst"))
        .orderBy("src", "dst")
        .toPandas()
    )
    exp = edges_pd.sort_values(["src", "dst"]).reset_index(drop=True)
    assert back.equals(exp)
    # out_deg is the TOTAL degree on every salt row
    deg = out_degrees(edges).toPandas().set_index("src")["out_deg"]
    for r in adj.select("src", "out_deg").distinct().collect():
        assert deg[r["src"]] == r["out_deg"]
    # salted rows bounded
    assert adj.select(F.max(F.size("dsts"))).first()[0] <= 8


def test_symmetrize(spark):
    e = spark.createDataFrame([(1, 2), (2, 1), (3, 3), (2, 3)], ["src", "dst"])
    got = sorted(map(tuple, symmetrize(e).toPandas().itertuples(index=False)))
    assert got == [(1, 2), (2, 1), (2, 3), (3, 2)]


def test_raw_link_pairs_jvm_matches_udf_path(spark):
    """The default JVM extraction path and the Arrow-UDF path must produce
    the identical multiset of (src_url, dst_url) pairs."""
    from efficient_graph_algorithms_spark.sources.edges import raw_link_pairs

    pages = pages_df(spark, 300, seed=42, partitions=3)
    a = sorted(map(tuple, raw_link_pairs(pages, jvm=True).collect()))
    b = sorted(map(tuple, raw_link_pairs(pages, jvm=False).collect()))
    assert a == b
    assert len(a) > 0


def test_raw_link_pairs_jvm_matches_udf_path_adversarial(spark):
    """NBSP/Unicode-whitespace hrefs: the jvm path's intermediate strip must
    be Unicode-aware ((?U)) like Python str.strip() — an NBSP-only href
    strips to "" and is dropped by BOTH paths (was: jvm path kept it, then
    normalized it to an empty dst_url the UDF path never emits)."""
    from efficient_graph_algorithms_spark.sources.edges import raw_link_pairs

    adversarial = [
        ("adv_nbsp_only", "<a href='\u00a0'>nbsp-only href</a>".encode()),
        ("adv_nbsp_pad", "<a href='\u00a0https://nb.example/v\u00a0'>pad</a>".encode()),
        ("adv_nbsp_eq", "<a href\u00a0=\u00a0'https://nb.example/u'>eq</a>".encode()),
        ("adv_thinsp", "<a href='\u2009https://thin.example/w'>thin space</a>".encode()),
        ("adv_plain", b"<a href='https://ok.example/x'>plain</a>"),
    ]
    pages = spark.createDataFrame(adversarial, "url string, html binary")
    a = sorted(map(tuple, raw_link_pairs(pages, jvm=True).collect()))
    b = sorted(map(tuple, raw_link_pairs(pages, jvm=False).collect()))
    assert a == b
    assert ("adv_nbsp_only", "") not in a
    assert len(a) == 4


def test_assign_dense_ids_dedupes_input(spark):
    """Duplicate input urls collapse to one row each, ids stay dense-sorted
    — the dedup is fused into the range shuffle, no upstream distinct()."""
    urls = [f"u{i:03d}" for i in range(50)] * 3  # every url 3×
    df = spark.createDataFrame([(u,) for u in urls], ["url"]).repartition(7)
    out = assign_dense_ids(df, partitions=4).toPandas().sort_values("id")
    assert list(out["url"]) == sorted(set(urls))
    assert list(out["id"]) == list(range(50))
