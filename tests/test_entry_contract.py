"""Driver-contract smoke: entry() + a fast subset of queries()/oracle_sql()
at sf0.001. The full sf0.01 sweep is tools/check_parity.py (run in CI
fashion before each round; the driver replays it independently)."""

from __future__ import annotations

from pathlib import Path

import duckdb
import pytest

import __spark_entry__ as entrymod
from tools.check_parity import TABLES, compare

SF = "/root/testdata/sf0.001"

FAST_ORACLE_QUERIES = [
    "graph_degree_topk",
    "graph_gather_scatter",
    "rel_groupby_sum",
    "rel_window_argmax",
    "rel_topk",
    "text_features",
    "dedup_exact",
    "sim_cosine_topk",
    "events_user_activity",
    "video_frame_stats",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {f.name for f in df.schema.fields} == {"id", "rank", "in_degree"}
    # PageRank invariant on the top slice: positive, sorted
    ranks = [r["rank"] for r in rows]
    assert all(r > 0 for r in ranks)
    assert ranks == sorted(ranks, reverse=True)


def test_every_query_has_callable():
    qs = entrymod.queries()
    assert len(qs) >= 30
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    # full-convergence PageRank is the only query allowed to omit an
    # oracle (iterative to a data-dependent depth — not SQL-unrollable)
    assert set(qs) - set(oracles) == {"graph_pagerank_full"}


@pytest.mark.parametrize("name", FAST_ORACLE_QUERIES)
def test_query_matches_oracle_sf0001(spark, duck, name):
    sdf = entrymod.queries()[name](spark, SF).toPandas()
    odf = duck.execute(entrymod.oracle_sql()[name]).df()
    assert compare(sdf, odf) is None


def test_driver_row_window_covers_rotated_queries():
    """The driver records only the first 50 queries() entries. Guard the
    round-4 rotation: the entries that historically fell outside the
    window (multimodal_features, the streaming queries) plus the new
    events_sessionize, sim_ivf_topk, graph_hits and graph_host_graph
    must sit INSIDE the first 50; outside may sit only rows with 3+
    consecutive green rounds (CORRECTNESS_r01-r03 all-true) plus
    graph_coupling, the documented tail-side dual of the driver-rowed
    graph_cocitation (README 'Driver-row rotation')."""
    import __spark_entry__ as e

    names = list(e.queries().keys())
    window = set(names[:50])
    for must_have in ("multimodal_features", "stream_windowed_counts",
                      "events_user_activity", "events_sessionize",
                      "sim_ivf_topk", "graph_hits", "graph_host_graph",
                      "video_frame_stats", "graph_kcore3", "graph_anf2",
                      "graph_ktruss2", "graph_scc", "graph_walks2",
                      "graph_webstats", "dedup_clusters", "corpus_sample",
                      "graph_closeness2", "graph_cocitation"):
        assert must_have in window, f"{must_have} rotated out of the 50-row window"
    outside = set(names[50:])
    assert outside <= {"rel_scalar_math", "rel_date_filter", "rel_distinct",
                       "rel_histogram", "rel_union_except", "rel_topk",
                       "rel_semi_anti", "rel_percentiles", "rel_minplus_join",
                       "rel_groupby_sum", "rel_join_agg", "rel_window_argmax",
                       "rel_window_rank", "rel_set_ops",
                       "rel_onehot_mask", "rel_stats", "rel_zscore",
                       "rel_interp_metrics", "graph_coupling",
                       "graph_wpr3", "corpus_cap_source",
                       "graph_bowtie", "mirror_sources",
                       "corpus_pipeline",
                       # late-round-4 additions, each check_parity-green
                       # on landing (README 'Driver-row rotation')
                       "text_decontam", "text_pii", "text_repetition",
                       "sem_dedup", "image_jpeg_stats", "corpus_shards",
                       "graph_betweenness2", "graph_n2v2"}, outside
