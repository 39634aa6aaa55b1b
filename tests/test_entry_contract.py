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
    # round 5 closed the last no-oracle row (graph_pagerank_full now
    # carries an unrolled-to-convergence CTE): EVERY query has an oracle
    assert set(qs) == set(oracles)


@pytest.mark.parametrize("name", FAST_ORACLE_QUERIES)
def test_query_matches_oracle_sf0001(spark, duck, name):
    sdf = entrymod.queries()[name](spark, SF).toPandas()
    odf = duck.execute(entrymod.oracle_sql()[name]).df()
    assert compare(sdf, odf) is None


def test_driver_row_window_covers_rotated_queries():
    """The driver records only the first 50 queries() entries. Guard the
    round-5 rotation (README 'Driver-row rotation'): the 14 round-4
    tail queries that had never earned a driver row plus the new
    graph_gw_partition must sit INSIDE the first 50; outside may sit
    only the rel_* family (hash-green r1-r3), the 15 queries rotated
    out with FOUR consecutive green rounds, and the round-5 tail
    additions (text_boilerplate, text_dup_spans — check_parity-green
    on landing)."""
    import __spark_entry__ as e

    names = list(e.queries().keys())
    window = set(names[:50])
    for must_have in ("graph_coupling", "graph_wpr3", "graph_bowtie",
                      "graph_betweenness2", "graph_n2v2",
                      "corpus_cap_source", "corpus_pipeline",
                      "corpus_shards", "mirror_sources", "sem_dedup",
                      "text_decontam", "text_pii", "text_repetition",
                      "image_jpeg_stats", "graph_gw_partition",
                      # standing members that must not fall out
                      "multimodal_features", "stream_windowed_counts",
                      "events_sessionize", "graph_pagerank_full"):
        assert must_have in window, f"{must_have} rotated out of the 50-row window"
    outside = set(names[50:])
    assert outside <= {"rel_scalar_math", "rel_date_filter", "rel_distinct",
                       "rel_histogram", "rel_union_except", "rel_topk",
                       "rel_semi_anti", "rel_percentiles", "rel_minplus_join",
                       "rel_groupby_sum", "rel_join_agg", "rel_window_argmax",
                       "rel_window_rank", "rel_set_ops",
                       "rel_onehot_mask", "rel_stats", "rel_zscore",
                       "rel_interp_metrics",
                       # round-5 rotations out, each with 4 green rounds
                       # (CORRECTNESS_r01-r04 all-true)
                       "dedup_exact", "dedup_ngram_jaccard",
                       "dedup_minhash_lsh", "dedup_simhash", "graph_dsd",
                       "graph_epsilon_nn", "graph_heat2",
                       "graph_interp_ratio", "graph_rw2",
                       "graph_sinkhorn3", "graph_subgraph",
                       "graph_triangles_per_vertex", "sim_cosine_pairs",
                       "sim_cosine_topk", "text_features",
                       # round-5 tail additions, check_parity-green
                       "text_boilerplate", "text_dup_spans",
                       "graph_salsa2", "dedup_verdicts",
                       "graph_spam_mass3", "emb_gram",
                       "text_lm_score", "graph_linkpred",
                       "graph_local_cc", "text_bm25",
                       "text_nb_quality", "graph_mis2",
                       "graph_harmonic2", "graph_powerlaw",
                       "graph_diff", "emb_quantize",
                       "text_anchors", "graph_pr_warm",
                       "graph_modularity", "text_cms",
                       "text_hashvec", "graph_frontier",
                       "graph_bloom_seen", "graph_sssp2",
                       "image_dhash", "audio_afp",
                       "video_dhash", "graph_redirects",
                       "text_robots", "text_sitemaps"}, outside
