"""Regression tests for the round-5 code-review findings: each case
reproduces the reviewed failure scenario and pins the fixed behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_cms_width_inferred_and_validated(spark):
    """Probing a sketch with a mismatched width used to hash into the
    wrong counters and silently break estimate >= exact; now width is
    inferred from the zero-filled sketch and a provably-wrong explicit
    width raises."""
    from efficient_graph_algorithms_spark.operators.cms import (
        cms_build,
        cms_estimate,
    )

    docs = spark.createDataFrame(
        [(1, "a a a b"), (2, "a c")], "doc_id long, text string"
    )
    sketch = cms_build(docs, width=64, depth=3)
    cands = spark.createDataFrame([("a",), ("b",)], "term string")
    inferred = {
        r["term"]: r["estimate"] for r in cms_estimate(sketch, cands).collect()
    }
    explicit = {
        r["term"]: r["estimate"]
        for r in cms_estimate(sketch, cands, width=64).collect()
    }
    assert inferred == explicit
    assert inferred["a"] >= 4 and inferred["b"] >= 1  # CMS overcount bound
    with pytest.raises(ValueError, match="inconsistent"):
        cms_estimate(sketch, cands, width=32).collect()


def test_bloom_union_of_filters_no_false_negative(spark):
    """A filter assembled by unioning two built filters carries
    duplicate positions; probing it used to overcount hits past
    n_hashes and reject true members."""
    from efficient_graph_algorithms_spark.operators.bloom import (
        bloom_build,
        bloom_contains,
    )

    a = spark.createDataFrame([("x",), ("y",)], "key string")
    b = spark.createDataFrame([("y",), ("z",)], "key string")
    merged = bloom_build(a, m_bits=256, n_hashes=4).union(
        bloom_build(b, m_bits=256, n_hashes=4)
    )  # deliberately NOT distinct
    probes = spark.createDataFrame([("x",), ("y",), ("z",)], "key string")
    got = {
        r["key"]: r["maybe_member"]
        for r in bloom_contains(probes, merged, m_bits=256, n_hashes=4).collect()
    }
    assert got == {"x": True, "y": True, "z": True}


def test_sssp_rejects_null_weights(spark):
    """Null weights used to slip the w < 0 validation and silently
    drop their edges from every relaxation."""
    from efficient_graph_algorithms_spark.operators.sssp import shortest_paths

    edges = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, None)], "src long, dst long, w double"
    )
    sources = spark.createDataFrame([(0,)], "id long")
    with pytest.raises(ValueError, match="negative or null"):
        shortest_paths(spark, edges, sources)


def test_lm_score_with_id_col_named_id(spark):
    """score_perplexity(id_col='id') used to raise AMBIGUOUS_REFERENCE
    on its final join."""
    from efficient_graph_algorithms_spark.operators.lm import (
        score_perplexity,
        train_bigram_lm,
    )

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "c")], "id long, text string"
    )
    c2, c1, v = train_bigram_lm(docs, id_col="id", text_col="text")
    rows = {
        r["id"]: r["n_bigrams"]
        for r in score_perplexity(docs, c2, c1, v, id_col="id").collect()
    }
    assert rows == {1: 3, 2: 0}


def test_bm25_query_terms_normalized(spark):
    """A query term with surrounding or internal whitespace used to
    match no corpus token and score zero silently."""
    from efficient_graph_algorithms_spark.operators.bm25 import bm25_topk

    docs = spark.createDataFrame(
        [(1, "cache control headers"), (2, "other text")],
        "doc_id long, text string",
    )
    messy = bm25_topk(docs, ["  Cache   control "], k=2).collect()
    clean = bm25_topk(docs, ["cache", "control"], k=2).collect()
    assert [r.asDict() for r in messy] == [r.asDict() for r in clean]
    assert messy[0]["doc_id"] == 1 and messy[0]["n_terms"] == 2


def test_train_nb_single_scan_counts(spark):
    """The label now projects through the explode (no join back), so a
    duplicated doc_id doubles its token counts — not quadruples them
    through a 2x-explode x 2x-join match."""
    from efficient_graph_algorithms_spark.operators.classifier import train_nb

    labeled = spark.createDataFrame(
        [(1, "a a b", 1), (1, "a a b", 1), (2, "b", 0)],
        "doc_id long, text string, label int",
    )
    counts, _ = train_nb(labeled)
    got = {r["w"]: (r["c0"], r["c1"]) for r in counts.collect()}
    assert got == {"a": (0, 4), "b": (1, 2)}  # 2x, not 4x


def test_spam_mass_checkpoint_dirs_split(spark, tmp_path):
    """Sharing one checkpoint dir let the TrustRank run resume from
    the plain PageRank run's snapshots (personalization is not in the
    checkpoint params), silently zeroing spam_mass."""
    from efficient_graph_algorithms_spark.operators.trustrank import spam_mass

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (3, 0), (4, 0), (4, 3)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,)], "id long")
    ck = str(tmp_path / "ck")
    out, _ = spam_mass(spark, edges, seeds, checkpoint_dir=ck, tol=1e-10)
    rows = {r["id"]: r for r in out.collect()}
    # trust must differ from rank (seeded teleport vs uniform): the
    # non-seed-reachable-only vertex 4 has rank > 0 but trust ~ 0
    assert rows[4]["trust"] < rows[4]["rank"]
    assert rows[4]["spam_mass"] > 0.5
    import os

    assert os.path.isdir(f"{ck}/pagerank") and os.path.isdir(f"{ck}/trustrank")


def test_trustrank_seed_hygiene(spark):
    """Seeds absent from the graph used to deflate the teleport mass;
    duplicates duplicated vertex rows; empty seed sets crashed deep in
    pagerank."""
    from efficient_graph_algorithms_spark.operators.trustrank import trustrank

    edges = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    # seed 99 is not in the graph, seed 0 appears twice
    seeds = spark.createDataFrame([(0,), (0,), (99,)], "id long")
    trust, _ = trustrank(spark, edges, seeds, tol=1e-10)
    got = {r["id"]: r["rank"] for r in trust.collect()}
    assert len(got) == 2  # no duplicated vertex rows
    assert abs(sum(got.values()) - 1.0) < 1e-6  # no teleport-mass leak
    import pytest as _pt

    with _pt.raises(ValueError, match="no trusted seeds"):
        trustrank(spark, edges, spark.createDataFrame([(99,)], "id long"))


def test_pca_dim_with_null_first_row(spark):
    """_dim used to crash when the sampled row's vector was NULL."""
    from efficient_graph_algorithms_spark.operators.pca import pca_fit, project

    rows = [(0, None), (1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    model = pca_fit(emb, k=1)
    assert len(model["mean"]) == 2
    # string ids project too (schema derived from input, not assumed long)
    s_emb = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [0.0, 1.0])],
        "vec_id string, embedding array<double>",
    )
    got = project(s_emb, model).collect()
    assert sorted(r["vec_id"] for r in got) == ["a", "b"]


def test_dupspans_id_col_named_id(spark):
    """dup_span_stats(id_col='id') used to raise AMBIGUOUS_REFERENCE."""
    from efficient_graph_algorithms_spark.operators.dupspans import dup_span_stats

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "short")], "id long, text string"
    )
    rows = {r["id"]: r["n_windows"] for r in
            dup_span_stats(docs, width=8, id_col="id").collect()}
    assert rows == {1: 3, 2: 0}


def test_encode_int8_clamps_out_of_range(spark):
    """Codes from vectors exceeding the fitted absmax used to leave
    the int8 range silently."""
    from efficient_graph_algorithms_spark.operators.quantize import encode_int8

    emb = spark.createDataFrame(
        [(1, [2.0, -3.0, 0.5])], "vec_id long, embedding array<double>"
    )
    codes = encode_int8(emb, svec=[1.0, 1.0, 1.0]).first()["codes"]
    assert codes == [127, -127, 64]  # clamped, clamped, round(0.5*127)


def test_media_hashes_drop_unsupported_variants(spark):
    """Recognized-but-unsupported payloads (progressive JPEG, 24-bit
    WAV) raise NotImplementedError in the decoders; the permissive
    hash faces must DROP them, not kill the Spark job."""
    import numpy as np

    from efficient_graph_algorithms_spark.operators.audiohash import audio_afps
    from efficient_graph_algorithms_spark.operators.imagehash import image_dhashes
    from efficient_graph_algorithms_spark.operators.multimodal import (
        encode_bmp24,
        encode_jpeg,
        encode_wav_pcm16,
    )

    rng = np.random.default_rng(7)
    good_img = encode_bmp24(rng.integers(0, 256, (16, 18, 3), dtype=np.uint8))
    prog = bytearray(encode_jpeg(rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)))
    i = bytes(prog).find(b"\xff\xc0")
    assert i > 0
    prog[i + 1] = 0xC2  # SOF0 -> SOF2: progressive, unsupported
    imgs = spark.createDataFrame(
        [(1, bytearray(good_img)), (2, prog)], "media_id long, payload binary"
    )
    got = image_dhashes(imgs).collect()
    assert [r["media_id"] for r in got] == [1]  # progressive dropped, job alive

    good_wav = encode_wav_pcm16(rng.uniform(-1, 1, (20000, 1)), 8000)
    bad = bytearray(good_wav)
    bad[34] = 24  # bits-per-sample 16 -> 24: unsupported PCM variant
    auds = spark.createDataFrame(
        [(1, bytearray(good_wav)), (2, bad)], "media_id long, payload binary"
    )
    got = audio_afps(auds).collect()
    assert {r["media_id"] for r in got} == {1}


def test_node2vec_surviving_with_w_in_zero(spark):
    """prev=cur initialization classified all step-1 candidates as
    w_in moves, so w_in=0 killed every walk at step 1; step 1 now
    falls back to uniform weight."""
    from efficient_graph_algorithms_spark.operators.walks import node2vec_walks

    edges = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (2, 1), (2, 0), (0, 2)], "src long, dst long"
    )
    corpus, info = node2vec_walks(
        spark, edges, walk_length=3, w_return=1, w_in=0, w_out=2
    )
    steps = corpus.groupBy("step").count().collect()
    by_step = {r["step"]: r["count"] for r in steps}
    assert by_step.get(1, 0) > 0  # walks survive step 1
    assert max(by_step) >= 2


def test_fgw_barycenter_sparse_equals_dense_features(spark):
    """The sqeuclidean metric used to drop implicit-zero COO feature
    entries (join-on-d covered only dims with rows); the norm
    decomposition makes sparse input (zero rows OMITTED) produce
    exactly the dense-input result."""
    import numpy as np

    from efficient_graph_algorithms_spark.operators.gw_fw import fgw_barycenter

    n, d, ns = 2, 2, 3
    cost = np.array([[0, 1, 0.5], [1, 0, 1], [0.5, 1, 0]])
    # one-hot-ish features with real zeros; node 2 is ALL-zero
    y = np.array([[1.0, 0.0], [0.0, 1.0], [0.0, 0.0]])
    p = np.array([0.5, 0.3, 0.2])
    p_c = np.array([0.6, 0.4])
    init_c = np.array([[0.0, 1.0], [1.0, 0.0]])

    def run(feat_rows):
        feats = {0: spark.createDataFrame(feat_rows, "i long, d long, y double")}
        costs = {
            0: spark.createDataFrame(
                [(i, j, float(cost[i, j])) for i in range(ns) for j in range(ns)],
                "i long, j long, c double",
            )
        }
        ps = {0: spark.createDataFrame([(i, float(p[i])) for i in range(ns)], "i long, p double")}
        pc = spark.createDataFrame([(j, float(p_c[j])) for j in range(n)], "j long, p double")
        x_df, c_df, t_dfs, _ = fgw_barycenter(
            spark, feats, costs, ps, pc,
            init_c=spark.createDataFrame(
                [(i, j, float(init_c[i, j])) for i in range(n) for j in range(n)],
                "i long, j long, c double",
            ),
            init_x=spark.createDataFrame(
                [(j, k, 0.0) for j in range(n) for k in range(d)],
                "j long, d long, x double",
            ),
            max_iter=2, tol=0.0, fw_iter=3,
        )
        xs = sorted((r["j"], r["d"], round(r["x"], 12)) for r in x_df.collect())
        ts = sorted(
            (r["i"], r["j"], round(r["t"], 12)) for r in t_dfs[0].collect()
        )
        return xs, ts

    dense = [(i, k, float(y[i, k])) for i in range(ns) for k in range(d)]
    sparse = [(i, k, float(y[i, k])) for i in range(ns) for k in range(d) if y[i, k] != 0.0]
    assert run(sparse) == run(dense)


def test_bowtie_self_loop_only_vertex(spark):
    """A vertex whose only edges are self-loops was absent from the
    weak-CC table and silently dropped from the bowtie output (or
    crashed when it was the core)."""
    from efficient_graph_algorithms_spark.operators.scc import bowtie_classes

    edges = spark.createDataFrame(
        [(0, 0), (1, 2), (2, 1)], "src long, dst long"
    )
    out, info = bowtie_classes(spark, edges)
    rows = {r["id"]: r["cls"] for r in out.collect()}
    assert rows[1] == "CORE" and rows[2] == "CORE"
    assert rows[0] == "DISC"  # present, disconnected from the core
    # the reviewer's crash shape: core vertex itself self-loop-only
    edges2 = spark.createDataFrame([(1, 1), (2, 3)], "src long, dst long")
    out2, _ = bowtie_classes(spark, edges2)
    assert out2.count() == 3  # no crash, every vertex classified


def test_cosine_pairs_grid_equals_brute_at_boundary(spark):
    """The grid eps is derived from the ROUNDED-cosine acceptance
    boundary, so a pair whose true cosine sits just below the
    threshold but rounds up is found by both methods."""
    import math

    from efficient_graph_algorithms_spark.operators.similarity import cosine_pairs

    th = 0.95
    c = 0.94996  # rounds to 0.9500 >= th, but true cos < th
    rows = [
        (1, [1.0, 0.0]),
        (2, [c, math.sqrt(1 - c * c)]),
        (3, [-1.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    grid = sorted(
        (r["a"], r["b"], r["cos"])
        for r in cosine_pairs(emb, threshold=th, method="grid").collect()
    )
    brute = sorted(
        (r["a"], r["b"], r["cos"])
        for r in cosine_pairs(emb, threshold=th, method="brute").collect()
    )
    assert grid == brute == [(1, 2, 0.95)]
    # empty input: grid returns empty instead of crashing on first()
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert cosine_pairs(empty, threshold=th, method="grid").count() == 0


def test_cosine_topk_separate_namespace(spark):
    """qid == vec_id used to be dropped unconditionally; with an
    independent query id space that silently removed a legitimate
    neighbor."""
    from efficient_graph_algorithms_spark.operators.similarity import cosine_topk

    corpus = spark.createDataFrame(
        [(7, [1.0, 0.0]), (8, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    queries = spark.createDataFrame(
        [(7, [1.0, 0.0])], "qid long, embedding array<double>"
    )  # qid 7 coincides with unrelated corpus vec_id 7
    default = cosine_topk(corpus, queries, k=1).collect()
    assert [r["vec_id"] for r in default] == [8]  # shared-namespace default
    separate = cosine_topk(corpus, queries, k=1, exclude_self=False).collect()
    assert [r["vec_id"] for r in separate] == [7]  # true nearest kept


def test_decontam_blank_probe_not_contaminating(spark):
    """A blank probe row emitted the empty-string shingle and flagged
    every blank training doc as contaminated."""
    from efficient_graph_algorithms_spark.operators.decontam import decontaminate

    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "real content words here okay fine yes")],
        "doc_id long, text string",
    )
    probes = spark.createDataFrame([("",), ("   ",)], "text string")
    hits = decontaminate(docs, probes, width=3)
    assert hits.count() == 0


def test_sessionize_stream_non_utc_session(spark, tmp_path):
    """The streaming sessionizer compared session-LOCAL naive event
    micros against the UTC watermark, finalizing sessions hours early
    on non-UTC sessions (splitting sessions a later admissible event
    should have extended); null values poisoned sums with NaN. Both
    now match the batch result under America/Los_Angeles."""
    import os
    import time as _time

    import pandas as pd

    from efficient_graph_algorithms_spark.streaming.sessions import (
        sessionize,
        sessionize_stream,
    )

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, payload string"
    )
    from datetime import datetime, timedelta

    t0 = datetime(2026, 3, 20, 12, 0, 0)
    h = timedelta(hours=1)
    rows = [
        (1, t0, 1, "a", 1.5, "{}"),
        (2, t0 + 2 * h, 2, "a", 2.0, "{}"),          # advances watermark
        (3, t0 + 2 * h, 1, "a", None, "{}"),          # must MERGE with event 1
        (4, t0 + 30 * h, 3, "a", None, "{}"),         # all-null session
    ]
    sentinel = (999, t0 + timedelta(days=400), -1, "s", 0.0, "{}")
    events = spark.createDataFrame(rows, schema)

    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try:
        sdir = tmp_path / "tz_stream"
        chunks = [rows[:1], rows[1:2], rows[2:3], rows[3:4], [sentinel]]
        for i, c in enumerate(chunks):
            p = sdir / f"chunk{i}"
            spark.createDataFrame(c, schema).coalesce(1).write.parquet(str(p))
            for f in p.glob("*.parquet"):
                os.utime(f, (1_700_000_000 + i, 1_700_000_000 + i))
            _time.sleep(0.01)
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{sdir}/chunk*")
        )
        q = (
            sessionize_stream(stream, gap_sec=3 * 3600, watermark="1 hour")
            .writeStream.format("memory")
            .queryName("sess_tz")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(240)
        got = spark.sql("select * from sess_tz where user_id >= 0").toPandas()
        want = (
            sessionize(events, gap_sec=3 * 3600).drop("session_idx").toPandas()
        )

        def norm(df):
            df = df.copy()
            for c in ("session_start", "session_end"):
                df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
            df["sum_value"] = df["sum_value"].astype("Float64")
            cols = ["user_id", "session_start", "session_end", "n_events", "sum_value"]
            return sorted(df[cols].itertuples(index=False), key=str)

        assert len(got) == len(want) == 3
        assert norm(got) == norm(want)
        byuser = {r["user_id"]: r for _, r in got.iterrows()}
        assert byuser[1]["n_events"] == 2  # NOT split by early finalization
        assert byuser[1]["sum_value"] == 1.5  # null skipped, not NaN
        assert pd.isna(byuser[3]["sum_value"])  # all-null -> NULL
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
