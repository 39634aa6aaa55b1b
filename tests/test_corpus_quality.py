"""Decontamination, PII and repetition operators vs pure-Python oracles."""

from __future__ import annotations

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from efficient_graph_algorithms_spark.operators.decontam import decontaminate
from efficient_graph_algorithms_spark.operators.pii import (
    EMAIL_RE,
    IPV4_RE,
    pii_features,
)
from efficient_graph_algorithms_spark.operators.repetition import repetition_features

DOCS = [
    (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (1, "alpha beta gamma delta epsilon zeta different tail here now"),
    (2, "no overlap with anything else in this corpus at all truly"),
    (3, "spam spam spam spam spam spam spam spam spam spam"),
    (4, "one two one two one two one two one two one two"),
    (5, "tiny doc"),
]

PROBES = [
    # first 6-gram of doc 0/1's shared prefix -> contaminates both
    ("alpha beta gamma delta epsilon zeta",),
    # matches nothing
    ("purple monkey dishwasher quantum flux capacitor",),
]


def _norm(t: str) -> str:
    return re.sub(r"\s+", " ", t.strip().lower())


def _grams(t: str, w: int) -> set[str]:
    toks = _norm(t).split(" ")
    if len(toks) < w:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + w]) for i in range(len(toks) - w + 1)}


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_decontaminate_matches_python(spark, docs_df):
    probes_df = spark.createDataFrame(PROBES, "text string")
    got = {
        (r["doc_id"], r["n_hits"])
        for r in decontaminate(docs_df, probes_df, width=6).collect()
    }
    probe_grams = set().union(*(_grams(p, 6) for (p,) in PROBES))
    exp = set()
    for i, t in DOCS:
        hits = len(_grams(t, 6) & probe_grams)
        if hits:
            exp.add((i, hits))
    assert got == exp
    assert got, "planted contamination must be detected"
    assert {i for i, _ in got} == {0, 1}


def test_decontaminate_broadcasts_probes(spark, docs_df):
    probes_df = spark.createDataFrame(PROBES, "text string")
    plan = decontaminate(docs_df, probes_df)._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan, "probe side must broadcast, never shuffle the corpus"


def test_pii_counts_and_redaction(spark):
    rows = [
        (0, "write to alice.smith@example.org or bob@test.co today"),
        (1, "server at 10.1.2.3 and fallback 192.168.0.254 up"),
        (2, "mixed: carol+x@a.io from 8.8.8.8"),
        (3, "nothing sensitive here"),
        (4, "not an ip 1234.5.6.7890 half"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in pii_features(df).collect()}
    for i, t in rows:
        assert got[i]["n_emails"] == len(re.findall(EMAIL_RE, t)), (i, t)
        assert got[i]["n_ips"] == len(re.findall(IPV4_RE, t)), (i, t)
    assert got[0]["n_emails"] == 2 and got[0]["n_ips"] == 0
    assert got[1]["n_ips"] == 2 and got[1]["n_emails"] == 0
    assert got[2]["n_emails"] == 1 and got[2]["n_ips"] == 1
    assert got[3]["n_emails"] == 0 and got[3]["n_ips"] == 0
    # \b can't sit between two digits, so 1234.5.6.7890 yields no match
    # in either engine
    assert got[4]["n_ips"] == 0


def test_pii_redacted_fingerprint_changes_only_pii_docs(spark):
    rows = [(0, "mail me at x@y.zz now"), (1, "plain text only")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from efficient_graph_algorithms_spark.functions.text import fingerprint60

    out = {r["doc_id"]: r["redacted_fp"] for r in pii_features(df).collect()}
    raw = {
        r["doc_id"]: r["fp"]
        for r in df.select("doc_id", fingerprint60(F.col("text")).alias("fp")).collect()
    }
    assert out[0] != raw[0], "redaction must change the fingerprint of PII docs"
    assert out[1] == raw[1], "non-PII docs must keep their fingerprint"


def test_repetition_matches_python(spark, docs_df):
    got = {r["doc_id"]: r.asDict() for r in repetition_features(docs_df).collect()}
    for i, t in DOCS:
        toks = _norm(t).split(" ")
        assert got[i]["n_tokens"] == len(toks)
        exp_dup = round(1.0 - len(set(toks)) / len(toks), 6)
        assert got[i]["dup_token_frac"] == pytest.approx(exp_dup, abs=1e-9)
        if len(toks) >= 2:
            bg = Counter(
                " ".join(toks[j : j + 2]) for j in range(len(toks) - 1)
            )
            exp_top = round(max(bg.values()) / sum(bg.values()), 6)
        else:
            exp_top = 0.0
        assert got[i]["top_bigram_frac"] == pytest.approx(exp_top, abs=1e-9)
    # the pathological repeats score at the top
    assert got[3]["dup_token_frac"] > 0.8 and got[3]["top_bigram_frac"] == 1.0
    assert got[4]["top_bigram_frac"] > 0.4
    assert got[2]["dup_token_frac"] == 0.0


# ---------------------------------------------------------------------------
# SemDeDup (embedding-level semantic dedup)
# ---------------------------------------------------------------------------

def _semdedup_vectors():
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.normal(size=(10, 8))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
    # planted near-dups: 10+i is a tiny perturbation of i (cos ~ 1)
    for i in range(3):
        pert = base[i] + rng.normal(scale=1e-3, size=8)
        rows.append((10 + i, [float(x) for x in pert]))
    return rows


def _keep_oracle(rows, threshold):
    import numpy as np

    ids = [i for i, _ in rows]
    vecs = {i: np.asarray(v) for i, v in rows}
    keep = {}
    for x in ids:
        drop = False
        for y in ids:
            if y < x:
                vx, vy = vecs[x], vecs[y]
                c = round(float(vx @ vy / (np.linalg.norm(vx) * np.linalg.norm(vy))), 4)
                if c >= threshold:
                    drop = True
                    break
        keep[x] = 0 if drop else 1
    return keep


def test_semantic_dedup_exhaustive_matches_python(spark):
    from efficient_graph_algorithms_spark.operators.similarity import semantic_dedup

    rows = _semdedup_vectors()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: r["keep"]
        for r in semantic_dedup(df, threshold=0.95, n_centroids=1).collect()
    }
    assert got == _keep_oracle(rows, 0.95)
    # the three planted dups are dropped, their originals kept
    assert all(got[10 + i] == 0 for i in range(3))
    assert all(got[i] == 1 for i in range(3))


def test_semantic_dedup_clustering_only_under_deletes(spark):
    """The clustered scale path misses only CROSS-cluster pairs, so its
    kept set must be a superset of the exhaustive kept set."""
    from efficient_graph_algorithms_spark.operators.similarity import semantic_dedup

    rows = _semdedup_vectors()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exhaustive = {
        r["vec_id"]
        for r in semantic_dedup(df, threshold=0.95, n_centroids=1).collect()
        if r["keep"] == 1
    }
    clustered = {
        r["vec_id"]
        for r in semantic_dedup(
            df, threshold=0.95, n_centroids=4, n_iter=3
        ).collect()
        if r["keep"] == 1
    }
    assert clustered >= exhaustive


def test_semantic_dedup_deterministic(spark):
    from efficient_graph_algorithms_spark.operators.similarity import semantic_dedup

    rows = _semdedup_vectors()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    r1 = sorted(map(tuple, semantic_dedup(df, n_centroids=4, seed=9).collect()))
    r2 = sorted(map(tuple, semantic_dedup(df, n_centroids=4, seed=9).collect()))
    assert r1 == r2


# ---------------------------------------------------------------------------
# Training-shard packing (distributed prefix sum)
# ---------------------------------------------------------------------------

def _shard_docs():
    return [(i, " ".join(["w"] * (5 + (i * 7) % 23))) for i in range(60)]


def _shard_oracle(rows, shard_tokens, seed=42):
    import hashlib

    def h60(i):
        return int(hashlib.md5(f"shrd:{seed}:{i}".encode()).hexdigest()[:15], 16)

    order = sorted(rows, key=lambda r: (h60(r[0]), r[0]))
    out, cum = {}, 0
    for i, t in order:
        n = len(t.split())
        out[i] = (n, cum // shard_tokens)
        cum += n
    return out


def test_assign_shards_matches_python(spark):
    from efficient_graph_algorithms_spark.operators.sampling import assign_shards

    rows = _shard_docs()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tok"], r["shard_id"])
        for r in assign_shards(df, shard_tokens=100).collect()
    }
    assert got == _shard_oracle(rows, 100)
    # shards are contiguous 0..max with every shard boundary respected
    sizes = {}
    for n, s in got.values():
        sizes[s] = sizes.get(s, 0) + n
    assert set(sizes) == set(range(max(sizes) + 1))


def test_assign_shards_partition_invariant(spark):
    """The scale-correctness property: the two-phase prefix sum gives
    the IDENTICAL packing for any range count (1 range = the serial
    global cumsum; 7 and 32 exercise real multi-range offsets)."""
    from efficient_graph_algorithms_spark.operators.sampling import assign_shards

    rows = _shard_docs()
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(5)
    packs = [
        sorted(
            map(
                tuple,
                assign_shards(df, shard_tokens=100, n_ranges=p).collect(),
            )
        )
        for p in (1, 7, 32)
    ]
    assert packs[0] == packs[1] == packs[2]


def test_assign_shards_rejects_bad_size(spark):
    from efficient_graph_algorithms_spark.operators.sampling import assign_shards

    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        assign_shards(df, shard_tokens=0)


def test_pii_plan_is_scan_stage_only(spark):
    """The scale claim in docs/SCALE.md: PII detect+redact is pure
    codegen column work — ZERO exchanges in the executed plan."""
    df = spark.createDataFrame([(0, "x@y.zz")], "doc_id long, text string")
    plan = pii_features(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pii_mixed_case_and_ip_local_part(spark):
    """Review fixes pinned: (a) mixed-case emails match via (?i) in
    both engines; (b) an IP-shaped email local part counts as one
    email and ZERO ips — counts always equal the placeholders the
    sequential redaction actually places."""
    rows = [
        (0, "Contact Bob@Example.COM today"),
        (1, "from 1.2.3.4@example.com ok"),
        (2, "plain 1.2.3.4 host"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in pii_features(df).collect()}
    assert got[0]["n_emails"] == 1 and got[0]["n_ips"] == 0
    assert got[1]["n_emails"] == 1 and got[1]["n_ips"] == 0
    assert got[2]["n_emails"] == 0 and got[2]["n_ips"] == 1
    from efficient_graph_algorithms_spark.functions.text import fingerprint60

    raw = {
        r["doc_id"]: r["fp"]
        for r in df.select("doc_id", fingerprint60(F.col("text")).alias("fp")).collect()
    }
    assert got[0]["redacted_fp"] != raw[0], "mixed-case email must be redacted"


def test_repetition_empty_doc_zero_tokens(spark):
    df = spark.createDataFrame(
        [(0, ""), (1, "   "), (2, "a b a")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r.asDict() for r in repetition_features(df).collect()}
    for i in (0, 1):
        assert got[i]["n_tokens"] == 0
        assert got[i]["dup_token_frac"] == 0.0
        assert got[i]["top_bigram_frac"] == 0.0
    assert got[2]["n_tokens"] == 3


def test_pii_and_repetition_null_text_behaves_as_empty(spark):
    """r5 advice fix: NULL text must not leak non-ANSI size(NULL) = -1
    into the counts (the CLI reads arbitrary parquet, so null text rows
    are a real input class). NULL behaves exactly like ''."""
    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "x@y.zz at 1.2.3.4")],
        "doc_id long, text string",
    )
    pii = {r["doc_id"]: r.asDict() for r in pii_features(df).collect()}
    assert pii[0]["n_emails"] == 0 and pii[0]["n_ips"] == 0
    assert pii[0]["redacted_fp"] == pii[1]["redacted_fp"]
    assert pii[2]["n_emails"] == 1 and pii[2]["n_ips"] == 1
    rep = {r["doc_id"]: r.asDict() for r in repetition_features(df).collect()}
    assert rep[0]["n_tokens"] == 0
    assert rep[0]["dup_token_frac"] == 0.0
    assert rep[0]["top_bigram_frac"] == 0.0
