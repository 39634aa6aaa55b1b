"""Deterministic random-walk corpus: hash-argmin replay parity,
determinism, uniformity, dead-end and path-rollup contracts."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from efficient_graph_algorithms_spark.operators.walks import (
    random_walks,
    walk_choice_duck_sql,
)


def test_deterministic_and_dead_end(spark):
    edges = spark.createDataFrame([(0, 1), (1, 2), (0, 2)], "src long, dst long")
    c1, i1 = random_walks(spark, edges, walk_length=5)
    c2, _ = random_walks(spark, edges, walk_length=5)
    assert sorted(map(tuple, c1.collect())) == sorted(map(tuple, c2.collect()))
    # vertex 2 is a sink: its walk emits only step 0, and all walks die
    rows = sorted(map(tuple, c1.collect()))
    assert [r for r in rows if r[0] == 2] == [(2, 0, 2)]
    assert i1["live_walks"][-1] == 0 and i1["steps_run"] <= 5


def test_choice_is_uniform(spark):
    # star: 2000 walks from the center across 100 leaves ~ Binomial(2000, 1/100)
    star = spark.createDataFrame([(0, leaf) for leaf in range(1, 101)], "src long, dst long")
    src0 = spark.createDataFrame([(0,)], "id long")
    corpus, _ = random_walks(
        spark, star, walk_length=1, walks_per_vertex=2000, sources=src0
    )
    picks = [r.id for r in corpus.where("step = 1").collect()]
    cnt = np.bincount(picks, minlength=101)[1:]
    assert cnt.sum() == 2000
    # 5 sigma around the mean of 20 (sigma ~ 4.45)
    assert cnt.min() > 0 and cnt.max() < 20 + 5 * 4.45


def test_sql_replay_parity(spark):
    rng = np.random.default_rng(9)
    pairs = sorted(
        {
            (int(a), int(b))
            for a, b in zip(rng.integers(0, 50, 200), rng.integers(0, 50, 200))
            if a != b
        }
    )
    g = spark.createDataFrame(pairs, "src long, dst long")
    corpus, _ = random_walks(spark, g, walk_length=2, walks_per_vertex=1, seed=42)
    got = sorted(map(tuple, corpus.collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE e (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?)", pairs)
    h1 = walk_choice_duck_sql("walk", 1, "dst", 42)
    h2 = walk_choice_duck_sql("walk", 2, "dst", 42)
    q = f"""
    WITH v AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
    s0 AS (SELECT id AS walk, id AS cur FROM v),
    c1 AS (SELECT walk, dst, row_number() OVER (PARTITION BY walk ORDER BY {h1}, dst) rn
           FROM s0 JOIN e ON e.src = s0.cur),
    s1 AS (SELECT walk, dst AS cur FROM c1 WHERE rn = 1),
    c2 AS (SELECT walk, dst, row_number() OVER (PARTITION BY walk ORDER BY {h2}, dst) rn
           FROM s1 JOIN e ON e.src = s1.cur),
    s2 AS (SELECT walk, dst AS cur FROM c2 WHERE rn = 1)
    SELECT walk, 0 AS step, cur AS id FROM s0
    UNION ALL SELECT walk, 1, cur FROM s1
    UNION ALL SELECT walk, 2, cur FROM s2
    """
    assert got == sorted(map(tuple, con.execute(q).fetchall()))


def test_paths_rollup_and_walk_ids(spark):
    edges = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    paths, info = random_walks(spark, edges, walk_length=3, walks_per_vertex=2, as_paths=True)
    rows = {r.walk: r.path for r in paths.collect()}
    # walk = start_id * walks_per_vertex + walk_no
    assert set(rows) == {0, 1, 2, 3}
    assert info["n_walks"] == 4
    for w, p in rows.items():
        start = w // 2
        assert p[0] == start and len(p) == 4
        assert p == [start, 1 - start, start, 1 - start]  # 2-cycle alternates


def test_validation(spark):
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError, match="walk_length"):
        random_walks(spark, edges, walk_length=-1)
    with pytest.raises(ValueError, match="walks_per_vertex"):
        random_walks(spark, edges, walk_length=1, walks_per_vertex=0)


# ---------------------------------------------------------------------------
# node2vec-biased walks
# ---------------------------------------------------------------------------

def _n2v_python_replay(E, starts, steps, wr, wi, wo, seed=42):
    """Exact replica of node2vec_walks: integer-replicated candidates,
    argmin md5 hash, dst tie-break, prev initialized to the start."""
    from collections import defaultdict

    from efficient_graph_algorithms_spark.functions.hashing import md5_60bit

    adj = defaultdict(set)
    for a, b in E:
        if a != b:
            adj[a].add(b)
    rows = []
    for s in starts:
        prev, cur = s, s
        rows.append((s, 0, s))
        for t in range(1, steps + 1):
            best = None
            for dst in adj[cur]:
                w = wr if dst == prev else (wi if dst in adj[prev] else wo)
                for j in range(w):
                    h = md5_60bit(f"n2v:{s}:{t}:{dst}:{j}:w{seed}")
                    if best is None or (h, dst) < best:
                        best = (h, dst)
            if best is None:
                break
            prev, cur = cur, best[1]
            rows.append((s, t, cur))
    return sorted(rows)


def test_node2vec_matches_python_replay(spark):
    import numpy as np

    from efficient_graph_algorithms_spark.operators.walks import node2vec_walks

    rng = np.random.default_rng(17)
    E = sorted({(int(a), int(b)) for a, b in rng.integers(0, 18, (70, 2)) if a != b})
    edf = spark.createDataFrame(E, "src long, dst long")
    corpus, info = node2vec_walks(
        spark, edf, walk_length=4, w_return=1, w_in=4, w_out=2, seed=42
    )
    got = sorted((r["walk"], r["step"], r["id"]) for r in corpus.collect())
    starts = sorted({v for e in E for v in e})
    assert got == _n2v_python_replay(E, starts, 4, 1, 4, 2)
    assert info["n_walks"] == len(starts)


def test_node2vec_zero_return_weight_never_backtracks(spark):
    import numpy as np

    from efficient_graph_algorithms_spark.operators.walks import node2vec_walks

    rng = np.random.default_rng(23)
    E = sorted({(int(a), int(b)) for a, b in rng.integers(0, 12, (60, 2)) if a != b})
    # symmetrize so backtracking is always on offer
    E = sorted(set(E) | {(b, a) for a, b in E})
    edf = spark.createDataFrame(E, "src long, dst long")
    corpus, _ = node2vec_walks(
        spark, edf, walk_length=5, w_return=0, w_in=1, w_out=1, seed=7
    )
    paths = {}
    for r in corpus.collect():
        paths.setdefault(r["walk"], {})[r["step"]] = r["id"]
    assert paths
    for p in paths.values():
        seq = [p[t] for t in sorted(p)]
        for i in range(2, len(seq)):
            assert seq[i] != seq[i - 2], f"backtracked: {seq}"


def test_node2vec_bias_frequencies(spark):
    """Empirical check of the lottery-ticket weights: from c with
    prev=p the candidates are p (return, w=1), a (in prev's
    neighborhood, w=4), b (outward, w=2) — frequencies over many walk
    replicas approach 1/7, 4/7, 2/7."""
    from efficient_graph_algorithms_spark.operators.walks import node2vec_walks

    p, c, a, b = 0, 1, 2, 3
    E = [(p, c), (c, p), (c, a), (c, b), (p, a)]
    edf = spark.createDataFrame(E, "src long, dst long")
    srcs = spark.createDataFrame([(p,)], "id long")
    k = 600
    corpus, _ = node2vec_walks(
        spark, edf, walk_length=2, w_return=1, w_in=4, w_out=2,
        walks_per_vertex=k, sources=srcs, seed=13,
    )
    paths = {}
    for r in corpus.collect():
        paths.setdefault(r["walk"], {})[r["step"]] = r["id"]
    # among walks that went p -> c, count the step-2 choice
    counts = {p: 0, a: 0, b: 0}
    n = 0
    for pth in paths.values():
        if pth.get(1) == c and 2 in pth:
            counts[pth[2]] += 1
            n += 1
    assert n > 200  # ~half the replicas step to c first
    assert abs(counts[p] / n - 1 / 7) < 0.07
    assert abs(counts[a] / n - 4 / 7) < 0.09
    assert abs(counts[b] / n - 2 / 7) < 0.08
