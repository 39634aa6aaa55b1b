"""Frontier politeness sharding vs a pure-Python serpentine mirror."""

from __future__ import annotations

import pytest

from efficient_graph_algorithms_spark.operators.frontier import (
    frontier_shards,
    host_loads,
    shard_balance,
)


def _urls(spark, counts):
    rows = []
    for host, n in counts.items():
        rows += [(f"https://{host}/p{i}",) for i in range(n)]
    rows.append(("not a url",))  # unparseable → dropped
    return spark.createDataFrame(rows, "url string")


def py_serpentine(counts, s):
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    out = {}
    for r, (host, n) in enumerate(ranked):
        pos, block = r % s, r // s
        out[host] = pos if block % 2 == 0 else s - 1 - pos
    return out


COUNTS = {
    "big.example": 100, "mid-a.example": 40, "mid-b.example": 40,
    "small-a.example": 7, "small-b.example": 5, "small-c.example": 3,
    "tiny-a.example": 1, "tiny-b.example": 1,
}


def test_matches_python_serpentine(spark):
    s = 3
    got = {
        r["host"]: r["shard"]
        for r in frontier_shards(_urls(spark, COUNTS), s).collect()
    }
    assert got == py_serpentine(COUNTS, s)


def test_politeness_and_counts(spark):
    shards = frontier_shards(_urls(spark, COUNTS), 3)
    rows = shards.collect()
    # every host appears exactly once (politeness: one shard per host)
    assert sorted(r["host"] for r in rows) == sorted(COUNTS)
    assert all(r["n_pages"] == COUNTS[r["host"]] for r in rows)
    bal = {r["shard"]: r["n_pages"] for r in shard_balance(shards).collect()}
    assert sum(bal.values()) == sum(COUNTS.values())
    # serpentine keeps the spread below the biggest host's weight
    assert max(bal.values()) - min(bal.values()) <= max(COUNTS.values())


def test_one_shard_degenerate(spark):
    rows = frontier_shards(_urls(spark, COUNTS), 1).collect()
    assert {r["shard"] for r in rows} == {0}


def test_host_loads_drops_unparseable(spark):
    hosts = {r["host"] for r in host_loads(_urls(spark, COUNTS)).collect()}
    assert hosts == set(COUNTS)


def test_bad_shards_raise(spark):
    with pytest.raises(ValueError, match="n_shards"):
        frontier_shards(_urls(spark, COUNTS), 0)
