"""Snapshot diff vs a pure-Python set oracle."""

from __future__ import annotations

import numpy as np

from efficient_graph_algorithms_spark.operators.snapshot import (
    snapshot_diff,
    snapshot_diff_summary,
)


def _edges(spark, pairs):
    return spark.createDataFrame(sorted(pairs), "src long, dst long")


def _random_pairs(n, m, seed):
    rng = np.random.default_rng(seed)
    return {
        (int(a), int(b))
        for a, b in zip(rng.integers(0, n, m), rng.integers(0, n, m))
        if a != b
    }


def test_snapshot_diff_matches_set_oracle(spark):
    old = _random_pairs(40, 200, 1)
    new = _random_pairs(40, 200, 2)
    ed, vd = snapshot_diff(_edges(spark, old), _edges(spark, new))
    got_edges = {(r["src"], r["dst"], r["change"]) for r in ed.collect()}
    want_edges = {(s, d, "added") for s, d in new - old} | {
        (s, d, "removed") for s, d in old - new
    }
    assert got_edges == want_edges

    want_v: dict[int, list[int]] = {}
    for s, d in new - old:
        want_v.setdefault(s, [0, 0, 0, 0])[0] += 1
        want_v.setdefault(d, [0, 0, 0, 0])[2] += 1
    for s, d in old - new:
        want_v.setdefault(s, [0, 0, 0, 0])[1] += 1
        want_v.setdefault(d, [0, 0, 0, 0])[3] += 1
    got_v = {
        r["id"]: [r["out_added"], r["out_removed"], r["in_added"], r["in_removed"]]
        for r in vd.collect()
    }
    assert got_v == want_v

    s = snapshot_diff_summary(_edges(spark, old), _edges(spark, new))
    assert s == {
        "n_added": len(new - old),
        "n_removed": len(old - new),
        "n_stable": len(old & new),
    }


def test_snapshot_diff_identical_and_disjoint(spark):
    a = {(0, 1), (1, 2)}
    ed, vd = snapshot_diff(_edges(spark, a), _edges(spark, a))
    assert ed.count() == 0 and vd.count() == 0
    b = {(5, 6)}
    ed, _ = snapshot_diff(_edges(spark, a), _edges(spark, b))
    got = {(r["src"], r["dst"], r["change"]) for r in ed.collect()}
    assert got == {(5, 6, "added"), (0, 1, "removed"), (1, 2, "removed")}


def test_snapshot_diff_ignores_self_loops_and_dups(spark):
    old = spark.createDataFrame([(0, 1), (0, 1), (2, 2)], "src long, dst long")
    new = spark.createDataFrame([(0, 1), (3, 3)], "src long, dst long")
    ed, _ = snapshot_diff(old, new)
    assert ed.count() == 0
