"""Bloom filter vs a pure-Python mirror (same portable md5 hashes)."""

from __future__ import annotations

import pytest

from efficient_graph_algorithms_spark.functions.hashing import md5_60bit
from efficient_graph_algorithms_spark.operators.bloom import (
    bloom_build,
    bloom_contains,
)

MEMBERS = [f"https://site{i}.example/p/{i * 7}" for i in range(60)]
PROBES = MEMBERS[:20] + [f"https://other{i}.example/x" for i in range(40)]


def py_positions(key, k, m):
    return [md5_60bit(f"bloom{i}:{key}") % m for i in range(k)]


def py_bits(keys, k, m):
    return {p for key in keys for p in py_positions(key, k, m)}


def _df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "key string")


@pytest.mark.parametrize("m,k", [(1 << 16, 4), (256, 3)])
def test_bit_set_matches_python_mirror(spark, m, k):
    got = {
        r["pos"]
        for r in bloom_build(_df(spark, MEMBERS), m_bits=m, n_hashes=k).collect()
    }
    assert got == py_bits(MEMBERS, k, m)


def test_no_false_negatives_and_exact_verdicts(spark):
    m, k = 1 << 16, 4
    bloom = bloom_build(_df(spark, MEMBERS), m_bits=m, n_hashes=k)
    got = {
        r["key"]: r["maybe_member"]
        for r in bloom_contains(_df(spark, PROBES), bloom, m_bits=m, n_hashes=k).collect()
    }
    bits = py_bits(MEMBERS, k, m)
    assert set(got) == set(PROBES)
    for key in PROBES:
        want = all(p in bits for p in py_positions(key, k, m))
        assert got[key] == want
    for key in MEMBERS[:20]:  # true members always pass
        assert got[key] is True


def test_tiny_filter_saturates_to_false_positives(spark):
    """m=8: essentially every bit set → non-members collide through."""
    m, k = 8, 2
    bloom = bloom_build(_df(spark, MEMBERS), m_bits=m, n_hashes=k)
    got = bloom_contains(_df(spark, PROBES), bloom, m_bits=m, n_hashes=k)
    bits = py_bits(MEMBERS, k, m)
    fp = [
        key for key in PROBES[20:]
        if all(p in bits for p in py_positions(key, k, m))
    ]
    assert len(fp) > 0  # the python mirror predicts collisions...
    spark_yes = {r["key"] for r in got.collect() if r["maybe_member"]}
    assert set(fp) <= spark_yes  # ...and spark agrees on every one


def test_null_keys_ignored(spark):
    df = spark.createDataFrame([("a",), (None,)], "key string")
    bloom = bloom_build(df, m_bits=64, n_hashes=2)
    assert bloom.count() <= 2  # only 'a' contributes


def test_bad_params_raise(spark):
    with pytest.raises(ValueError, match="m_bits"):
        bloom_build(_df(spark, MEMBERS), m_bits=0)
