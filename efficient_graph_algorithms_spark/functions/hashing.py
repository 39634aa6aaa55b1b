"""Deterministic hashing utilities.

Two families:

1. ``splitmix64`` — vectorized numpy stateless RNG used by the synthetic
   pages generator. Purely a function of (seed, index, stream), so
   generation is identical under any partitioning/parallelism — the
   "seeded determinism" discipline of the reference
   (``reference src/ega/__init__.py:5`` seeds globally at import).

2. Portable 60-bit string hash, computable identically in Spark SQL and
   DuckDB SQL (``md5`` hex prefix → bigint). This is what the MinHash /
   SimHash operators use so every dedup query has an exact SQL oracle.
"""

from __future__ import annotations

import hashlib

import numpy as np

_U64 = np.uint64
MASK64 = _U64(0xFFFFFFFFFFFFFFFF)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer. x: uint64 array -> uint64 array."""
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x += _U64(0x9E3779B97F4A7C15)
        z = x
        z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
        z = z ^ (z >> _U64(31))
    return z


def hash_u64(seed: int, idx: np.ndarray, stream: int = 0) -> np.ndarray:
    """Stateless per-(seed, index, stream) uint64 hash."""
    base = _U64(seed & 0xFFFFFFFFFFFFFFFF)
    with np.errstate(over="ignore"):
        x = idx.astype(np.uint64) * _U64(0x9E3779B97F4A7C15) + base
        x = x ^ (_U64(stream) * _U64(0xD1B54A32D192ED03))
    return splitmix64(x)


def uniform01(seed: int, idx: np.ndarray, stream: int = 0) -> np.ndarray:
    """Deterministic U(0,1) floats from (seed, index, stream)."""
    return (hash_u64(seed, idx, stream) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


# ---------------------------------------------------------------------------
# Portable cross-engine string hash (Spark SQL == DuckDB SQL == Python).
# H(s) = int(md5(s).hexdigest()[:15], 16)   — 60 bits, fits in int64.
#   Spark : CAST(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT)
#   DuckDB: ('0x' || substr(md5(s), 1, 15))::BIGINT
# ---------------------------------------------------------------------------

def md5_60bit(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def md5_60bit_col(expr):
    """Column form of md5_60bit — THE single definition of the
    engine's portable hash as a pyspark expression. Every operator
    (dedup, sampling, cms, bloom, hashvec, text fingerprint) routes
    through here so the Spark side can never drift from md5_60bit and
    the SQL-oracle fragments below."""
    from pyspark.sql import functions as F

    return F.conv(F.substring(F.md5(expr), 1, 15), 16, 10).cast("long")


def spark_md5_60bit_sql(expr: str) -> str:
    """Spark SQL expression computing md5_60bit(expr)."""
    return f"CAST(conv(substr(md5({expr}), 1, 15), 16, 10) AS BIGINT)"


def duckdb_md5_60bit_sql(expr: str) -> str:
    """DuckDB SQL expression computing md5_60bit(expr)."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


# MinHash permutation family: h_i(x) = (a_i * x + b_i) mod p, applied to the
# portable 60-bit hash. p is a Mersenne prime below 2^61 so products stay in
# int128-free range only if computed carefully; both Spark and DuckDB do
# BIGINT arithmetic mod 2^64 with overflow errors, so we keep a_i, b_i small
# enough that a_i * x never overflows signed 64-bit: a_i < 8 (x < 2^60).
# Instead of affine-mod-prime we use XOR-with-seed then remix via one more
# multiply-free step: h_i(x) = ((x XOR seed_i) * 3 + seed_i) % LARGE. To stay
# overflow-safe and portable we use: h_i(x) = (x XOR seed_i) — XOR with a
# distinct 60-bit constant is a permutation of [0, 2^60), which is exactly
# what MinHash requires.
MINHASH_PRIME = (1 << 61) - 1


def minhash_seeds(k: int, seed: int = 42) -> list[int]:
    """k distinct 60-bit XOR keys (a permutation family over [0, 2^60))."""
    idx = np.arange(k, dtype=np.uint64)
    return [int(v) & ((1 << 60) - 1) for v in hash_u64(seed, idx, stream=7)]
