"""Crawl-frontier politeness sharding.

The crawl-scheduling primitive every web-scale fetcher needs (Heydon &
Najork's Mercator 1999, Lee et al.'s IRLbot 2008 — both public): urls
must be fetched host-serially (politeness), so the frontier is
partitioned BY HOST into n fetch shards, and the shards should carry
roughly equal page load even though host sizes are Zipf-skewed.

Deterministic serpentine (boustrophedon) assignment over the
size-ranked host list: rank hosts by page count descending, then deal
rank r into shard ``pos`` if ⌊r/S⌋ is even else ``S−1−pos`` (pos =
r mod S) — the classic snake draft, which bounds the load gap by the
largest host in the second block (vs plain round-robin's systematic
bias of shard 0 getting every block's biggest host). Greedy LPT would
be marginally tighter but is inherently sequential; serpentine is one
window over the HOST table — and hosts are ≪ pages (the contraction
argument of operators/contract.py), so the single-partition window
sort is a deliberate, bounded non-distributed step (a few hundred MB
of (host, count) pairs even at 100 TB of pages), not a data path.

No reference counterpart; engine extension in the §2.1/§2.12 family
(the operational face of the host-graph contraction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from efficient_graph_algorithms_spark.operators.contract import host_of


def host_loads(url_dict: DataFrame, url_col: str = "url") -> DataFrame:
    """(host, n_pages) from a url table; unparseable hosts dropped
    (host_of's NULL contract)."""
    return (
        url_dict.select(host_of(F.col(url_col)).alias("host"))
        .where(F.col("host").isNotNull())
        .groupBy("host")
        .agg(F.count("*").alias("n_pages"))
    )


def frontier_shards(
    url_dict: DataFrame,
    n_shards: int,
    url_col: str = "url",
) -> DataFrame:
    """Assign every host to one of ``n_shards`` fetch shards:
    (host, n_pages, rank, shard), serpentine over the size-desc
    (ties: host asc) ranking. All pages of a host land on one shard —
    the politeness invariant — by construction."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    loads = host_loads(url_dict, url_col)
    w = Window.orderBy(F.desc("n_pages"), F.asc("host"))
    r = F.row_number().over(w) - 1
    pos = r % n_shards
    block = F.floor(r / n_shards)
    shard = F.when(block % 2 == 0, pos).otherwise(n_shards - 1 - pos)
    return loads.select(
        "host", "n_pages", r.alias("rank"), shard.cast("int").alias("shard")
    )


def shard_balance(shards: DataFrame) -> DataFrame:
    """Per-shard load summary: (shard, n_hosts, n_pages) — the number
    every scheduler dashboard wants next to the assignment."""
    return shards.groupBy("shard").agg(
        F.count("*").alias("n_hosts"), F.sum("n_pages").alias("n_pages")
    )
