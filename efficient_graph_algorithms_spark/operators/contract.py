"""Graph contraction: collapse the page-level link graph to a coarser
key (host/domain/community) graph.

The standard first step of web-scale link analysis — a 10¹¹-edge page
graph contracts to a ~10⁷-vertex host graph that every downstream
operator (PageRank, components, HITS) then runs on cheaply. No
reference counterpart (it has no URL/host notion); this is engine
surface for the web tier.

Spark-first shape: two equi-joins (edge endpoints → keys) followed by
one groupBy contraction with map-side partial counts — three shuffles
total, all on primitive keys, no UDFs. The mapping table is |V| rows
(far smaller than |E|), so at scale AQE picks shuffle-hash/broadcast
per partition size; nothing here is quadratic or driver-bound.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def host_of(url: Column) -> Column:
    """Registrable host of a URL, JVM-side (``try_parse_url(url,'HOST')``).

    Returns NULL for urls with no parseable host — contract_by_key
    drops endpoints with NULL keys, so garbage hrefs never form a
    phantom '' host vertex. try_parse_url (not parse_url) because under
    Spark 4's default ANSI mode parse_url *throws* INVALID_URL on
    malformed input, and a web-scale href table always contains some.
    """
    host = F.try_parse_url(url, F.lit("HOST"))
    return F.when(host == "", None).otherwise(host)


def contract_by_key(
    edges: DataFrame,
    mapping: DataFrame,
    keep_self_loops: bool = False,
) -> DataFrame:
    """Contract (src, dst) edges through mapping (id, key).

    Returns (src_key, dst_key, weight) where weight counts the
    underlying page-level edges between the two key groups. Endpoints
    whose id is missing from the mapping (or maps to a NULL key) are
    dropped. keep_self_loops: keep intra-group edges as (k, k, w) rows
    — off by default, matching how a host graph is consumed (internal
    site links dominate counts and carry no cross-host signal).
    """
    m = mapping.select("id", "key").where(F.col("key").isNotNull())
    src_m = m.select(F.col("id").alias("src"), F.col("key").alias("src_key"))
    dst_m = m.select(F.col("id").alias("dst"), F.col("key").alias("dst_key"))
    contracted = (
        edges.select("src", "dst")
        .join(src_m, "src")
        .join(dst_m, "dst")
        .groupBy("src_key", "dst_key")
        .agg(F.count("*").alias("weight"))
    )
    if not keep_self_loops:
        contracted = contracted.where(F.col("src_key") != F.col("dst_key"))
    return contracted


def host_graph(
    edges: DataFrame, url_dict: DataFrame, keep_self_loops: bool = False
) -> DataFrame:
    """Contract the extracted page graph to its host graph.

    edges: (src, dst) dense ids; url_dict: (id, url) from build_edges.
    Returns (src_key, dst_key, weight) with keys = hostnames.
    """
    mapping = url_dict.select("id", host_of(F.col("url")).alias("key"))
    return contract_by_key(edges, mapping, keep_self_loops=keep_self_loops)
