"""Co-citation and bibliographic coupling — the classic link-analysis
similarity signals (Small 1973 / Kessler 1963; the HITS-era web pair
statistics):

- co-citation(a, b)   = |{s : s->a and s->b}|   (shared CITERS)
- coupling(a, b)      = |{t : a->t and b->t}|   (shared CITATIONS)

Both are wedge self-joins on the directed edge table: co-citation
joins on ``src`` (a source's out-list yields C(d_out, 2) pairs),
coupling on ``dst``. The skew risk is the same as hot shingles in
dedup: a navigation/boilerplate page linking to thousands of targets
contributes O(d^2) pairs AND a near-meaningless similarity signal, so
both operators take a degree cap that drops hub rows from pair
generation (the standard practice; capped rows are counted in the
returned info). With the cap, pair volume is bounded by
sum_s min(d_s, cap)^2 — never the all-pairs blow-up.

No reference counterpart (the reference ships undirected kernels
only); this is the directed-pair face of the ICN/common-neighbor
statistic in ``reference src/ega/algorithms/graph_kernels.py:109-112``.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pair_counts(
    e: DataFrame,
    key: str,
    item: str,
    min_count: int,
    degree_cap: int | None,
    info: dict[str, Any] | None = None,
) -> DataFrame:
    """Count pairs of ``item`` values sharing a ``key`` value, after
    dropping keys whose item-degree exceeds ``degree_cap``. When an
    ``info`` dict is passed, the number of capped (dropped) keys is
    counted into ``info['n_capped_keys']`` (one small aggregate job)."""
    base = e.select(key, item).distinct()
    if degree_cap is not None:
        # persist the pre-cap distinct: the hot-key aggregate (and its
        # count job) plus the anti-join all read it — without the cache
        # the dominant distinct shuffle ran once for the count and
        # again when the wedge materialized
        base = base.persist()
        hot = (
            base.groupBy(key)
            .agg(F.count("*").alias("d"))
            .where(F.col("d") > degree_cap)
            .select(key)
        )
        if info is not None:
            info["n_capped_keys"] = hot.count()
        base = base.join(hot, key, "left_anti")
    elif info is not None:
        info["n_capped_keys"] = 0
    # both wedge sides read base: persist so the scan + distinct + cap
    # anti-join run once (the triangles.py oriented-edges convention).
    # Deliberately NOT unpersisted here — the returned plan is lazy and
    # still reads it; Spark's ContextCleaner drops the cached blocks once
    # the caller releases the result (same lifecycle as triangles.py).
    base = base.persist()
    x = base.select(F.col(key).alias("_k"), F.col(item).alias("a"))
    y = base.select(F.col(key).alias("_k"), F.col(item).alias("b"))
    return (
        x.join(y, "_k")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_common"))
        .where(F.col("n_common") >= min_count)
    )


def cocitation_pairs(
    edges: DataFrame, min_count: int = 2, degree_cap: int | None = 256
) -> DataFrame:
    """(a, b, n_common) with a < b: number of common in-link sources,
    over sources with out-degree <= degree_cap."""
    return _pair_counts(
        edges.select("src", "dst"), "src", "dst", min_count, degree_cap
    )


def coupling_pairs(
    edges: DataFrame, min_count: int = 2, degree_cap: int | None = 256
) -> DataFrame:
    """(a, b, n_common) with a < b: number of common out-link targets,
    over targets with in-degree <= degree_cap."""
    return _pair_counts(
        edges.select("src", "dst"), "dst", "src", min_count, degree_cap
    )


def cocitation_topk(
    edges: DataFrame,
    k: int = 20,
    min_count: int = 2,
    degree_cap: int | None = 256,
    mode: str = "cocitation",
) -> tuple[DataFrame, dict[str, Any]]:
    """Top-k most co-cited (or most-coupled) page pairs, totally
    ordered by (n_common desc, a, b) so the result is deterministic.
    The global top-k is a TakeOrderedAndProject (per-partition heaps +
    driver merge of k rows), not a full sort."""
    info: dict[str, Any] = {"mode": mode, "k": k, "degree_cap": degree_cap}
    if mode == "cocitation":
        pairs = _pair_counts(
            edges.select("src", "dst"), "src", "dst", min_count, degree_cap, info
        )
    elif mode == "coupling":
        pairs = _pair_counts(
            edges.select("src", "dst"), "dst", "src", min_count, degree_cap, info
        )
    else:
        raise ValueError(f"mode must be 'cocitation' or 'coupling', got {mode!r}")
    out = pairs.orderBy(F.desc("n_common"), "a", "b").limit(k)
    return out, info


def mirror_pairs(
    docs: DataFrame,
    min_shared: int = 2,
    df_cap: int | None = 256,
    key_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Mirror / template detection: (a, b, n_common) pairs of sources
    (hosts, feeds) sharing >= min_shared exact content fingerprints —
    the site-level face of dedup (a near-complete overlap means one
    source mirrors the other; a moderate one, a shared page template).

    Pure composition: fingerprint60 over the text column turns
    documents into a (fingerprint, source) bipartite table, and the
    co-citation pair counter does the rest — fingerprints shared by
    more than ``df_cap`` sources are dropped exactly like hot hubs
    (boilerplate pages carry no mirroring signal and cost O(d^2)
    pairs)."""
    from efficient_graph_algorithms_spark.functions.text import fingerprint60

    bip = docs.select(
        fingerprint60(F.col(text_col)).alias("fp"), F.col(key_col).alias("src_key")
    )
    return _pair_counts(bip, "fp", "src_key", min_shared, df_cap)
