"""pages → edges: the extraction phase of the engine.

Pipeline (run once per corpus snapshot, all downstream algorithms read
the persisted outputs):

  pages(url, html, ...)
    → extract_hrefs_udf (Arrow batches)        [reference's mesh→adjacency
      step, ``reference src/ega/util/mesh_utils.py:41-73``]
    → explode → normalize → raw (src_url, dst_url)
    → url dictionary (deterministic dense ids — the reference's GIDMapper,
      ``reference src/ega/algorithms/graph_kernels.py:123-144``)
    → edges(src, dst) bigint, deduplicated, self-loops dropped
    → out-degree table
    → salted CSR-style adjacency blocks (src, salt, dsts[], out_deg)

Scale notes (the part that must survive 10^12 docs):
- The id dictionary avoids a single-partition window: range-repartition
  by url, sort within partitions, count per partition, broadcast the
  cumulative offsets, add offset + local rank via one mapInPandas. Two
  jobs, no global single-reducer sort. Ranks depend only on the total
  order of urls, not on where range boundaries land.
- Adjacency rows for hub vertices are SALTED: a src with out-degree
  above ``salt_threshold`` is split into multiple (src, salt) rows with
  bounded ``dsts`` arrays, so no single task carries a 10^7-element
  array and the per-iteration explode parallelizes over salts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from efficient_graph_algorithms_spark.functions.extract import (
    extract_hrefs_udf,
)

SALT_THRESHOLD = 4096  # max dsts per adjacency row before splitting


def raw_link_pairs(pages: DataFrame, jvm: bool = True) -> DataFrame:
    """(src_url, dst_url) pairs straight from the html, normalized.

    jvm=True (default) runs the href regex + url normalization as built-in
    column expressions — the whole extraction scan stays inside the JVM,
    no Arrow transfer of the html bytes to Python workers. Deliberately
    explode-BEFORE-normalize: higher-order-function lambdas are interpreted
    per element (no codegen), so normalizing inside F.transform measured
    4× slower than the same expressions on exploded rows (3.1 s vs 0.7 s
    on the 120k-page bench corpus; the Arrow UDF path is 1.9 s warm).
    jvm=False keeps the Arrow pandas-UDF path (the original oracle-identical
    route); a pytest asserts both produce identical pairs."""
    from efficient_graph_algorithms_spark.functions.extract import (
        _HREF_SQL_PAT,
        _STRIP_PAT,
        _normalize_url_col,
    )

    if not jvm:
        hrefs = extract_hrefs_udf(F.col("html"))
        return (
            pages.select("url", hrefs.alias("hrefs"))
            .select(F.col("url").alias("src_url"), F.explode("hrefs").alias("dst_url"))
            .where(F.col("src_url") != F.col("dst_url"))
        )
    raw = F.regexp_extract_all(
        F.decode(F.col("html"), "UTF-8"), F.lit(_HREF_SQL_PAT), F.lit(1)
    )
    return (
        pages.select("url", F.explode(raw).alias("h"))
        # _STRIP_PAT: Python str.strip()'s exact whitespace set (Unicode
        # spaces + U+001C-001F) — an NBSP-only href must strip to "" and
        # be dropped HERE, exactly as the UDF path does
        .select("url", F.regexp_replace(F.col("h"), _STRIP_PAT, "").alias("h"))
        .where(F.col("h") != "")
        .select(
            F.col("url").alias("src_url"),
            _normalize_url_col(F.col("h")).alias("dst_url"),
        )
        .where(F.col("src_url") != F.col("dst_url"))
    )


def raw_anchor_pairs(pages: DataFrame, jvm: bool = True) -> DataFrame:
    """(src_url, dst_url, anchor) triples straight from the html — the
    anchor-text signal of web search/quality stacks (inlink anchor
    terms describe the TARGET page).

    jvm=True extracts whole <a> elements with one JVM regex, explodes,
    then runs the href/text group extraction as row-level expressions
    (the explode-before-normalize lesson of raw_link_pairs: HOF lambdas
    are interpreted per element, exploded rows get codegen). jvm=False
    is the Arrow pandas-UDF path wrapping the pure-Python oracle; a
    pytest asserts both produce identical triples."""
    from efficient_graph_algorithms_spark.functions.extract import (
        _ANCHOR_ELEM_SQL_PAT,
        _HORIZ_WS_SQL,
        _STRIP_PAT,
        _normalize_url_col,
        extract_anchor_pairs_udf,
    )

    if not jvm:
        pairs = extract_anchor_pairs_udf(F.col("html"))
        return (
            pages.select("url", F.explode(pairs).alias("p"))
            .select(
                F.col("url").alias("src_url"),
                F.col("p.href").alias("dst_url"),
                F.col("p.text").alias("anchor"),
            )
        )
    elems = F.regexp_extract_all(
        F.decode(F.col("html"), "UTF-8"), F.lit(_ANCHOR_ELEM_SQL_PAT), F.lit(0)
    )
    e = F.col("e")
    href = F.regexp_replace(
        F.regexp_extract(e, _ANCHOR_ELEM_SQL_PAT, 1), _STRIP_PAT, ""
    )
    text = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_extract(e, _ANCHOR_ELEM_SQL_PAT, 2), r"<[^>]+>", " "
            ),
            _HORIZ_WS_SQL,
            " ",
        ),
        _STRIP_PAT,
        "",
    )
    return (
        pages.select("url", F.explode(elems).alias("e"))
        .select("url", href.alias("h"), text.alias("anchor"))
        .where(F.col("h") != "")
        .select(
            F.col("url").alias("src_url"),
            _normalize_url_col(F.col("h")).alias("dst_url"),
            "anchor",
        )
    )


def anchor_term_counts(pages: DataFrame, jvm: bool = True) -> DataFrame:
    """(dst_url, term, n): inlink anchor-term counts per target page —
    the classic anchor-text index. Tokenization is the engine-wide
    normalized_text + split convention; empty anchors contribute
    nothing. One extraction scan + one map-side-combining groupBy."""
    from efficient_graph_algorithms_spark.functions.text import normalized_text

    pairs = raw_anchor_pairs(pages, jvm=jvm)
    return (
        pairs.where(F.col("anchor") != "")
        .select(
            "dst_url",
            F.explode(F.split(normalized_text(F.col("anchor")), " ")).alias("term"),
        )
        .where(F.col("term") != "")
        .groupBy("dst_url", "term")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def assign_dense_ids(urls: DataFrame, col: str = "url", partitions: int = 32) -> DataFrame:
    """Deterministic dense ids 0..N-1 by sorted url order, without a
    single-partition global window.

    Returns DataFrame(url string, id long) with one row per DISTINCT url
    (the input may contain duplicates). Ids equal
    ``row_number() over (order by distinct url) - 1`` but are computed
    scalably: range-partition → sort within partition → per-partition
    distinct counts → broadcast cumulative offsets → adjacent-dedupe +
    local rank + offset.
    """
    # Dedup is FUSED into the range shuffle: equal urls necessarily land in
    # the same range partition and arrive adjacent after the in-partition
    # sort, so no separate distinct() shuffle is needed (measured: the
    # standalone distinct over the raw union was ~4 s at the 120k-page
    # bench corpus — one full extra shuffle of the url universe).
    parted = (
        urls.select(F.col(col).alias("url"))
        .repartitionByRange(partitions, "url")
        .sortWithinPartitions("url")
        .withColumn("_pid", F.spark_partition_id())
        # PIN the partitioning: the range partitioner's sampling is not
        # guaranteed identical across jobs, and the offsets job and the
        # id-assignment job must see byte-identical partitions. Without
        # this persist the two jobs can disagree → duplicate/missing ids.
        .persist()
    )
    # small: one row per partition (distinct count — duplicates are adjacent
    # but countDistinct doesn't rely on that)
    counts = (
        parted.groupBy("_pid")
        .agg(F.countDistinct("url").alias("count"))
        .orderBy("_pid")
        .collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for r in counts:
        offsets[r["_pid"]] = acc
        acc += r["count"]

    # id assignment stays pure JVM: dense_rank within each _pid partition
    # (NOT a global window — partitionBy("_pid") keeps `partitions`-way
    # parallelism) + broadcast per-partition base offsets. dense_rank gives
    # equal urls equal local ranks; the lag() filter keeps one row per
    # distinct url without another shuffle. (A mapInPandas variant measured
    # ~3.4 s cold here purely from Python-worker pool spin-up — this path
    # has no Python in it at all.)
    spark = urls.sparkSession
    off_df = spark.createDataFrame(
        [(int(pid), int(base)) for pid, base in offsets.items()] or [(0, 0)],
        "_pid int, _base long",
    )
    w = Window.partitionBy("_pid").orderBy("url")
    prev = F.lag("url").over(w)
    out = (
        parted.select(
            "url",
            "_pid",
            (F.dense_rank().over(w) - F.lit(1)).alias("_rk"),
            (prev.isNull() | (F.col("url") != prev)).alias("_keep"),
        )
        .where("_keep")
        .join(F.broadcast(off_df), "_pid")
        .select("url", (F.col("_base") + F.col("_rk")).alias("id"))
    )
    return out


def spread_narrow_scan(df: DataFrame, min_parallelism: int | None = None) -> DataFrame:
    """Round-robin repartition a CPU-heavy scan ONLY when its natural
    split count is below the core count (r6, guide §6 input-split
    sizing): small corpora written as a few sub-open-cost files pack
    into one or two scan splits (24 files x 0.8 MB at the bench sf fit
    in ONE 128 MB split after the 4 MB/file open-cost charge), so a
    regex-extraction scan ran on 1-2 of 32 cores. Shuffling the handful
    of MB is free next to the serialized regex work; a 100 TB corpus has
    thousands of natural splits and is returned UNTOUCHED — this never
    re-shuffles payload bytes at scale."""
    spark = df.sparkSession
    target = min_parallelism or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def build_edges(
    pages: DataFrame, id_partitions: int = 32, validate: bool = True
) -> tuple[DataFrame, DataFrame]:
    """Return (url_dict(url,id), edges(src,dst)).

    Vertices = every url that appears as a page OR as a link target
    (targets outside the corpus become vertices with no out-links —
    dangling handling downstream). Edges deduplicated; no self-loops.
    validate=True asserts the dictionary is a dense bijection 0..N-1 —
    a one-time scan guarding every downstream algorithm.
    """
    # persist: the href-extraction UDF output feeds three consumers
    # (url universe + two dictionary joins) — extract once, not thrice.
    # Cache lifecycle note: this persist (and the partition-pinning one
    # inside assign_dense_ids) is deliberately NOT unpersisted here —
    # the returned DataFrames are lazy and still read it; the primary
    # callers (extract CLI, bench) write both outputs to parquet and
    # exit. A long-lived session doing REPEATED builds should
    # spark.catalog.clearCache() between them.
    pairs = raw_link_pairs(spread_narrow_scan(pages)).persist()
    # no distinct(): assign_dense_ids dedupes inside its range shuffle
    all_urls = pages.select("url").unionByName(
        pairs.select(F.col("dst_url").alias("url"))
    )
    url_dict = assign_dense_ids(all_urls, partitions=id_partitions).persist()
    if validate:
        stats = url_dict.agg(
            F.count("*").alias("n"),
            F.countDistinct("id").alias("n_ids"),
            F.min("id").alias("lo"),
            F.max("id").alias("hi"),
        ).collect()[0]
        if stats["n"] == 0:
            raise ValueError(
                "empty corpus: no pages and no extracted links "
                "(url dictionary has zero rows)"
            )
        if not (stats["n"] == stats["n_ids"] == stats["hi"] + 1 and stats["lo"] == 0):
            raise AssertionError(f"url dictionary is not a dense bijection: {stats}")
    edges = (
        pairs.join(url_dict.withColumnRenamed("url", "src_url").withColumnRenamed("id", "src"), "src_url")
        .join(url_dict.withColumnRenamed("url", "dst_url").withColumnRenamed("id", "dst"), "dst_url")
        .select("src", "dst")
        .distinct()
    )
    return url_dict, edges


def out_degrees(edges: DataFrame) -> DataFrame:
    """(src, out_deg) — reference's row-sum / degree vector
    (``reference src/ega/algorithms/graph_kernels.py:67``)."""
    return edges.groupBy("src").agg(F.count("*").alias("out_deg"))


def adjacency_blocks(edges: DataFrame, salt_threshold: int = SALT_THRESHOLD) -> DataFrame:
    """Salted CSR-style adjacency: (src, salt, dsts array<long>, out_deg).

    Two-pass, degree-driven salting: pass 1 computes out-degrees; pass 2
    splits each src over ``n_salts = ceil(2·out_deg / salt_threshold)``
    hash buckets, so expected block size is salt_threshold/2 regardless
    of degree — a 10^8-out-degree hub domain gets ~50k salt rows, never
    one giant array. (A fixed 64-way salt capped hubs at 64 rows, which
    blows the |dsts| ≤ salt_threshold bound past out_deg ≈ 64·threshold.)
    The per-block bound is probabilistic (uniform hash concentration),
    which is what matters for executor memory; out_deg stays the TOTAL
    degree so rank/out_deg contributions remain correct under salting.
    Non-hubs (out_deg ≤ salt_threshold) keep a single salt-0 row.
    """
    deg = out_degrees(edges)
    n_salts = F.ceil(F.lit(2.0) * F.col("out_deg") / F.lit(salt_threshold)).cast("long")
    salted = (
        edges.join(deg, "src")
        .withColumn("n_salts", F.greatest(n_salts, F.lit(1)))
        .withColumn("salt", F.pmod(F.xxhash64("dst"), F.col("n_salts")).cast("int"))
        .withColumn(
            "salt",
            F.when(F.col("out_deg") <= salt_threshold, F.lit(0)).otherwise(F.col("salt")),
        )
    )
    return salted.groupBy("src", "salt", "out_deg").agg(
        F.array_sort(F.collect_list("dst")).alias("dsts")
    ).select("src", "salt", "dsts", "out_deg")


def symmetrize(edges: DataFrame) -> DataFrame:
    """Undirected view: both directions, deduplicated, no self-loops.
    (The reference stores both directions explicitly,
    ``reference src/ega/algorithms/brute_force.py:18-22``.)"""
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return edges.unionByName(rev).where(F.col("src") != F.col("dst")).distinct()
