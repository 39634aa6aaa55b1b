"""Deduplication operators over a ``documents(doc_id, text, ...)`` table.

Five families, each a first-class query with an exact DuckDB oracle:

- exact          content-hash groupBy (keep min doc_id per group)
- ngram_jaccard  word-3-gram shingles, inverted-index candidate join,
                 exact Jaccard verify (no cross join — candidates only
                 from shared shingles, which is the scalable plan shape)
- minhash_lsh    portable 60-bit shingle hashes, XOR-permutation
                 MinHash signatures, banded LSH candidate join,
                 signature-similarity verify
- simhash        60-bit simhash fingerprints + near-dup pairs by
                 Hamming distance via band join
- embedding near-dup lives in operators/similarity.py (cosine)

All hashing is the portable md5-prefix 60-bit hash
(functions/hashing.py) so every step is reproducible in ANSI-ish SQL —
no engine-specific hash functions anywhere.

Scale notes: shingle/band joins shuffle on short join keys; hot
shingles (boilerplate) are the skew risk — ngram_jaccard drops
shingles above a document-frequency cap, the standard trick (and AQE
skew-join covers the rest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from efficient_graph_algorithms_spark.functions.hashing import md5_60bit_col

from efficient_graph_algorithms_spark.functions.hashing import minhash_seeds
from efficient_graph_algorithms_spark.functions.text import normalized_text

SHINGLE_W = 3  # words per shingle
MINHASH_K = 16  # signature length
LSH_BANDS = 4  # bands of K/BANDS rows each
HOT_SHINGLE_DF_CAP = 1000  # drop shingles appearing in > this many docs


def _tokens(text_col) -> F.Column:
    return F.split(normalized_text(text_col), " ")


def token_windows(toks: F.Column, width: int) -> F.Column:
    """Array of all width-token sliding windows over a PRE-PROJECTED
    token array column (space-joined). The single definition shared by
    shingles and the dup-span operator — toks must be a plain column
    reference, never an inline split(normalized_text(..)) expression
    (Catalyst re-evaluates the whole chain inside every element_at:
    O(doc_len^2) regex work, measured 11 s -> 1.6 s)."""
    return F.transform(
        F.sequence(F.lit(0), F.size(toks) - width),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(1, width + 1)]
        ),
    )


def shingles(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = SHINGLE_W,
) -> DataFrame:
    """(id, shingle string) — distinct word-``width``-grams per doc.
    Docs shorter than ``width`` words contribute their full text.

    The token array is PROJECTED once per row before the shingle
    transform: inlining ``split(normalized_text(..))`` into the lambda
    makes Catalyst re-evaluate the whole regex-normalize + split chain
    inside every element_at — O(doc_len^2) regex work per document
    (measured 11 s → 1.6 s for 5000 sf0.1 docs)."""
    from efficient_graph_algorithms_spark.sources.edges import spread_narrow_scan

    # spread the CPU-heavy tokenize/shingle scan when the corpus sits in
    # a handful of sub-open-cost files (one scan split = one core); the
    # projection is applied FIRST so only (id, text) bytes move (r6,
    # guide §6 / §2.3). A real many-file corpus is untouched.
    base = spread_narrow_scan(
        docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("_txt"))
    ).select("id", _tokens(F.col("_txt")).alias("_toks"))
    toks = F.col("_toks")
    sh = F.when(
        F.size(toks) < width, F.array(F.concat_ws(" ", toks))
    ).otherwise(token_windows(toks, width))
    return base.select("id", F.explode(F.array_distinct(sh)).alias("shingle"))


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (normalized) content:
    (fp, n_dups, keep_id) for groups with >1 member."""
    from efficient_graph_algorithms_spark.functions.text import fingerprint60

    return (
        docs.select(F.col(id_col).alias("id"), fingerprint60(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("n_dups"), F.min("id").alias("keep_id"))
        .where(F.col("n_dups") > 1)
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    df_cap: int = HOT_SHINGLE_DF_CAP,
) -> DataFrame:
    """(a, b, jaccard) for pairs with shingle-set Jaccard >= threshold,
    a < b. Candidates come from an inverted-index self-join on shingle
    (docs sharing >= 1 non-hot shingle), then exact verification:
        J(a,b) = |common| / (|A| + |B| - |common|).
    """
    sh = shingles(docs, id_col, text_col)
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    hot = sh.groupBy("shingle").agg(F.count("*").alias("df")).where(F.col("df") > df_cap)
    cold = sh.join(hot, "shingle", "left_anti")
    a = cold.select(F.col("id").alias("a"), "shingle")
    b = cold.select(F.col("id").alias("b"), "shingle")
    common = (
        a.join(b, "shingle")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("common"))
    )
    return (
        common.join(sizes.select(F.col("id").alias("a"), F.col("sz").alias("sz_a")), "a")
        .join(sizes.select(F.col("id").alias("b"), F.col("sz").alias("sz_b")), "b")
        .select(
            "a",
            "b",
            F.round(
                F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common")), 6
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def _shingle_hash60(col) -> F.Column:
    return md5_60bit_col(col)


def _minhash_wide(docs: DataFrame, k: int = MINHASH_K, seed: int = 42,
                  id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, m0..m{k-1}) — ONE wide aggregate (k min-columns over the
    shingle stream, single hash-map probe per input row); measured
    faster than exploding k structs per shingle (k× the rows entering
    the partial aggregate)."""
    seeds = minhash_seeds(k, seed)
    sh = shingles(docs, id_col, text_col).select(
        "id", _shingle_hash60(F.col("shingle")).alias("h")
    )
    return sh.groupBy("id").agg(
        *[
            F.min(F.col("h").bitwiseXOR(F.lit(s))).alias(f"m{i}")
            for i, s in enumerate(seeds)
        ]
    )


def minhash_signatures(docs: DataFrame, k: int = MINHASH_K, seed: int = 42,
                       id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, perm, minhash) — long form so the SQL oracle is a plain
    groupBy-min; perm in [0, k)."""
    wide = _minhash_wide(docs, k, seed, id_col, text_col)
    melt = F.explode(
        F.array(
            *[
                F.struct(F.lit(i).alias("perm"), F.col(f"m{i}").alias("minhash"))
                for i in range(k)
            ]
        )
    ).alias("pm")
    return wide.select("id", melt).select(
        "id", F.col("pm.perm").alias("perm"), F.col("pm.minhash").alias("minhash")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    seed: int = 42,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(a, b, sig_sim) near-dup candidates: pairs agreeing on at least
    one full LSH band, verified by signature similarity (fraction of
    equal minhashes) >= threshold. a < b.

    Single-pass plan: the wide (id, m0..m{k-1}) signature is computed
    ONCE, band keys are plain column concats over each band's minhash
    slice (no melt, no collect_list re-aggregate), and both sides of
    the band equi-join carry their k minhash columns so the signature
    verify is an inline expression — no second join back to the
    signatures. (The previous long-form plan recomputed the shingle
    pipeline three times: band keys + both verify sides.)"""
    if not 1 <= bands <= k or k % bands != 0:
        raise ValueError(
            f"bands must divide k (got k={k}, bands={bands}): a partial "
            "band would change the banding semantics vs the SQL oracle, "
            "and bands > k degenerates to an all-pairs join"
        )
    rows = k // bands
    wide = _minhash_wide(docs, k, seed, id_col, text_col)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    ",",
                    *[F.col(f"m{i}").cast("string")
                      for i in range(b * rows, (b + 1) * rows)],
                ).alias("bkey"),
            )
            for b in range(bands)
        ]
    )
    banded = wide.select("id", *[f"m{i}" for i in range(k)],
                         F.explode(band_structs).alias("bb")).select(
        "id", *[f"m{i}" for i in range(k)],
        F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey"),
    )
    a = banded.select(
        F.col("id").alias("a"), "band", "bkey",
        *[F.col(f"m{i}").alias(f"ma{i}") for i in range(k)],
    )
    b = banded.select(
        F.col("id").alias("b"), "band", "bkey",
        *[F.col(f"m{i}").alias(f"mb{i}") for i in range(k)],
    )
    n_eq = sum(
        (F.col(f"ma{i}") == F.col(f"mb{i}")).cast("int") for i in range(k)
    )
    sim = (
        a.join(b, ["band", "bkey"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b", F.round(n_eq / F.lit(k), 6).alias("sig_sim"))
        .distinct()  # the same pair may agree on several bands
    )
    return sim.where(F.col("sig_sim") >= threshold)


def simhash_fingerprints(docs: DataFrame, bits: int = 60,
                         id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, simhash) — per-bit majority vote over token hashes.
    bit b of simhash = 1 iff  Σ_tokens (2·bit_b(h(token)) − 1) > 0.

    The per-bit vote fold runs as vectorized NumPy popcount arithmetic
    inside an Arrow batch (``mapInPandas``): one shuffle of (id, h)
    token hashes, zero row inflation. (A first version exploded 60
    bit-rows per token — 60× the shuffle input for the same votes;
    killed for the 100 TB path.)"""
    import numpy as np
    import pandas as pd

    toks = docs.select(
        F.col(id_col).alias("id"), F.explode(_tokens(F.col(text_col))).alias("tok")
    ).where(F.col("tok") != "")
    h = toks.select("id", _shingle_hash60(F.col("tok")).alias("h"))
    grouped = h.groupBy("id").agg(F.collect_list("h").alias("hs"))
    shifts = np.arange(bits, dtype=np.uint64)

    def fold(batches):
        for b in batches:
            ids, fps = [], []
            for i, hs in zip(b["id"], b["hs"]):
                arr = np.asarray(hs, dtype=np.uint64)
                ones = ((arr[:, None] >> shifts) & np.uint64(1)).sum(axis=0)
                votes = 2 * ones.astype(np.int64) - len(arr)
                fp = int(((votes > 0).astype(np.uint64) << shifts).sum())
                ids.append(i)
                fps.append(fp)
            yield pd.DataFrame({"id": ids, "simhash": fps})

    return grouped.mapInPandas(fold, "id long, simhash long")


def hamming_pairs(fp: DataFrame, fp_col: str, max_hamming: int, bits: int,
                  id_col: str = "id", band_cap: int | None = None) -> DataFrame:
    """(a, b, hamming) pairs with Hamming(fp_a, fp_b) <= max_hamming
    over ANY long-typed fingerprint table (simhash, image dhash, ...).

    Candidate generation: split the fingerprint into max_hamming+1
    equal-width bands; any pair within distance max_hamming agrees on
    >= 1 band (pigeonhole; leftover high bits outside the bands only
    strengthen the bound) — band equi-join, then exact popcount
    verify. shiftrightunsigned so a 64-bit fingerprint in a signed
    long bands correctly (identical to shiftright for the 60-bit
    simhash family, whose values are non-negative).

    band_cap (r6, the r5-verdict skew hole): when set, (band, bkey)
    groups with more than band_cap members are dropped before pairing —
    the band-join analogue of the hot-shingle DF cap and the video
    face's hot-hash anti-join. At web scale the degenerate fingerprints
    (flat/solid images hash to a constant, silence to 0) make one band
    group corpus-sized and the join O(n²); the cap bounds any group's
    pair volume at band_cap²/2. Recall: a pair is lost only if EVERY
    band it agrees on is hot — for near-dups of genuinely degenerate
    content, which exact-dedup already catches upstream. The count
    window shares the (band, bkey) exchange the self-join needs, so the
    cap costs no extra shuffle. Default None preserves the exact
    (cap-free) semantics of the simhash text face."""
    nb = max_hamming + 1
    width = bits // nb
    band = F.explode(F.sequence(F.lit(0), F.lit(nb - 1))).alias("band")
    mask = (1 << width) - 1
    banded = fp.select(
        F.col(id_col).alias("id"), F.col(fp_col).alias("_fp"), band
    ).select(
        "id", "_fp", "band",
        F.expr(f"shiftrightunsigned(_fp, CAST(band * {width} AS INT))")
        .bitwiseAND(F.lit(mask).cast("long"))
        .alias("bkey"),
    )
    if band_cap is not None:
        wb = Window.partitionBy("band", "bkey")
        banded = (
            banded.withColumn("_n", F.count(F.lit(1)).over(wb))
            .where(F.col("_n") <= band_cap)
            .drop("_n")
        )
    a = banded.select(F.col("id").alias("a"), F.col("_fp").alias("fa"), "band", "bkey")
    b = banded.select(F.col("id").alias("b"), F.col("_fp").alias("fb"), "band", "bkey")
    cand = (
        a.join(b, ["band", "bkey"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b", "fa", "fb")
        .distinct()
    )
    return cand.select(
        "a", "b", F.bit_count(F.col("fa").bitwiseXOR(F.col("fb"))).alias("hamming")
    ).where(F.col("hamming") <= max_hamming)


def simhash_pairs(docs: DataFrame, max_hamming: int = 3, bits: int = 60,
                  id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(a, b, hamming) pairs with Hamming(simhash_a, simhash_b) <=
    max_hamming — the banded candidate join of ``hamming_pairs`` over
    ``simhash_fingerprints``."""
    fp = simhash_fingerprints(docs, bits, id_col, text_col)
    return hamming_pairs(fp, "simhash", max_hamming, bits)


def dedup_clusters(
    spark,
    docs: DataFrame,
    pairs: DataFrame | None = None,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The dedup endgame: near-dup PAIRS -> CLUSTERS -> one kept
    representative per cluster. Returns one row per input document:

        (doc_id, rep_id, keep)   rep_id = min doc_id in the document's
                                 near-dup cluster (itself if unpaired),
                                 keep = 1 iff doc_id == rep_id.

    ``pairs``: any (a, b, ...) near-dup pair table — defaults to
    ``minhash_lsh_pairs(docs, threshold)``. Pair tables are NOT
    transitive, so dropping one side of each pair independently
    over-deletes (a~b, b~c kills b AND c); the correct semantics is
    connected components over the pair graph, then keep exactly one
    doc per component. Reuses the hash-to-min + pointer-jumping CC
    fixpoint (operators/components.py) whose component id is already
    "min reachable id" — exactly the representative wanted here.

    Scale shape: pair generation is the banded LSH equi-join (never
    all-pairs); the CC loop runs on the PAIR graph only — near-dup
    clusters are tiny and near-cliques in practice, so the fixpoint
    converges in O(log max_cluster_diameter) rounds on a table far
    smaller than the corpus; unpaired docs never enter the loop and
    join back in one left join.
    """
    from efficient_graph_algorithms_spark.operators.components import (
        connected_components,
    )

    if pairs is None:
        pairs = minhash_lsh_pairs(docs, threshold, id_col=id_col, text_col=text_col)
    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    labels, _ = connected_components(spark, edges)
    ids = docs.select(F.col(id_col).alias("doc_id"))
    return (
        ids.join(labels.withColumnRenamed("id", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component"), F.col("doc_id")).alias("rep_id"),
        )
        .withColumn("keep", (F.col("doc_id") == F.col("rep_id")).cast("int"))
    )
