"""Feature-hashing (hashing-trick) text vectorizer.

Weinberger et al. 2009 (ICML) / Vowpal Wabbit's featurizer: map each
term into a FIXED dim-d vector space via a hash, with a second sign
hash so collision noise cancels in expectation (E[x·x'] is unbiased).
The standard way to featurize a 100 TB corpus for linear models or
clustering with NO vocabulary pass, no dictionary state, no driver
bottleneck — the vector space is a pure function of the hash family.

No reference counterpart (``reference src/ega`` has no text
featurizer); engine extension in the §2.12 LLM-pipeline family,
upstream of the engine's k-NN / k-means / PCA layers.

Determinism: both hashes are the portable 60-bit md5
(functions/hashing.py) keyed ``hv:<term>`` / ``hvs:<term>``, so every
sparse entry is bit-identical in DuckDB SQL.

Plan shape: tokenize (the dedup family's normalized_text convention)
→ explode → per-occurrence (bucket, sign) as row-level JVM
expressions → ONE map-side-combining groupBy (doc_id, bucket). Output
is sparse COO rows (doc_id, dim, value); entries whose signed counts
cancel to exactly 0 are dropped (indistinguishable from absent for
any downstream consumer). Never wider than one shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from efficient_graph_algorithms_spark.functions.hashing import md5_60bit_col

from efficient_graph_algorithms_spark.functions.text import normalized_text


def _h60(expr: Column) -> Column:
    return md5_60bit_col(expr)


def _doc_terms(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    toks = F.split(normalized_text(F.coalesce(F.col(text_col), F.lit(""))), " ")
    return (
        docs.select(F.col(id_col), F.explode(toks).alias("term"))
        .where(F.col("term") != "")
    )


def hashed_features(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 1024,
    signed: bool = True,
) -> DataFrame:
    """Sparse hashed term-count vectors: (id_col, dim, value).

    value = Σ_occurrences sign(term) over terms hashing to the bucket
    (sign ≡ +1 when ``signed=False`` — plain collision-summed counts).
    Exact-zero entries are dropped."""
    if dim < 1:
        raise ValueError("dim must be >= 1")
    occ = _doc_terms(docs, id_col, text_col)
    bucket = _h60(F.concat(F.lit("hv:"), F.col("term"))) % dim
    if signed:
        sign = (_h60(F.concat(F.lit("hvs:"), F.col("term"))) % 2) * 2 - 1
    else:
        sign = F.lit(1)
    return (
        occ.select(F.col(id_col), bucket.alias("dim"), sign.alias("s"))
        .groupBy(id_col, "dim")
        .agg(F.sum("s").alias("value"))
        .where(F.col("value") != 0)
    )


def hashed_feature_norms(features: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-document squared L2 norm of the hashed vector:
    (id_col, nnz, sq_norm) — the usual companion statistic (cosine
    denominators, collision diagnostics)."""
    return features.groupBy(id_col).agg(
        F.count("*").alias("nnz"),
        F.sum(F.col("value") * F.col("value")).alias("sq_norm"),
    )


# ---------------------------------------------------------------------------
# DuckDB oracle fragments (lockstep with the expressions above)
# ---------------------------------------------------------------------------

def duck_hashed_features(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 1024,
    signed: bool = True,
) -> str:
    norm = (
        f"regexp_replace(lower(trim(coalesce({text_col}, ''))), '\\s+', ' ', 'g')"
    )
    h = lambda k: f"(('0x' || substr(md5('{k}:' || t.term), 1, 15))::BIGINT)"
    sign = f"(({h('hvs')} % 2) * 2 - 1)" if signed else "1"
    return (
        f"SELECT {id_col}, ({h('hv')} % {dim}) AS dim, "
        f"sum({sign})::BIGINT AS value "
        f"FROM {table}, LATERAL unnest(string_split({norm}, ' ')) AS t(term) "
        f"WHERE t.term <> '' GROUP BY {id_col}, ({h('hv')} % {dim}) "
        f"HAVING sum({sign}) <> 0"
    )
