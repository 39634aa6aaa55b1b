"""Int8 scalar quantization of the embedding column — the memory path
for 100 TB embedding stores (4x smaller than float32, the standard
first step before IVF/PQ in every production ANN stack; Faiss's
ScalarQuantizer / Milvus SQ8 are the public references).

Symmetric per-dimension absmax quantization:

    scale[i] = max over vectors of |v[i]|
    code[i]  = round(v[i] / scale[i] * 127)      (0 when scale[i] = 0)
    recon[i] = code[i] * scale[i] / 127

Every step is deterministic double arithmetic + round-half-away-from-
zero (verified identical in Spark and DuckDB), so codes — not just
summary stats — are exactly SQL-oracle-checkable.

Plan shape: fitting is ONE posexplode + map-side-combining
groupBy(pos) max-aggregate (d rows out); the d scales then ride into a
single scan-stage zip_with encode pass as an array literal — the PCA
operator's d-sized driver-summary contract (``operators/pca.py``), no
shuffle, no UDF, no per-row Python. Encoding and the reconstruction-
error report are one pass each over the vectors.

No reference counterpart (the reference is a graph library); part of
the engine's LLM-data-pipeline extension surface (SURVEY §2.12),
completing the embedding stack: PCA/whitening (pca.py) → quantize
(here) → IVF/LSH search (ann.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LEVELS = 127  # symmetric int8: codes in [-127, 127]


def fit_absmax_scales(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """(pos, scale): per-dimension max |v[pos]| over all vectors
    (0-based positions). One posexplode + one map-side-combining max
    aggregate; output is d rows."""
    return (
        emb.select(F.posexplode(F.col(vec_col)).alias("pos", "x"))
        .groupBy("pos")
        .agg(F.max(F.abs(F.col("x").cast("double"))).alias("scale"))
    )


def collect_scales(scales: DataFrame) -> list[float]:
    """Ordered scale vector (d doubles — the d-sized driver summary
    the PCA operator also uses; never per-row data)."""
    return [
        float(r["scale"]) for r in scales.orderBy("pos").collect()
    ]


def _scales_arr(svec: list[float]) -> F.Column:
    return F.array(*[F.lit(float(s)) for s in svec])


def encode_int8(
    emb: DataFrame,
    svec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>): one scan-stage zip_with pass, no
    shuffle. Zero-scale dimensions encode to 0. Codes are CLAMPED to
    [-LEVELS, LEVELS]: when ``svec`` was fitted on a sample (the
    train/serve split that makes it a parameter), full-table values
    can exceed the fitted absmax, and unclamped codes would silently
    leave the int8 range — faiss's ScalarQuantizer clamps too."""
    lim = F.lit(float(LEVELS))
    return emb.select(
        F.col(id_col),
        F.zip_with(
            F.col(vec_col),
            _scales_arr(svec),
            lambda x, s: F.when(
                s > 0,
                F.greatest(
                    -lim,
                    F.least(lim, F.round(x.cast("double") / s * lim)),
                ),
            )
            .otherwise(F.lit(0.0))
            .cast("int"),
        ).alias("codes"),
    )


def quantization_report(
    emb: DataFrame,
    svec: list[float] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 6,
) -> DataFrame:
    """(id, code_sum, mse): per-vector code checksum (exact integer —
    proves the codes themselves match, not just aggregates) and the
    reconstruction mean squared error, rounded for cross-engine float
    agreement. Fits scales from ``emb`` when ``svec`` is None."""
    if svec is None:
        svec = collect_scales(fit_absmax_scales(emb, vec_col))
    arr = _scales_arr(svec)
    # same [-LEVELS, LEVELS] clamp as encode_int8 (r6, ADVICE fix): with
    # a sample-fitted svec the full table can exceed the fitted absmax,
    # and an unclamped report would describe codes the encoder never
    # emits. No-op for svec fitted on `emb` itself (the oracle case).
    lim = F.lit(float(LEVELS))
    code = F.zip_with(
        F.col(vec_col),
        arr,
        lambda x, s: F.when(
            s > 0,
            F.greatest(-lim, F.least(lim, F.round(x.cast("double") / s * lim))),
        ).otherwise(F.lit(0.0)),
    )
    recon = F.zip_with(
        code, arr, lambda c, s: c * s / F.lit(float(LEVELS))
    )
    sq_err = F.zip_with(
        F.col(vec_col),
        recon,
        lambda x, r: (x.cast("double") - r) * (x.cast("double") - r),
    )
    return emb.select(
        F.col(id_col),
        F.aggregate(code, F.lit(0.0), lambda a, c: a + c)
        .cast("long")
        .alias("code_sum"),
        F.round(
            F.aggregate(sq_err, F.lit(0.0), lambda a, e: a + e)
            / F.size(F.col(vec_col)).cast("double"),
            decimals,
        ).alias("mse"),
    )
