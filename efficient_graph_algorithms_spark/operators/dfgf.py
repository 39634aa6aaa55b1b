"""DFGF: low-rank diffusion graph-field integrator.

Semantics from the reference's ``DFGFIntegrator``
(``reference src/ega/algorithms/graph_diffusion_gf_integrator.py:57-95``):
approximate exp(λ·Adj(G))·x for an ε-neighbor graph whose adjacency is
low-rank-decomposed by random features, Adj ≈ A·Bᵀ with A, B ∈ R^{N×M}:

    out = x + A · (exp(λ·BᵀA) − I) · (BᵀA)⁻¹ · (Bᵀ x)

Spark decomposition of the factor chain (M ~ 16-128, N unbounded):

    BᵀA (M×M)  — per-partition NumPy outer-product partials via
                 ``mapInPandas`` (Arrow batches, the "small-block
                 linalg in executors" pattern), summed on the driver:
                 one pass, no shuffle of N-sized data.
    Bᵀx (M)    — same partial-reduction pass over (features, value).
    M×M solve / expm — driver-side NumPy (microscopic).
    A·y (N)    — broadcast y as a literal array; JVM ``zip_with`` dot
                 per row, whole-stage codegen, no Python.

So the only N-sized work is two embarrassingly-parallel scans and one
column expression — the correct 100 TB shape for a rank-M integrator.

Feature construction: the reference builds A/B from a Fourier
transform of the edge kernel (mesh-specific machinery); here features
are an input, with ``gaussian_rff_features`` (standard random Fourier
features for the Gaussian kernel, Rahimi-Recht 2007) provided as a
deterministic default builder.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from efficient_graph_algorithms_spark.functions.hashing import uniform01


def _expm(x: np.ndarray, terms: int = 24) -> np.ndarray:
    """Matrix exponential via scaling-and-squaring + Taylor (scipy is
    not in this container; M is tiny so this is exact enough)."""
    norm = float(np.abs(x).sum(axis=1).max())
    k = max(0, int(math.ceil(math.log2(max(norm, 1e-300)))) + 1) if norm > 1.0 else 0
    y = x / (2.0**k)
    out = np.eye(x.shape[0])
    term = np.eye(x.shape[0])
    for j in range(1, terms + 1):
        term = term @ y / j
        out = out + term
    for _ in range(k):
        out = out @ out
    return out


def _phi1(x: np.ndarray, terms: int = 24) -> np.ndarray:
    """φ1(X) = Σ_{k≥0} X^k/(k+1)! = (e^X − I)·X⁻¹, computed directly by
    scaling-and-squaring (φ1(2Z) = (e^Z + I)·φ1(Z)/2) so it is finite
    and accurate even when X is singular — ΦᵀΦ factor Grams routinely
    are near-singular at large M, where an explicit inverse explodes."""
    n = x.shape[0]
    norm = float(np.abs(x).sum(axis=1).max())
    k = max(0, int(math.ceil(math.log2(max(norm, 1e-300)))) + 1) if norm > 1.0 else 0
    y = x / (2.0**k)
    p = np.eye(n)   # Σ y^j/(j+1)!
    ey = np.eye(n)  # Σ y^j/j!
    term = np.eye(n)
    for j in range(1, terms + 1):
        term = term @ y / j
        p = p + term / (j + 1)
        ey = ey + term
    for _ in range(k):
        p = (ey + np.eye(n)) @ p / 2.0
        ey = ey @ ey
    return p


def gaussian_rff_features(
    points: DataFrame,
    num_features: int,
    sigma: float = 1.0,
    dim: int = 3,
    seed: int = 42,
    id_col: str = "id",
    vec_col: str = "vec",
    negate: bool = False,
) -> DataFrame:
    """Paired random Fourier features for the Gaussian kernel: with
    H = M/2 frequencies w_h ~ N(0, 1/σ²) (Box-Muller over deterministic
    hash streams),

        φ(x) = sqrt(2/M) · [cos(w_1·x)…cos(w_H·x), sin(w_1·x)…sin(w_H·x)]

    so φ(x)·φ(y) = (2/M)·Σ_h cos(w_h·(x−y)), an unbiased estimate of
    exp(−||x−y||²/(2σ²)). The cos/sin pairing (no random phase) makes
    the estimate hold with the SAME features on both sides — the
    Gaussian kernel is symmetric, so pass the same DataFrame as the
    DFGF A- and B-side. (A phased single-cos map only works when both
    sides share phases; evaluating it at −x breaks the cancellation.)
    negate=True evaluates φ(−x) — the sin block flips sign — which
    exercises genuinely distinct A≠B factor chains in tests; it is NOT
    the Gaussian-kernel B-side. Returns (id, feat array<double>)."""
    if num_features % 2:
        raise ValueError("num_features must be even (cos/sin pairs)")
    h = num_features // 2
    ws = []
    for m in range(h):
        u1 = uniform01(seed, np.arange(dim, dtype=np.uint64), stream=7000 + 2 * m)
        u2 = uniform01(seed, np.arange(dim, dtype=np.uint64), stream=7001 + 2 * m)
        w = np.sqrt(-2.0 * np.log(np.maximum(u1, 1e-12))) * np.cos(2 * np.pi * u2) / sigma
        ws.append([float(x) for x in w])
    scale = math.sqrt(2.0 / num_features)
    v = F.transform(F.col(vec_col), lambda x: -x) if negate else F.col(vec_col)

    def dot(m):
        return F.aggregate(
            F.zip_with(v, F.array(*[F.lit(x) for x in ws[m]]), lambda a, b: a.cast("double") * b),
            F.lit(0.0), lambda acc, t: acc + t,
        )

    feats = F.array(
        *[F.lit(scale) * F.cos(dot(m)) for m in range(h)],
        *[F.lit(scale) * F.sin(dot(m)) for m in range(h)],
    )
    return points.select(F.col(id_col).alias("id"), feats.alias("feat"))


def _partial_reduce(df: DataFrame, fn, out_shape: tuple[int, ...]) -> np.ndarray:
    """Sum fn(pandas_batch) -> flat ndarray over all Arrow batches, then
    over partitions on the driver. fn must return a 1-D float64 array."""
    size = int(np.prod(out_shape))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = np.zeros(size)
        for b in batches:
            acc += fn(b)
        yield pd.DataFrame({"part": [acc.tolist()]})

    parts = df.mapInPandas(run, "part array<double>").collect()
    total = np.zeros(size)
    for r in parts:
        total += np.asarray(r["part"])
    return total.reshape(out_shape)


def dfgf_integrate(
    a_feat: DataFrame,
    b_feat: DataFrame,
    field: DataFrame,
    lambda_par: float,
    num_features: int,
) -> DataFrame:
    """out = x + A·(exp(λBᵀA) − I)·(BᵀA)⁻¹·Bᵀx  (reference
    graph_diffusion_gf_integrator.py:89-95). a_feat/b_feat: (id, feat
    array<double> length M); field: (id, value). Returns (id, value)."""
    m = num_features
    joined = (
        a_feat.select("id", F.col("feat").alias("af"))
        .join(b_feat.select("id", F.col("feat").alias("bf")), "id")
        .join(field.select("id", "value"), "id")
        .persist()
    )

    def bta_fn(b: pd.DataFrame) -> np.ndarray:
        bm = np.array(b["bf"].tolist(), dtype=np.float64)
        am = np.array(b["af"].tolist(), dtype=np.float64)
        return (bm.T @ am).ravel()

    def btx_fn(b: pd.DataFrame) -> np.ndarray:
        bm = np.array(b["bf"].tolist(), dtype=np.float64)
        xv = b["value"].to_numpy(dtype=np.float64)
        return bm.T @ xv

    bta = _partial_reduce(joined.select("af", "bf"), bta_fn, (m, m))
    btx = _partial_reduce(joined.select("bf", "value"), btx_fn, (m,))

    # (e^{λS} − I)·S⁻¹·v == λ·φ1(λS)·v, finite for singular S (the
    # reference computes the inverse explicitly,
    # graph_diffusion_gf_integrator.py:89-95; φ1 is the stable form)
    y = lambda_par * (_phi1(lambda_par * bta) @ btx)
    y_lit = F.array(*[F.lit(float(v)) for v in y])
    out = joined.select(
        "id",
        (
            F.col("value")
            + F.aggregate(
                F.zip_with(F.col("af"), y_lit, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, t: acc + t,
            )
        ).alias("value"),
    ).localCheckpoint(eager=True)
    joined.unpersist()
    return out
