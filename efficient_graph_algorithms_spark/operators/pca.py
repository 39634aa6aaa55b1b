"""Distributed PCA / whitening over an embedding column (array<float>).

The embedding-pipeline preprocessing step (SemDeDup-style pipelines
normalize and reduce dimensionality before clustering; retrieval
stacks whiten before indexing — all public practice). The distributed
work is the second-moment reduction:

    G = X^T X        (d x d)   and   s = X^T 1   (d)

computed as ONE ``mapInPandas`` pass emitting a d*d partial per Arrow
batch group (NumPy ``X.T @ X`` inside the batch — the classic
treeAggregate shape) followed by one tiny ``groupBy(i, j)`` over
partials: the shuffle carries O(partitions * d^2) rows, never a
per-row outer product, and no vector data reaches the driver. The
eigendecomposition runs DRIVER-SIDE by the same summary contract as
the GW family: C is d x d (d <= a few thousand for any real embedding
column), the same dense shape NumPy carries anywhere.

``project`` applies the fitted components back over the table in one
vectorized Arrow pass (X @ W per batch, no shuffle).

Determinism note: the partial-sum merge order perturbs G at ~1e-13 of
its magnitude; the parity query rounds to 6 decimals (the repo's
cross-engine convention), and the eigen tests compare with tolerances
and sign-normalization (eigenvectors are sign-ambiguous).

No reference counterpart (the reference is a graph library); part of
the engine's LLM-data-pipeline extension surface (SURVEY §2.12).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dim(emb: DataFrame, vec_col: str) -> int:
    # filter NULL vectors BEFORE sampling a row: size(NULL) is NULL and
    # int(None) would crash partition-order-dependently on tables that
    # legitimately contain NULL vectors (which every entry point skips)
    row = (
        emb.where(F.col(vec_col).isNotNull())
        .select(F.size(vec_col).alias("d"))
        .limit(1)
        .collect()
    )
    if not row:
        raise ValueError("empty embedding table (no non-null vectors)")
    return int(row[0]["d"])


def gram_matrix(
    emb: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """(i, j, g): the raw second-moment matrix G = X^T X as a d x d COO
    table (0-based dims, all entries incl. zeros). Rows with NULL
    vectors are skipped; a ragged vector (wrong length) fails loudly
    inside the batch."""
    d = _dim(emb, vec_col)

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = np.zeros((d, d), dtype=np.float64)
        seen = False
        for b in batches:
            vecs = [v for v in b[vec_col] if v is not None]
            if not vecs:
                continue
            x = np.asarray(np.stack(vecs), dtype=np.float64)
            if x.shape[1] != d:
                raise ValueError(f"ragged embedding: {x.shape[1]} != {d}")
            acc += x.T @ x
            seen = True
        if seen:
            ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
            yield pd.DataFrame(
                {"i": ii.ravel(), "j": jj.ravel(), "g": acc.ravel()}
            )

    return (
        emb.select(vec_col)
        .mapInPandas(part, "i int, j int, g double")
        .groupBy("i", "j")
        .agg(F.sum("g").alias("g"))
    )


def _moments(emb: DataFrame, vec_col: str, d: int) -> tuple[np.ndarray, np.ndarray, int]:
    """Driver-side (G, s, n) from one distributed pass: G = X^T X,
    s = column sums, n = row count — d*d + d + 1 scalars total."""

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = np.zeros((d, d), dtype=np.float64)
        s = np.zeros(d, dtype=np.float64)
        n = 0
        for b in batches:
            vecs = [v for v in b[vec_col] if v is not None]
            if not vecs:
                continue
            x = np.asarray(np.stack(vecs), dtype=np.float64)
            acc += x.T @ x
            s += x.sum(axis=0)
            n += len(vecs)
        if n:
            ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
            out = pd.DataFrame({"i": ii.ravel(), "j": jj.ravel(), "g": acc.ravel()})
            out = pd.concat(
                [out, pd.DataFrame({"i": np.arange(d), "j": -1, "g": s}),
                 pd.DataFrame({"i": [-1], "j": [-1], "g": [float(n)]})]
            )
            yield out

    rows = (
        emb.select(vec_col)
        .mapInPandas(part, "i int, j int, g double")
        .groupBy("i", "j")
        .agg(F.sum("g").alias("g"))
        .collect()
    )
    g = np.zeros((d, d))
    s = np.zeros(d)
    n = 0
    for r in rows:
        if r["i"] == -1:
            n = int(r["g"])
        elif r["j"] == -1:
            s[r["i"]] = float(r["g"])
        else:
            g[r["i"], r["j"]] = float(r["g"])
    return g, s, n


def pca_fit(
    emb: DataFrame,
    k: int,
    vec_col: str = "embedding",
    center: bool = True,
) -> dict[str, Any]:
    """Fit top-k principal components. Returns {components (k, d) —
    rows are components, sign-normalized so each row's
    largest-|.|-entry is positive; explained_variance (k,);
    explained_variance_ratio (k,); mean (d,); n}."""
    d = _dim(emb, vec_col)
    if not 1 <= k <= d:
        raise ValueError(f"k must be in [1, {d}], got {k}")
    g, s, n = _moments(emb, vec_col, d)
    if n < 2:
        raise ValueError(f"need >= 2 vectors to fit PCA, got {n}")
    mean = s / n
    cov = (g - n * np.outer(mean, mean)) / (n - 1) if center else g / (n - 1)
    cov = (cov + cov.T) / 2.0  # symmetrize away merge-order noise
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T
    # sign convention: largest-|entry| of each component positive
    for r in range(k):
        m = np.argmax(np.abs(comps[r]))
        if comps[r, m] < 0:
            comps[r] = -comps[r]
    ev = evals[order]
    total = float(evals.sum())
    return {
        "components": comps,
        "explained_variance": ev,
        "explained_variance_ratio": ev / total if total > 0 else ev * 0.0,
        "mean": mean if center else np.zeros(d),
        "n": n,
    }


def project(
    emb: DataFrame,
    model: dict[str, Any],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "proj",
) -> DataFrame:
    """(id_col, out_col array<double>): (x - mean) @ components^T per
    row, one vectorized Arrow pass, no shuffle."""
    comps = np.asarray(model["components"], dtype=np.float64)
    mean = np.asarray(model["mean"], dtype=np.float64)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            keep = b[vec_col].notna()
            x = np.asarray(np.stack(list(b.loc[keep, vec_col])), dtype=np.float64) if keep.any() else np.zeros((0, len(mean)))
            p = (x - mean) @ comps.T
            yield pd.DataFrame(
                {id_col: b.loc[keep, id_col].to_numpy(), out_col: list(p)}
            )

    # derive the id field's type from the input instead of assuming
    # long — string/hash document keys are first-class elsewhere
    id_type = emb.schema[id_col].dataType.simpleString()
    return emb.select(id_col, vec_col).mapInPandas(
        run, f"{id_col} {id_type}, {out_col} array<double>"
    )
