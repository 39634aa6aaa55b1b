"""Deterministic synthetic Common-Crawl-style pages table.

Schema (exactly the input hint):
    url: string, warc_ts: timestamp, html: binary, text: string, lang: string

Properties (FIXTURES.md §1):
- domain ids Zipf-like skewed over D domains;
- out-degree Zipf-truncated [0, 50] with ~2% dangling pages;
- link targets preferential-attachment-biased toward hub pages, so a few
  dst vertices carry >=10^3-10^4 x the average in-degree (skew test bed);
- ~1% of links point outside the corpus (vertices with no page row);
- ``text`` is EXACTLY ``extract_text(html)`` — the byte-identical
  invariant holds by construction and is asserted in tests.

Everything is a pure function of (seed, page index) via splitmix64, so
generation under ``mapInPandas`` is independent of partitioning and
parallelism. The reference's analogue is its seeded random graph
families (``reference scripts/experiments/test_spanning_trees.py:19-47``,
``reference test/test_graph_kernels.py:7``).

At bench scale the table is generated distributively and persisted to
parquet once; algorithms never regenerate.
"""

from __future__ import annotations

from collections.abc import Iterator
from datetime import datetime, timedelta, timezone

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from efficient_graph_algorithms_spark.functions.extract import extract_text
from efficient_graph_algorithms_spark.functions.hashing import uniform01

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)

_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)
_VOCAB = (
    "graph link crawl page rank spark shuffle web data node edge hub "
    "index query batch scale join merge hash sort scan"
).split()
MAX_OUT_DEGREE = 50
DANGLING_FRAC = 0.02
EXTERNAL_FRAC = 0.01


def _domain_of(idx: np.ndarray, n: int, seed: int) -> np.ndarray:
    """Zipf-like domain assignment: low domain ids get most pages."""
    d_count = max(10, n // 100)
    u = uniform01(seed, idx, stream=1)
    return np.minimum((d_count * u**3.0).astype(np.int64), d_count - 1)


def _out_degree(idx: np.ndarray, seed: int) -> np.ndarray:
    """Zipf-truncated out-degree in {0} ∪ [4, 50]: u <= 1 makes
    4·u^-0.5 >= 4, so non-dangling pages always carry at least 4
    links; ~2% dangling (degree 0)."""
    u_dangle = uniform01(seed, idx, stream=2)
    u = np.clip(uniform01(seed, idx, stream=3), 1e-12, 1.0)
    deg = np.minimum((4.0 * u**-0.5).astype(np.int64), MAX_OUT_DEGREE)
    deg[u_dangle < DANGLING_FRAC] = 0
    return deg


def _url_of(idx: np.ndarray, n: int, seed: int) -> list[str]:
    doms = _domain_of(idx, n, seed)
    return [f"https://d{d}.example/p{i}" for d, i in zip(doms, idx)]


def _targets_of(i: int, deg: int, n: int, seed: int) -> list[int]:
    """Link targets for page i: preferential toward low page indices
    (hub pages). Returns corpus indices; -1 marks an external link."""
    if deg == 0:
        return []
    ks = np.arange(deg, dtype=np.uint64) + np.uint64(i) * np.uint64(MAX_OUT_DEGREE + 1)
    u_ext = uniform01(seed, ks, stream=4)
    v = uniform01(seed, ks, stream=5)
    t = (n * v**2.5).astype(np.int64)
    t = np.where(t == i, (t + 1) % n, t)
    t[u_ext < EXTERNAL_FRAC] = -1
    return t.tolist()


def _lorem(i: int, seed: int) -> str:
    ws = uniform01(seed, np.uint64(i) + np.arange(8, dtype=np.uint64) * np.uint64(1_000_003), stream=6)
    return " ".join(_VOCAB[int(w * len(_VOCAB))] for w in ws)


def _lang_of(idx: np.ndarray, seed: int) -> list[str]:
    u = uniform01(seed, idx, stream=8)
    return ["en" if x < 0.95 else ("de" if x < 0.975 else "fr") for x in u]


def gen_pages_pandas(idx: np.ndarray, n: int, seed: int = 42) -> pd.DataFrame:
    """Generate page rows for the given global indices. Pure function."""
    idx = idx.astype(np.uint64)
    urls = _url_of(idx, n, seed)
    degs = _out_degree(idx, seed)
    langs = _lang_of(idx, seed)
    htmls: list[bytes] = []
    texts: list[str] = []
    for pos, i in enumerate(idx.astype(np.int64)):
        targets = _targets_of(int(i), int(degs[pos]), n, seed)
        anchors = []
        for k, t in enumerate(targets):
            if t < 0:
                ext = (int(i) * 53 + k) % max(n // 10, 10)
                href = f"https://ext{ext}.example/q{ext}"
            else:
                href = _url_of(np.array([t], dtype=np.uint64), n, seed)[0]
            anchors.append(f'<a href="{href}">l{k}</a>')
        html = (
            f"<html><head><title>t{int(i)}</title></head><body>"
            f"<p>{_lorem(int(i), seed)}</p>" + "".join(anchors) + "</body></html>"
        ).encode("utf-8")
        htmls.append(html)
        texts.append(extract_text(html))
    ts = [_EPOCH + timedelta(seconds=int(i)) for i in idx.astype(np.int64)]
    return pd.DataFrame(
        {"url": urls, "warc_ts": ts, "html": htmls, "text": texts, "lang": langs}
    )


def pages_pandas(n: int, seed: int = 42) -> pd.DataFrame:
    """Whole corpus as pandas — oracle/test scale only."""
    return gen_pages_pandas(np.arange(n, dtype=np.uint64), n, seed)


def pages_df(spark: SparkSession, n: int, seed: int = 42, partitions: int | None = None) -> DataFrame:
    """Distributed generation: spark.range → mapInPandas (Arrow batches)."""
    parts = partitions or max(4, min(256, n // 5000 or 4))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield gen_pages_pandas(b["id"].to_numpy(np.uint64), n, seed)

    return spark.range(0, n, numPartitions=parts).mapInPandas(gen, PAGES_SCHEMA)
