from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from efficient_graph_algorithms_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("ega-spark-tests", master="local[4]", shuffle_partitions=8)
    # AQE's per-shuffle replanning costs ~2x wall time on the tiny
    # iterative test graphs (measured: GW proximal loop 14.5s -> 8.1s,
    # identical results); production sessions keep it on — it wins at
    # 100M-edge scale (see operators/pagerank.py loop notes)
    s.conf.set("spark.sql.adaptive.enabled", "false")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_pages_pd():
    from efficient_graph_algorithms_spark.sources.pages import pages_pandas

    return pages_pandas(300, seed=42)


def edges_from_pages_pd(pages_pd):
    """Oracle-side edge extraction: same pure extractor, pure pandas."""
    from efficient_graph_algorithms_spark.functions.extract import extract_hrefs

    pairs = set()
    for url, html in zip(pages_pd["url"], pages_pd["html"]):
        for h in extract_hrefs(html):
            if h != url:
                pairs.add((url, h))
    urls = sorted(set(pages_pd["url"]) | {d for _, d in pairs})
    ids = {u: i for i, u in enumerate(urls)}
    edges = sorted((ids[s], ids[d]) for s, d in pairs)
    return urls, np.array(edges, dtype=np.int64)
