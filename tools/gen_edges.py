"""Direct deterministic edge-table generator for the scaling bench.

The pages→extraction path is benchmarked separately (bench.py
q_extract); the SCALING protocol needs a graph big enough that a
PageRank iteration is compute-bound (≥100M edges), which would take
hours to synthesize through html. This generator emits the same
web-shaped structure — Zipf out-degrees, preferential-attachment
hub-biased targets, ~2% dangling — directly as (src, dst), purely a
function of (seed, edge index): identical bytes at any parallelism.

Usage: python tools/gen_edges.py --vertices 12000000 --edges 100000000 \
           --out /tmp/ega_bench/scaling_graph_large
"""

from __future__ import annotations

import argparse
import sys
from collections.abc import Iterator
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from efficient_graph_algorithms_spark.functions.hashing import uniform01  # noqa: E402
from efficient_graph_algorithms_spark.session import get_spark  # noqa: E402


def gen_edges_pandas(idx: np.ndarray, n_vertices: int, seed: int) -> pd.DataFrame:
    """Edge k: src = hub-biased-ish uniform vertex (Zipf out-degree arises
    from src collisions under u^1.6 bias), dst = strongly hub-biased
    (u^2.5) — same shape as the pages generator's link targets."""
    idx = idx.astype(np.uint64)
    us = uniform01(seed, idx, stream=31)
    ud = uniform01(seed, idx, stream=32)
    src = (n_vertices * us**1.6).astype(np.int64)
    dst = (n_vertices * ud**2.5).astype(np.int64)
    dst = np.where(dst == src, (dst + 1) % n_vertices, dst)
    return pd.DataFrame({"src": src, "dst": dst})


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--vertices", type=int, required=True)
    ap.add_argument("--edges", type=int, required=True)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out", required=True)
    ap.add_argument("--partitions", type=int, default=128)
    args = ap.parse_args()

    spark = get_spark("gen-edges", shuffle_partitions=args.partitions)
    spark.sparkContext.setLogLevel("ERROR")
    nv, seed = args.vertices, args.seed

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield gen_edges_pandas(b["id"].to_numpy(np.uint64), nv, seed)

    edges = (
        spark.range(0, args.edges, numPartitions=args.partitions)
        .mapInPandas(gen, "src long, dst long")
        .dropDuplicates(["src", "dst"])
    )
    edges.write.mode("overwrite").parquet(f"{args.out}/edges")
    n = spark.read.parquet(f"{args.out}/edges").count()
    spark.range(nv).select("id").write.mode("overwrite").parquet(f"{args.out}/url_dict")
    print(f"wrote {n} distinct edges over {nv} vertices to {args.out}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
