"""Hub-skew stress A/B: salted vs unsalted adjacency-block PageRank.

BENCH/scaling measures the web-shaped Zipf tail, whose hubs never
reach the salting threshold's pain zone — so the salting machinery
(sources/edges.py:199 ``adjacency_blocks``, SALT_THRESHOLD) was tested
for correctness but never MEASURED under the skew it exists for. This
probe manufactures that skew: a graph whose single hottest source (and
a matching hot destination) carries a configurable fraction of ALL
edges — out/in-degree >= 10^4 x the average — and runs the identical
fixed-iteration PageRank SpMV over the adjacency-block representation
twice:

  salted:    adjacency_blocks(edges, SALT_THRESHOLD)   (production)
  unsalted:  adjacency_blocks(edges, 2**62)            (one row/src)

The SpMV loop here deliberately lives in this tool, NOT in
operators/pagerank.py: the production loop is the blob-stamped subject
of BENCH/scaling.json, and this probe measures the REPRESENTATION
under skew, not that loop. (The production edge-list loop is also run
once on the same input as a reference number — its groupBy(dst)
partial aggregation is the skew-neutral baseline.)

Why the unsalted side hurts: a hub src is ONE collect_list group and
ONE explode row — its entire fan-out serializes into a single task,
a straggler ~ (hub_degree / edges-per-task) x a normal task; salting
splits it into ceil(2*deg/threshold) independent rows. The in-degree
hub costs little either way (map-side combine absorbs it before the
shuffle) — that asymmetry is part of what this records.

Usage: python tools/bench_skew.py [--vertices 2000000] [--edges 20000000]
           [--hub-frac 0.2] [--iters 5] [--repeats 3]
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from collections.abc import Iterator
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from efficient_graph_algorithms_spark.functions.hashing import uniform01  # noqa: E402
from efficient_graph_algorithms_spark.session import get_spark  # noqa: E402

ALPHA = 0.85


def gen_hub_edges(spark, nv: int, ne: int, hub_frac: float, seed: int, parts: int):
    """Deterministic hub-heavy edge table: a ``hub_frac`` fraction of
    edge slots attaches to vertex 0 (half as source fan-OUT, half as
    destination fan-IN); the rest is the scaling generator's u^1.6/u^2.5
    web shape. At the defaults the hub's out-degree is ~0.1*ne = 2e6 vs
    a ~10 average — 2*10^5 x, far past the 10^4 x bar."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            idx = b["id"].to_numpy(np.uint64)
            us = uniform01(seed, idx, stream=41)
            ud = uniform01(seed, idx, stream=42)
            uh = uniform01(seed, idx, stream=43)
            src = (nv * us**1.6).astype(np.int64)
            dst = (nv * ud**2.5).astype(np.int64)
            hub_out = uh < (hub_frac / 2.0)
            hub_in = (uh >= (hub_frac / 2.0)) & (uh < hub_frac)
            src = np.where(hub_out, 0, src)
            dst = np.where(hub_in, 0, dst)
            dst = np.where(dst == src, (dst + 1) % nv, dst)
            yield pd.DataFrame({"src": src, "dst": dst})

    return (
        spark.range(0, ne, numPartitions=parts)
        .mapInPandas(gen, "src long, dst long")
        .dropDuplicates(["src", "dst"])
    )


def block_pagerank_secs(spark, blocks, n: int, iters: int) -> list[float]:
    """Fixed-iteration PageRank SpMV over (src, salt, dsts, out_deg)
    blocks: join rank on src, explode dsts, groupBy(dst) sum — the
    gather-scatter the adjacency representation exists for. Returns
    per-iteration wall seconds."""
    from pyspark.sql import functions as F

    ranks = spark.range(n).select("id", F.lit(1.0 / n).alias("rank"))
    ranks = ranks.localCheckpoint(eager=True)
    secs = []
    for _ in range(iters):
        t0 = time.time()
        contrib = (
            blocks.join(ranks.withColumnRenamed("id", "src"), "src")
            .select(
                F.explode("dsts").alias("id"),
                (F.col("rank") / F.col("out_deg")).alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("c"))
        )
        ranks = (
            ranks.join(contrib, "id", "left")
            .select(
                "id",
                (
                    F.lit((1.0 - ALPHA) / n)
                    + F.lit(ALPHA) * F.coalesce(F.col("c"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        secs.append(time.time() - t0)
    return secs


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--vertices", type=int, default=2_000_000)
    ap.add_argument("--edges", type=int, default=20_000_000)
    ap.add_argument("--hub-frac", type=float, default=0.2)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from efficient_graph_algorithms_spark.sources.edges import (
        SALT_THRESHOLD,
        adjacency_blocks,
    )

    spark = get_spark(
        "bench-skew", master=f"local[{args.cpus}]", shuffle_partitions=128
    )
    spark.sparkContext.setLogLevel("ERROR")
    edges = gen_hub_edges(
        spark, args.vertices, args.edges, args.hub_frac, args.seed, parts=128
    ).persist()
    ne = edges.count()
    hub = (
        edges.groupBy("src").count().orderBy(F.desc("count")).limit(1).collect()[0]
    )
    hub_in = (
        edges.groupBy("dst").count().orderBy(F.desc("count")).limit(1).collect()[0]
    )
    avg_deg = ne / args.vertices
    summary: dict = {
        "n_edges": ne,
        "n_vertices": args.vertices,
        "hub_frac": args.hub_frac,
        "avg_out_degree": round(avg_deg, 2),
        "hub_out_degree": hub["count"],
        "hub_out_multiple": round(hub["count"] / avg_deg, 1),
        "hub_in_degree": hub_in["count"],
        "iters": args.iters,
        "repeats": args.repeats,
        "salt_threshold": SALT_THRESHOLD,
    }
    print(f"skew input: {summary}", file=sys.stderr, flush=True)

    results: dict[str, dict] = {}
    for label, thr in (("salted", SALT_THRESHOLD), ("unsalted", 2**62)):
        t0 = time.time()
        blocks = adjacency_blocks(edges, salt_threshold=thr).persist()
        n_blocks = blocks.count()
        build_sec = time.time() - t0
        max_block = blocks.agg(F.max(F.size("dsts"))).collect()[0][0]
        iter_secs_all: list[list[float]] = []
        for _ in range(args.repeats):
            iter_secs_all.append(
                block_pagerank_secs(spark, blocks, args.vertices, args.iters)
            )
        blocks.unpersist()
        # steady-state: drop the first iteration of each rep (codegen/JIT)
        steady = [s for rep in iter_secs_all for s in rep[1:]]
        results[label] = {
            "threshold": thr,
            "n_blocks": n_blocks,
            "max_block_dsts": max_block,
            "build_sec": round(build_sec, 2),
            "sec_per_iter_median": round(statistics.median(steady), 3),
            "edges_per_sec_per_iter": round(ne / statistics.median(steady), 1),
            "iter_secs": [[round(s, 3) for s in rep] for rep in iter_secs_all],
        }
        print(f"{label}: {results[label]}", file=sys.stderr, flush=True)

    # reference number: the production edge-list loop on the same input
    from efficient_graph_algorithms_spark.operators.pagerank import pagerank

    verts = spark.range(args.vertices).select("id")
    t0 = time.time()
    ranks, info = pagerank(
        spark, edges, vertices=verts, max_iter=args.iters, tol=0.0
    )
    ranks.count()
    prod_secs = info["iter_secs"]
    results["production_edge_list"] = {
        "sec_per_iter_median": round(statistics.median(prod_secs[1:]), 3),
        "iter_secs": prod_secs,
        "wall_sec": round(time.time() - t0, 2),
    }
    summary["results"] = results
    summary["salted_speedup_vs_unsalted"] = round(
        results["unsalted"]["sec_per_iter_median"]
        / results["salted"]["sec_per_iter_median"],
        3,
    )
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
