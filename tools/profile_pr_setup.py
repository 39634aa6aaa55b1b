"""Attribute pagerank's setup_sec at the bench configuration (VERDICT r4 #9).

Builds the exact bench corpus (120k pages -> ~853k edges) if absent,
then measures, without modifying operators/pagerank.py (the blob-stamped
scaling loop):

  floor      an empty-ish scheduler round-trip (spark.range count)
  deg        the out-degree groupBy alone (one edges scan + partial agg)
  pvec       base-join-deg + repartition(id) + persist, materialized by
             the dm aggregate (the vertex-side setup chain)
  linked     edges-join-deg + repartition(src) + persist + count (the
             edge-side chain) -- in production these two run CONCURRENTLY
  fused_deg  the same two chains but with deg persisted and shared, the
             candidate fusion (saves one edges scan per setup)
  setup_sec  pagerank(max_iter=1) end-to-end, reps, as bench measures it

Prints one JSON line. Usage: python tools/profile_pr_setup.py [--reps 5]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from efficient_graph_algorithms_spark.session import get_spark  # noqa: E402

WORK = os.environ.get("BENCH_WORK", "/tmp/ega_bench")
N_PAGES = int(os.environ.get("BENCH_PAGES", "120000"))


def median_of(fn, reps: int) -> tuple[float, list[float]]:
    secs = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        secs.append(round(time.time() - t0, 3))
    return round(statistics.median(secs), 3), secs


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    spark = get_spark(
        "profile-pr-setup", master=f"local[{args.cpus}]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    sp = 32

    pages_path = f"{WORK}/pages_{N_PAGES}"
    graph_path = f"{WORK}/graph_{N_PAGES}"
    if not os.path.exists(f"{graph_path}/edges"):
        from efficient_graph_algorithms_spark.sources.edges import build_edges
        from efficient_graph_algorithms_spark.sources.pages import pages_df

        if not os.path.exists(pages_path):
            pages_df(spark, N_PAGES, seed=42).write.mode("overwrite").parquet(pages_path)
        url_dict, edges = build_edges(spark.read.parquet(pages_path))
        edges.write.mode("overwrite").parquet(f"{graph_path}/edges")
        url_dict.write.mode("overwrite").parquet(f"{graph_path}/url_dict")
        spark.catalog.clearCache()

    edges = spark.read.parquet(f"{graph_path}/edges").persist()
    n_edges = edges.count()
    vertices = spark.read.parquet(f"{graph_path}/url_dict").select("id").persist()
    n = vertices.count()

    out: dict = {"n_edges": n_edges, "n_vertices": n, "reps": args.reps, "cpus": args.cpus}

    # warm the JVM/codegen paths once before timing anything
    edges.groupBy("src").agg(F.count("*").alias("out_deg")).count()

    out["floor"], out["floor_reps"] = median_of(
        lambda: spark.range(0, 1_000_000, numPartitions=32).groupBy(
            (F.col("id") % 32).alias("k")
        ).count().count(),
        args.reps,
    )

    out["deg"], out["deg_reps"] = median_of(
        lambda: edges.groupBy("src").agg(F.count("*").alias("out_deg")).count(),
        args.reps,
    )

    def pvec_chain(deg_df):
        base = vertices.select("id", F.lit(1.0 / n).alias("p"))
        pvec = (
            base.join(
                deg_df.select(F.col("src").alias("id"), F.lit(True).alias("_has_out")),
                "id", "left",
            )
            .select("id", "p", F.col("_has_out").isNull().alias("dangling"))
            .repartition(sp, "id")
            .persist()
        )
        state = pvec.select("id", "p", "dangling", F.col("p").alias("rank"))
        dm_expr = F.sum(
            F.when(F.col("dangling"), F.col("rank")).otherwise(F.lit(0.0))
        ).alias("dm")
        float(state.agg(dm_expr).collect()[0]["dm"] or 0.0)
        return pvec

    def linked_chain(deg_df):
        linked = (
            edges.join(deg_df, "src")
            .select("src", "dst", (F.lit(1.0) / F.col("out_deg")).alias("inv_deg"))
            .repartition(sp, "src")
            .persist()
        )
        linked.count()
        return linked

    def current_structure():
        deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
        import threading

        linked_box: list = []
        t = threading.Thread(target=lambda: linked_box.append(linked_chain(deg)))
        t.start()
        pvec = pvec_chain(deg)
        t.join()
        pvec.unpersist()
        linked_box[0].unpersist()

    out["current_concurrent"], out["current_reps"] = median_of(
        current_structure, args.reps
    )

    def fused_structure():
        deg = edges.groupBy("src").agg(F.count("*").alias("out_deg")).persist()
        import threading

        linked_box: list = []
        t = threading.Thread(target=lambda: linked_box.append(linked_chain(deg)))
        t.start()
        pvec = pvec_chain(deg)
        t.join()
        deg.unpersist()
        pvec.unpersist()
        linked_box[0].unpersist()

    out["fused_deg_concurrent"], out["fused_reps"] = median_of(
        fused_structure, args.reps
    )

    # the real thing, as bench measures it
    from efficient_graph_algorithms_spark.operators.pagerank import pagerank

    setup_secs = []
    for _ in range(args.reps):
        _ranks, info = pagerank(spark, edges, vertices=vertices, max_iter=1)
        _ranks.count()
        setup_secs.append(info["setup_sec"])
    out["setup_sec_median"] = round(statistics.median(setup_secs), 3)
    out["setup_sec_reps"] = setup_secs

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
