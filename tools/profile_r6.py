"""Round-6 profiling harness: per-operator breakdowns on the bench corpus.

Usage: python tools/profile_r6.py [pagerank|cc|lpa|tree|knn|extract] ...
Prints timing internals (setup/iter/write secs) for each requested op.
Assumes the bench corpus already exists under $BENCH_WORK (run bench.py
once first).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from efficient_graph_algorithms_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_PAGES = int(os.environ.get("BENCH_PAGES", "120000"))
WORK = os.environ.get("BENCH_WORK", "/tmp/ega_bench")


def main() -> int:
    which = sys.argv[1:] or ["pagerank"]
    spark = get_spark("ega-profile", master=f"local[{CPUS}]", shuffle_partitions=max(CPUS, 32))
    spark.sparkContext.setLogLevel("ERROR")
    graph_path = f"{WORK}/graph_{N_PAGES}"
    edges = spark.read.parquet(f"{graph_path}/edges").persist()
    edges.count()
    vertices = spark.read.parquet(f"{graph_path}/url_dict").select("id").persist()
    vertices.count()

    if "pagerank" in which:
        from efficient_graph_algorithms_spark.operators.pagerank import pagerank

        for rep in range(3):
            t0 = time.time()
            ranks, info = pagerank(spark, edges, vertices=vertices, tol=1e-6)
            ranks.count()
            wall = time.time() - t0
            print(json.dumps({
                "op": "pagerank", "rep": rep, "wall": round(wall, 3),
                "setup_sec": info["setup_sec"], "loop_sec": info["loop_sec"],
                "iters": info["iterations"],
                "iter_secs": info["iter_secs"],
                "write_secs": info.get("write_secs"),
            }), flush=True)

    if "cc" in which:
        from efficient_graph_algorithms_spark.operators.components import connected_components

        for rep in range(3):
            t0 = time.time()
            labels, cinfo = connected_components(spark, edges, vertices=vertices)
            labels.count()
            print(json.dumps({"op": "cc", "rep": rep, "wall": round(time.time() - t0, 3),
                              "info": cinfo}), flush=True)

    if "lpa" in which:
        from efficient_graph_algorithms_spark.operators.lpa import label_propagation

        for rep in range(3):
            t0 = time.time()
            lab, info = label_propagation(spark, edges, vertices=vertices, max_iter=5)
            lab.count()
            print(json.dumps({"op": "lpa", "rep": rep, "wall": round(time.time() - t0, 3),
                              "info": info}), flush=True)

    if "tree" in which:
        import math

        from efficient_graph_algorithms_spark.operators.trees import tree_gfi_matvec

        n_tree = vertices.count()
        heap_tree = spark.range(1, n_tree).select(
            "id",
            ((F.col("id") - 1) / 2).cast("long").alias("parent"),
            ((1 + F.col("id") % 5) / F.lit(4.0)).alias("w"),
            F.floor(F.log2(F.col("id") + 1)).cast("int").alias("depth"),
        )
        fld = spark.range(n_tree).select("id", (F.col("id") % 97 / 97.0).alias("value"))
        for method in ("levels", "doubling"):
            for rep in range(2):
                t0 = time.time()
                out = tree_gfi_matvec(heap_tree, fld, a=-0.5, root=0, method=method)
                n = out.count()
                print(json.dumps({"op": f"tree_{method}", "rep": rep,
                                  "wall": round(time.time() - t0, 3), "rows": n}), flush=True)

    if "knn" in which:
        from efficient_graph_algorithms_spark.operators.ann import knn_graph

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        for rep in range(3):
            t0 = time.time()
            n = knn_graph(emb, k=5, method="lsh", n_tables=4, n_planes=8, dim=64).count()
            print(json.dumps({"op": "knn_lsh", "rep": rep,
                              "wall": round(time.time() - t0, 3), "edges": n}), flush=True)

    if "extract" in which:
        from efficient_graph_algorithms_spark.sources.edges import build_edges

        pages_path = f"{WORK}/pages_{N_PAGES}"
        for rep in range(3):
            t0 = time.time()
            pages = spark.read.parquet(pages_path)
            url_dict, e = build_edges(pages)
            e.write.mode("overwrite").parquet(f"{WORK}/_prof_edges")
            url_dict.write.mode("overwrite").parquet(f"{WORK}/_prof_dict")
            spark.catalog.clearCache()
            print(json.dumps({"op": "extract", "rep": rep,
                              "wall": round(time.time() - t0, 3)}), flush=True)

    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
