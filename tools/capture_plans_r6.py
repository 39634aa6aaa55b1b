"""Capture explain("formatted") plans for every bench query (r6 evidence).

Usage: EGA_PLAN_DUMP_SUFFIX=_before python tools/capture_plans_r6.py
Writes into plans/r06/ (override with EGA_PLAN_DUMP_DIR). Iterative
operators dump their own loop-body plan via plans/explain.py hooks; the
non-loop queries are explained directly here. Requires the bench corpus
(run bench.py once first).
"""

from __future__ import annotations

import math
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

os.environ.setdefault("EGA_PLAN_DUMP_DIR", str(REPO / "plans" / "r06"))

from pyspark.sql import functions as F  # noqa: E402

from efficient_graph_algorithms_spark.plans.explain import dump_plan  # noqa: E402
from efficient_graph_algorithms_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_PAGES = int(os.environ.get("BENCH_PAGES", "120000"))
WORK = os.environ.get("BENCH_WORK", "/tmp/ega_bench")


def main() -> int:
    spark = get_spark("ega-plans", master=f"local[{CPUS}]", shuffle_partitions=max(CPUS, 32))
    spark.sparkContext.setLogLevel("ERROR")
    graph_path = f"{WORK}/graph_{N_PAGES}"
    pages_path = f"{WORK}/pages_{N_PAGES}"
    edges = spark.read.parquet(f"{graph_path}/edges").persist()
    edges.count()
    vertices = spark.read.parquet(f"{graph_path}/url_dict").select("id").persist()
    n_vertices = vertices.count()

    # -- q_extract: plan of the edges output (pre-write) -------------------
    from efficient_graph_algorithms_spark.sources.edges import build_edges

    pages = spark.read.parquet(pages_path)
    url_dict, e_out = build_edges(pages)
    dump_plan(e_out, "extract_edges")
    dump_plan(url_dict, "extract_url_dict")
    spark.catalog.clearCache()
    edges.persist(); edges.count()
    vertices.persist(); vertices.count()

    # -- loop operators dump their own first-iteration plan ----------------
    from efficient_graph_algorithms_spark.operators.pagerank import pagerank

    ranks, _ = pagerank(spark, edges, vertices=vertices, tol=1e-6, max_iter=2)
    ranks.count()

    from efficient_graph_algorithms_spark.operators.components import connected_components

    labels, _ = connected_components(spark, edges, vertices=vertices, max_iter=2)
    labels.count()

    from efficient_graph_algorithms_spark.operators.lpa import label_propagation

    lab, _ = label_propagation(spark, edges, vertices=vertices, max_iter=2)
    lab.count()

    from efficient_graph_algorithms_spark.operators.kcore import k_core

    core, _ = k_core(spark, edges, k=3, max_iter=2)
    core.count()

    # -- q_triangles -------------------------------------------------------
    from efficient_graph_algorithms_spark.operators.triangles import triangle_count

    dump_plan(triangle_count(edges), "triangles")

    # -- q_dedup -----------------------------------------------------------
    from efficient_graph_algorithms_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    dump_plan(minhash_lsh_pairs(docs, threshold=0.5), "dedup_minhash_lsh")

    # -- q_topk_sim --------------------------------------------------------
    from efficient_graph_algorithms_spark.operators.similarity import cosine_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 16).select(F.col("vec_id").alias("qid"), "embedding")
    dump_plan(cosine_topk(emb, q, k=10), "topk_sim")

    # -- q_knn_lsh ---------------------------------------------------------
    from efficient_graph_algorithms_spark.operators.ann import knn_graph

    dump_plan(knn_graph(emb, k=5, method="lsh", n_tables=4, n_planes=8, dim=64), "knn_lsh")

    # -- q_tree_gfi: the level loop dumps its own plan ---------------------
    from efficient_graph_algorithms_spark.operators.trees import tree_gfi_matvec

    heap_tree = spark.range(1, n_vertices).select(
        "id",
        ((F.col("id") - 1) / 2).cast("long").alias("parent"),
        ((1 + F.col("id") % 5) / F.lit(4.0)).alias("w"),
        F.floor(F.log2(F.col("id") + 1)).cast("int").alias("depth"),
    )
    fld = spark.range(n_vertices).select("id", (F.col("id") % 97 / 97.0).alias("value"))
    out = tree_gfi_matvec(heap_tree, fld, a=-0.5, root=0)
    out.count()

    spark.stop()
    print("plans written to", os.environ["EGA_PLAN_DUMP_DIR"])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
