"""Round-6 tree-GFI measurement harness (evidence for OPTIMIZATION_r06.md).

Three probes over the bench-shaped heap tree (126,154 vertices, depth
16), all in ONE Spark session so host noise cancels pairwise:

  gate   — interleaved A/B of the small-tree regime gate
           (adaptive partitions + AQE off) on vs off, x4 pairs
  cut    — interleaved A/B of the levels walker's parquet-cut cadence,
           cut_every 8 vs 16, x4 pairs
  stats  — 16 uncut localCheckpoint levels of the exact up-pass loop
           shape, printing the carried sizeInBytes digit count per
           level (shows LINEAR digit growth — the aggregate-interposed
           shape, not the self-join digit-doubling meltdown)

Usage: python tools/ab_tree_r6.py [gate|cut|stats] ...
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from efficient_graph_algorithms_spark.operators import trees  # noqa: E402
from efficient_graph_algorithms_spark.session import get_spark  # noqa: E402

N_TREE = 126154


def _fixture(spark):
    heap_tree = spark.range(1, N_TREE).select(
        "id",
        ((F.col("id") - 1) / 2).cast("long").alias("parent"),
        ((1 + F.col("id") % 5) / F.lit(4.0)).alias("w"),
        F.floor(F.log2(F.col("id") + 1)).cast("int").alias("depth"),
    )
    fld = spark.range(N_TREE).select("id", (F.col("id") % 97 / 97.0).alias("value"))
    return heap_tree, fld


def main() -> int:
    which = sys.argv[1:] or ["gate", "cut"]
    spark = get_spark("ab-tree-r6", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    heap_tree, fld = _fixture(spark)

    if "gate" in which or "cut" in which:
        # warmup (absorbs JVM/JIT cold start)
        trees.tree_gfi_matvec(heap_tree, fld, a=-0.5, root=0, method="levels").count()

    if "gate" in which:
        default_gate = trees.SMALL_TREE_GATE_MAX_N
        res: dict[str, list[float]] = {"on": [], "off": []}
        for rep in range(4):
            for arm in ("off", "on"):
                trees.SMALL_TREE_GATE_MAX_N = default_gate if arm == "on" else 0
                t0 = time.time()
                n = trees.tree_gfi_matvec(
                    heap_tree, fld, a=-0.5, root=0, method="levels"
                ).count()
                res[arm].append(round(time.time() - t0, 3))
                print(json.dumps({"probe": "gate", "arm": arm, "rep": rep,
                                  "wall": res[arm][-1], "rows": n}), flush=True)
        trees.SMALL_TREE_GATE_MAX_N = default_gate
        print(json.dumps({"probe": "gate",
                          "medians": {k: sorted(v)[len(v) // 2] for k, v in res.items()}}))

    if "cut" in which:
        resc: dict[int, list[float]] = {8: [], 16: []}
        for rep in range(4):
            for ce in (16, 8):
                t0 = time.time()
                n = trees.tree_gfi_matvec(
                    heap_tree, fld, a=-0.5, root=0, method="levels", cut_every=ce
                ).count()
                resc[ce].append(round(time.time() - t0, 3))
                print(json.dumps({"probe": "cut", "cut_every": ce, "rep": rep,
                                  "wall": resc[ce][-1], "rows": n}), flush=True)
        print(json.dumps({"probe": "cut",
                          "medians": {k: sorted(v)[len(v) // 2] for k, v in resc.items()}}))

    if "stats" in which:
        edges = heap_tree.select(
            "id", "parent", "depth", F.lit(0.5).alias("fw")
        ).persist()
        edges.count()
        partial = fld.select("id", F.col("value").alias("partial"))
        for lvl in range(16, 0, -1):
            msgs = (
                edges.where(F.col("depth") == lvl)
                .join(partial, "id")
                .groupBy(F.col("parent").alias("id"))
                .agg(F.sum(F.col("fw") * F.col("partial")).alias("up"))
            )
            nxt = partial.join(msgs, "id", "left").select(
                "id",
                (F.col("partial") + F.coalesce(F.col("up"), F.lit(0.0))).alias("partial"),
            )
            t0 = time.time()
            partial = nxt.localCheckpoint(eager=True)
            digits = len(str(
                partial._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()  # noqa: SLF001
            ))
            print(json.dumps({"probe": "stats", "level": lvl, "digits": digits,
                              "barrier_sec": round(time.time() - t0, 2)}), flush=True)
        edges.unpersist()

    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
