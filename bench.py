"""Benchmark runner — prints ONE JSON line.

Headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS]:

  q_extract    pages → edges build (JVM regexp href extraction) on a
               synthesized corpus sized to the sf (north-rule edge build)
  q_pagerank   full PageRank to L1 < 1e-6 on the extracted web graph
  q_cc         connected components on the same graph
  q_triangles  degree-ordered wedge-join triangle count
  q_lpa        5 rounds of synchronous LPA
  q_dedup      MinHash-LSH near-dup pairs over documents
  q_topk_sim   brute-force cosine top-k over embeddings
  q_knn_lsh    symmetrized k-NN graph via multi-table RP-LSH (scale path)
  q_tree_gfi   exp-kernel 2-pass tree matvec on a |V|-node heap tree

The headline metric is PageRank edges/sec/iteration (BASELINE.md).

Noise protocol (since r4): every query is run BENCH_REPS times (default 3)
and the reported number is the per-query MEDIAN; the individual rep times
are published in meta["rep_secs"] so nothing is hidden. Rationale: the
host shows documented CPU-steal bursts (BENCH/BASELINE.md — identical
runs swing >20% within an hour), so single-shot per-query times made
round-over-round deltas unreadable. The first rep also absorbs one-time
JVM/JIT warm-up (measured: the regexp scan's first execution is ~3-5×
its steady-state cost purely from C2 compilation), which is amortized
noise at 100 TB, not per-query cost.

Additionally every run samples /proc/stat steal% in the background and
reports per-query mean/max in meta["steal_pct"] — a sustained burst can
cover all 3 reps (observed: back-to-back runs where q_cc, untouched for
3 rounds, swung 7.5 s → 24.7 s), and the recorded steal makes such a
number readable as contamination rather than regression.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

from efficient_graph_algorithms_spark.session import get_spark  # noqa: E402


def _log(msg: str) -> None:
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


class _StealSampler:
    """Samples /proc/stat steal% every 0.5 s in a daemon thread."""

    def __init__(self, interval: float = 0.5) -> None:
        self.samples: list[tuple[float, float]] = []  # (time, steal%)
        self._stop = threading.Event()
        self._interval = interval
        self._thread = threading.Thread(target=self._run, daemon=True)

    @staticmethod
    def _read() -> tuple[int, int]:
        with open("/proc/stat") as f:
            vals = list(map(int, f.readline().split()[1:9]))
        return sum(vals), vals[7]  # total jiffies, steal jiffies

    def _run(self) -> None:
        tot0, st0 = self._read()
        while not self._stop.wait(self._interval):
            tot1, st1 = self._read()
            if tot1 > tot0:
                self.samples.append(
                    (time.time(), 100.0 * (st1 - st0) / (tot1 - tot0))
                )
            tot0, st0 = tot1, st1

    def start(self) -> "_StealSampler":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()

    def window(self, t0: float, t1: float) -> dict | None:
        xs = [p for t, p in self.samples if t0 <= t <= t1]
        if not xs:
            return None
        return {"mean": round(sum(xs) / len(xs), 1), "max": round(max(xs), 1)}

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# pages corpus sized to sf: sf0.1 → 120k pages (~1M edges)
N_PAGES = int(os.environ.get("BENCH_PAGES", "120000"))
WORK = os.environ.get("BENCH_WORK", "/tmp/ega_bench")
REPS = int(os.environ.get("BENCH_REPS", "3"))
if REPS < 1:
    raise SystemExit(f"BENCH_REPS must be >= 1, got {REPS}")


def main() -> int:
    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])
    spark = get_spark("ega-bench", master=f"local[{CPUS}]", shuffle_partitions=max(CPUS, 32))
    spark.sparkContext.setLogLevel("ERROR")
    queries: dict[str, float] = {}
    meta: dict[str, object] = {}
    rep_secs: dict[str, list[float]] = {}
    meta["rep_secs"] = rep_secs
    meta["reps"] = REPS
    steal = _StealSampler().start()
    steal_pct: dict[str, object] = {}
    meta["steal_pct"] = steal_pct
    t_bench0 = time.time()

    def timed(name: str, fn) -> object:
        """Run fn REPS times; record median in queries[name], all rep
        times in meta. Returns the last rep's return value."""
        out = None
        secs: list[float] = []
        t_q0 = time.time()
        for _ in range(REPS):
            t0 = time.time()
            out = fn()
            secs.append(round(time.time() - t0, 3))
        w = steal.window(t_q0, time.time())
        if w is not None:
            steal_pct[name] = w
        rep_secs[name] = secs
        queries[name] = round(statistics.median(secs), 3)
        _log(f"{name} done median={queries[name]}s reps={secs} steal={w}")
        return out

    # -- corpus build (timed as q_extract) ---------------------------------
    pages_path = f"{WORK}/pages_{N_PAGES}"
    graph_path = f"{WORK}/graph_{N_PAGES}"
    from efficient_graph_algorithms_spark.sources.pages import pages_df

    if not os.path.exists(pages_path):
        pages_df(spark, N_PAGES, seed=42).write.mode("overwrite").parquet(pages_path)

    from efficient_graph_algorithms_spark.sources.edges import build_edges

    def run_extract():
        pages = spark.read.parquet(pages_path)
        url_dict, edges = build_edges(pages)
        edges.write.mode("overwrite").parquet(f"{graph_path}/edges")
        url_dict.write.mode("overwrite").parquet(f"{graph_path}/url_dict")
        # build_edges persists internals (pairs/url_dict/parted); drop
        # them so 3 reps don't pin 9 copies of the corpus in executor
        # memory while the later timed queries run (nothing else is
        # cached yet at this point in the bench)
        spark.catalog.clearCache()

    timed("q_extract", run_extract)

    edges = spark.read.parquet(f"{graph_path}/edges").persist()
    n_edges = edges.count()
    vertices = spark.read.parquet(f"{graph_path}/url_dict").select("id").persist()
    n_vertices = vertices.count()
    meta["n_pages"] = N_PAGES
    meta["n_edges"] = n_edges
    meta["n_vertices"] = n_vertices

    # -- PageRank (headline) ------------------------------------------------
    from efficient_graph_algorithms_spark.operators.pagerank import pagerank

    pr_infos: list[dict] = []

    def run_pagerank():
        ranks, info = pagerank(spark, edges, vertices=vertices, tol=1e-6)
        ranks.count()
        pr_infos.append(info)
        return info

    info = timed("q_pagerank", run_pagerank)
    iters = info["iterations"]
    # per-rep throughput, THEN median: pairing the last rep's iteration
    # count with the median rep's wall time would mix data from different
    # reps if a near-tol delta flips the convergence iteration between them
    per_rep_eps = [
        n_edges * i["iterations"] / s
        for i, s in zip(pr_infos, rep_secs["q_pagerank"])
    ]
    edges_per_sec_per_iter = statistics.median(per_rep_eps)
    meta["pagerank_iterations"] = iters
    meta["pagerank_converged"] = info["converged"]
    # auxiliary (headline definition unchanged since r1: wall incl. setup):
    # steady-state per-iteration throughput, robust to host CPU-steal bursts
    # — median over ALL reps' post-warmup iteration times
    all_iter_secs = [s for i in pr_infos for s in (i.get("iter_secs") or [])[2:]]
    if all_iter_secs:
        steady = statistics.median(all_iter_secs)
        meta["pagerank_steady_eps"] = round(n_edges / steady, 1)
        meta["pagerank_setup_sec"] = info.get("setup_sec")

    # -- Connected components -----------------------------------------------
    from efficient_graph_algorithms_spark.operators.components import connected_components

    def run_cc():
        labels, cinfo = connected_components(spark, edges, vertices=vertices)
        labels.count()
        return cinfo

    meta["cc_rounds"] = timed("q_cc", run_cc)["rounds"]

    # -- Triangles ------------------------------------------------------------
    from efficient_graph_algorithms_spark.operators.triangles import triangle_count

    tri = timed("q_triangles", lambda: triangle_count(edges).first()["triangles"])
    meta["triangles"] = int(tri)

    # -- LPA (bounded rounds) ---------------------------------------------------
    from efficient_graph_algorithms_spark.operators.lpa import label_propagation

    def run_lpa():
        lab, _ = label_propagation(spark, edges, vertices=vertices, max_iter=5)
        lab.count()

    timed("q_lpa", run_lpa)

    # -- k-core peel (web-graph quality filter) -------------------------------
    from efficient_graph_algorithms_spark.operators.kcore import k_core

    kcore_infos: list[dict] = []

    def run_kcore():
        core, kinfo = k_core(spark, edges, k=3)
        kinfo["core_vertices"] = core.count()
        kcore_infos.append(kinfo)
        return kinfo

    kinfo = timed("q_kcore", run_kcore)
    meta["kcore_rounds"] = kinfo["rounds"]
    meta["kcore_vertices"] = kinfo["core_vertices"]

    # -- documents dedup + embeddings topk ----------------------------------------
    from efficient_graph_algorithms_spark.operators.dedup import minhash_lsh_pairs
    from efficient_graph_algorithms_spark.operators.similarity import cosine_topk

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    meta["dedup_pairs"] = timed(
        "q_dedup", lambda: minhash_lsh_pairs(docs, threshold=0.5).count()
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 16).select(F.col("vec_id").alias("qid"), "embedding")
    meta["topk_rows"] = timed("q_topk_sim", lambda: cosine_topk(emb, q, k=10).count())

    # -- k-NN graph via multi-table RP-LSH (the similarity scale path) --------
    from efficient_graph_algorithms_spark.operators.ann import knn_graph

    meta["knn_edges"] = timed(
        "q_knn_lsh",
        lambda: knn_graph(emb, k=5, method="lsh", n_tables=4, n_planes=8, dim=64).count(),
    )

    # -- exp-kernel tree matvec at |V| scale (tree-GFI family) ----------------
    # binary-heap tree over the graph's vertex count: deterministic
    # depth = floor(log2 n), so the level-synchronous 2-pass DP cost is
    # predictable (MST construction itself is covered by tests)
    import math as _math

    from efficient_graph_algorithms_spark.operators.trees import tree_gfi_matvec

    n_tree = n_vertices
    tree_depth = int(_math.floor(_math.log2(max(n_tree, 2))))
    heap_tree = spark.range(1, n_tree).select(
        "id",
        ((F.col("id") - 1) / 2).cast("long").alias("parent"),
        ((1 + F.col("id") % 5) / F.lit(4.0)).alias("w"),
        F.floor(F.log2(F.col("id") + 1)).cast("int").alias("depth"),
    )
    fld = spark.range(n_tree).select("id", (F.col("id") % 97 / 97.0).alias("value"))
    meta["tree_gfi_rows"] = timed(
        "q_tree_gfi", lambda: tree_gfi_matvec(heap_tree, fld, a=-0.5, root=0).count()
    )
    meta["tree_depth"] = tree_depth

    w_all = steal.window(t_bench0, time.time())
    if w_all is not None:
        steal_pct["overall"] = w_all
    steal.stop()
    total = round(sum(queries.values()), 3)
    print(
        json.dumps(
            {
                "metric": "pagerank_edges_per_sec_per_iteration",
                "value": round(edges_per_sec_per_iter, 1),
                "unit": "edges/sec",
                "queries": queries,
                "total_sec": total,
                "sf": sf,
                "cpus": CPUS,
                **meta,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
