"""Two-parallelism-level scaling protocol (BASELINE.md):

Same job, same input: PageRank to L1 < 1e-6 on a prebuilt web graph,
run at local[8] (N) and local[32] (4N). Reports edges/sec/iteration at
both and the per-core-normalized scaling efficiency

    eff = (eps_32 / 32) / (eps_8 / 8)

Each configuration runs in a FRESH JVM (subprocess) so executor-thread
pools, GC state, and code caches don't leak across configs. Repeats ×R
(default 3), median. Results → BENCH/BASELINE.md.

Usage: python tools/bench_scaling.py [--pages 1000000] [--repeats 3]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _git(args: list[str]) -> str | None:
    try:
        return subprocess.run(
            ["git", *args], cwd=REPO, check=True, capture_output=True, text=True
        ).stdout.strip()
    except Exception:
        return None

RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from efficient_graph_algorithms_spark.session import get_spark
from efficient_graph_algorithms_spark.operators.pagerank import pagerank

cpus = int(sys.argv[1]); graph = sys.argv[2]
spark = get_spark(f"scaling-{{cpus}}", master=f"local[{{cpus}}]",
                  shuffle_partitions=128)  # SAME job both configs: fixed partitioning
spark.sparkContext.setLogLevel("ERROR")
edges = spark.read.parquet(f"{{graph}}/edges").persist()
n_edges = edges.count()
verts = spark.read.parquet(f"{{graph}}/url_dict").select("id").persist()
verts.count()
t0 = time.time()
ranks, info = pagerank(spark, edges, vertices=verts, tol=1e-6)
ranks.count()
sec = time.time() - t0
loop = info["loop_sec"]  # iteration throughput excludes one-time setup
import statistics
its = info["iter_secs"]
# steady-state per-iteration time: median after the 2-iteration JIT/
# codegen warmup (all iterations process identical data volumes)
steady = statistics.median(its[2:]) if len(its) > 4 else statistics.median(its)
print(json.dumps({{
    "cpus": cpus, "n_edges": n_edges, "iterations": info["iterations"],
    "converged": info["converged"], "wall_sec": round(sec, 2),
    "setup_sec": info["setup_sec"], "loop_sec": loop,
    "sec_per_iter_steady": round(steady, 3),
    "edges_per_sec_per_iter": round(n_edges / steady, 1),
    "sec_per_iter_mean": round(loop / info["iterations"], 3),
    "iter_secs": its,
}}))
spark.stop()
"""


def build_graph(pages: int) -> str:
    """Build (once) the shared input graph with a fixed-parallelism JVM so
    both configs read identical bytes."""
    work = os.environ.get("BENCH_WORK", "/tmp/ega_bench")
    graph = f"{work}/scaling_graph_{pages}"
    if os.path.exists(f"{graph}/edges"):
        return graph
    script = f"""
import sys
sys.path.insert(0, {str(REPO)!r})
from efficient_graph_algorithms_spark.session import get_spark
from efficient_graph_algorithms_spark.sources.pages import pages_df
from efficient_graph_algorithms_spark.sources.edges import build_edges
spark = get_spark("scaling-build", master="local[32]", shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
pages_df(spark, {pages}, seed=42).write.mode("overwrite").parquet("{graph}/pages")
pages = spark.read.parquet("{graph}/pages")
url_dict, edges = build_edges(pages, id_partitions=64)
edges.write.mode("overwrite").parquet("{graph}/edges")
url_dict.write.mode("overwrite").parquet("{graph}/url_dict")
spark.stop()
"""
    subprocess.run([sys.executable, "-c", script], check=True)
    return graph


def run_config(cpus: int, graph: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", RUNNER.format(repo=str(REPO)), str(cpus), graph],
        capture_output=True,
        text=True,
    )
    if out.returncode != 0:
        # surface the child's tail so a failed leg is diagnosable from the log
        tail = "\n".join(out.stderr.splitlines()[-25:])
        raise RuntimeError(
            f"runner cpus={cpus} exited {out.returncode}; stderr tail:\n{tail}"
        )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=1_000_000)
    ap.add_argument("--graph", help="prebuilt graph dir (skips the pages build)")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--cpus", type=int, nargs=2, default=[8, 32])
    ap.add_argument(
        "--min-edges",
        type=int,
        default=0,
        help="fail fast (before any timed rep) if the input graph has fewer "
        "edges — guards the protocol against silently measuring a smaller "
        "graph than BASELINE.md prescribes",
    )
    args = ap.parse_args()

    graph = args.graph or build_graph(args.pages)
    if args.min_edges:
        import pyarrow.parquet as pq

        n_in = sum(
            pq.ParquetFile(p).metadata.num_rows
            for p in Path(graph, "edges").glob("*.parquet")
        )
        if n_in < args.min_edges:
            print(
                f"REFUSING: {graph}/edges has {n_in:,} rows < --min-edges "
                f"{args.min_edges:,} — wrong input for the scaling protocol",
                file=sys.stderr,
            )
            return 1
    results: dict[int, list[dict]] = {}
    for rep in range(args.repeats):
        for cpus in args.cpus:
            r = run_config(cpus, graph)
            results.setdefault(cpus, []).append(r)
            print(f"rep {rep} cpus={cpus}: {r}", file=sys.stderr, flush=True)

    lo, hi = args.cpus
    med = {
        c: statistics.median(r["edges_per_sec_per_iter"] for r in results[c])
        for c in args.cpus
    }
    eff = (med[hi] / hi) / (med[lo] / lo)
    summary = {
        "loop_commit": _git(["rev-parse", "--short", "HEAD"]),
        # blob hash of the measured loop: `make scaling-fresh` fails when
        # this no longer matches the working tree, so a loop change can
        # never ship with stale scaling data (round-2 failure mode)
        "loop_blob": _git(
            ["hash-object", "efficient_graph_algorithms_spark/operators/pagerank.py"]
        ),
        # the loop's hot dependencies: StateCutter drives every
        # iteration's cut/observe and the session config sets the shuffle
        # geometry — a change to either invalidates the measurement too
        "dep_blobs": {
            "efficient_graph_algorithms_spark/plans/lineage.py": _git(
                ["hash-object", "efficient_graph_algorithms_spark/plans/lineage.py"]
            ),
            "efficient_graph_algorithms_spark/session.py": _git(
                ["hash-object", "efficient_graph_algorithms_spark/session.py"]
            ),
        },
        "graph": graph,
        "pages": args.pages,
        "n_edges": results[lo][0]["n_edges"],
        "iterations": results[lo][0]["iterations"],
        "repeats": args.repeats,
        f"edges_per_sec_per_iter_local{lo}": med[lo],
        f"edges_per_sec_per_iter_local{hi}": med[hi],
        "speedup": round(med[hi] / med[lo], 3),
        "scaling_efficiency": round(eff, 3),
        "runs": {str(c): results[c] for c in args.cpus},
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
