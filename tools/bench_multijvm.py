"""Multi-JVM executor-shaped scaling probe (8 -> 32 cores).

The north rule's 4N criterion is about EXECUTORS — separate JVM
processes on a cluster — while `local[32]` packs 32 task threads into
ONE JVM (one heap, one GC, one shuffle-fetch lock domain, one
scheduler). This probe separates those two effects on the sandbox
host: it runs the SAME PageRank job (same input graph, same
partitioning, same code path as tools/bench_scaling.py)

  phase A:  1 JVM  x local[8]            (N  = 8 cores, "1 executor")
  phase B:  4 JVMs x local[8] CONCURRENT (4N = 32 cores, "4 executors")

and reports

  eff_multijvm = (sum of per-JVM edges/s/iter in phase B) / (4 * phase A)

If eff_multijvm clears the bar that single-JVM local[8]->local[32]
misses (BENCH/scaling_8_32.json: 0.47-0.54), the host sustains
4N-core throughput when the work is executor-shaped, and the
single-JVM local[32] softness is a JVM artifact, not an engine-plan
defect. Each phase-B JVM runs the full job independently (weak
scaling / throughput form of the criterion); the strong-scaling form
is covered by BENCH/scaling.json (2 -> 8 cores, same-job speedup).

Protocol strength (round 5): repeats >=3 with median-of-reps headline,
per-phase /proc/stat steal telemetry recorded alongside every rep (the
host has documented 20-40% steal bursts; a rep whose concurrent window
shows high steal is weather, not signal), and the same measurement-time
blob stamps as BENCH/scaling.json (loop + hot deps) so
tools/check_scaling_fresh.py can gate this record identically.

Usage: python tools/bench_multijvm.py --graph /tmp/ega_bench/scaling_large \
           [--cpus-per-jvm 8] [--jvms 4] [--repeats 3] [--min-edges 90000000]
"""

from __future__ import annotations

import argparse
import json
import statistics
import subprocess
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from bench_scaling import RUNNER, REPO, _git  # noqa: E402


class _StealSampler:
    """Samples /proc/stat steal% every 0.5 s in a daemon thread
    (same implementation as bench.py's sampler)."""

    def __init__(self, interval: float = 0.5) -> None:
        self.samples: list[tuple[float, float]] = []
        self._stop = threading.Event()
        self._interval = interval
        self._thread = threading.Thread(target=self._run, daemon=True)

    @staticmethod
    def _read() -> tuple[int, int]:
        with open("/proc/stat") as f:
            vals = list(map(int, f.readline().split()[1:9]))
        return sum(vals), vals[7]

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

    def window(self, t0: float, t1: float) -> dict | None:
        xs = [p for t, p in self.samples if t0 <= t <= t1]
        if not xs:
            return None
        return {"mean": round(sum(xs) / len(xs), 1), "max": round(max(xs), 1)}


def _spawn(cpus: int, graph: str, local_dir: str | None = None) -> subprocess.Popen:
    import os

    env = dict(os.environ)
    if local_dir:
        # per-JVM tmpfs shuffle scratch (r5 verdict #2): the record vs
        # replication gap was measured to be the shared virtio write
        # ceiling (BENCH/diskprobe.json) — give each concurrent JVM its
        # own spark.local.dir on tmpfs so the probe measures CPU/memory
        # scaling, not a host disk real executor nodes don't share
        os.makedirs(local_dir, exist_ok=True)
        env["SPARK_GRAFT_LOCAL_DIR"] = local_dir
    return subprocess.Popen(
        [sys.executable, "-c", RUNNER.format(repo=str(REPO)), str(cpus), graph],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        env=env,
    )


def _collect(proc: subprocess.Popen) -> dict:
    out, _ = proc.communicate()
    if proc.returncode != 0:
        raise RuntimeError(f"runner exited {proc.returncode}")
    line = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--graph", required=True)
    ap.add_argument("--cpus-per-jvm", type=int, default=8)
    ap.add_argument("--jvms", type=int, default=4)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--min-edges", type=int, default=0)
    ap.add_argument(
        "--local-dir-base",
        default=None,
        help="base dir for per-JVM spark.local.dir scratch (e.g. /dev/shm): "
        "each JVM gets <base>/ega_ld_<i>, removed after its rep. Unset = "
        "Spark default (the r5 shared-disk protocol).",
    )
    args = ap.parse_args()

    if args.min_edges:
        import pyarrow.parquet as pq

        n_in = sum(
            pq.ParquetFile(p).metadata.num_rows
            for p in Path(args.graph, "edges").glob("*.parquet")
        )
        if n_in < args.min_edges:
            print(
                f"REFUSING: {args.graph}/edges has {n_in:,} rows < "
                f"--min-edges {args.min_edges:,}",
                file=sys.stderr,
            )
            return 1

    import shutil

    def _ld(i: int) -> str | None:
        if not args.local_dir_base:
            return None
        return f"{args.local_dir_base}/ega_ld_{i}"

    steal = _StealSampler().start()
    reps = []
    for rep in range(args.repeats):
        t0 = time.time()
        single = _collect(_spawn(args.cpus_per_jvm, args.graph, _ld(0)))
        t1 = time.time()
        print(f"rep {rep} single-jvm: {single}", file=sys.stderr, flush=True)
        procs = [
            _spawn(args.cpus_per_jvm, args.graph, _ld(i)) for i in range(args.jvms)
        ]
        multi = [_collect(p) for p in procs]
        t2 = time.time()
        if args.local_dir_base:
            for i in range(args.jvms):
                shutil.rmtree(_ld(i), ignore_errors=True)
        for i, m in enumerate(multi):
            print(f"rep {rep} concurrent jvm {i}: {m}", file=sys.stderr, flush=True)
        agg = sum(m["edges_per_sec_per_iter"] for m in multi)
        eff = agg / (args.jvms * single["edges_per_sec_per_iter"])
        reps.append(
            {
                "single_eps": single["edges_per_sec_per_iter"],
                "concurrent_eps": [m["edges_per_sec_per_iter"] for m in multi],
                "aggregate_eps": round(agg, 1),
                "efficiency": round(eff, 3),
                "steal_single": steal.window(t0, t1),
                "steal_concurrent": steal.window(t1, t2),
                "single": single,
                "concurrent": multi,
            }
        )
        print(
            f"rep {rep}: single {single['edges_per_sec_per_iter']:,.0f} eps, "
            f"aggregate x{args.jvms} {agg:,.0f} eps, eff {eff:.3f}",
            file=sys.stderr,
            flush=True,
        )

    summary = {
        "loop_commit": _git(["rev-parse", "--short", "HEAD"]),
        "loop_blob": _git(
            ["hash-object", "efficient_graph_algorithms_spark/operators/pagerank.py"]
        ),
        # same hot-dep stamps as bench_scaling.py so check_scaling_fresh
        # can gate this record with the identical mechanism
        "dep_blobs": {
            "efficient_graph_algorithms_spark/plans/lineage.py": _git(
                ["hash-object", "efficient_graph_algorithms_spark/plans/lineage.py"]
            ),
            "efficient_graph_algorithms_spark/session.py": _git(
                ["hash-object", "efficient_graph_algorithms_spark/session.py"]
            ),
        },
        "graph": args.graph,
        "local_dir_base": args.local_dir_base,
        "n_edges": reps[0]["single"]["n_edges"],
        "cpus_per_jvm": args.cpus_per_jvm,
        "jvms": args.jvms,
        "repeats": args.repeats,
        "single_eps_median": statistics.median(r["single_eps"] for r in reps),
        "aggregate_eps_median": statistics.median(r["aggregate_eps"] for r in reps),
        "efficiency_median": round(
            statistics.median(r["efficiency"] for r in reps), 3
        ),
        "reps": reps,
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
