"""STREAM-style memory-bandwidth probe: evidence for the scaling-pair choice.

BASELINE.md's scaling criterion is evidenced at 2→8 cores rather than
8→32 because this single-socket host saturates shared DRAM bandwidth
well below 32 concurrent memory-bound workers — a claim the r3 verdict
asked to be MEASURED, not argued. This probe measures it directly:

Each worker runs the STREAM triad a[:] = b + s*c over arrays far larger
than LLC (default 64 MiB/array x 3 arrays/worker) in its own process
(true parallelism, no GIL). Aggregate bandwidth = sum over workers of
bytes_moved/worker_wall, taking the best of R rounds (bandwidth probes
report peak, interference makes it only lower). Triad moves 3 arrays
per pass: 2 reads + 1 write -> 24 bytes/element/pass.

If aggregate GB/s at 32 workers ~= aggregate at 8 workers (per-worker
bandwidth collapses ~4x), the DRAM ceiling is real: a memory-bound job
CANNOT scale 8->32 on this box regardless of its parallel structure,
and per-core efficiency must be judged below the saturation knee.

Usage: python tools/bench_membw.py [--workers 1 2 8 32] [--mib 64]
Prints one JSON line; bench_scaling's make target records it next to
scaling.json.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import sys
import time


def _triad_worker(mib: int, passes: int, q) -> None:
    import numpy as np

    n = mib * 1024 * 1024 // 8
    a = np.zeros(n)
    b = np.random.default_rng(0).random(n)
    c = np.random.default_rng(1).random(n)
    # warm: touch every page so the timed region has no faults
    a[:] = b + 2.0 * c
    t0 = time.perf_counter()
    for _ in range(passes):
        a[:] = b + 2.0 * c
    dt = time.perf_counter() - t0
    q.put((passes * 3 * n * 8, dt))


def measure(workers: int, mib: int, passes: int, rounds: int) -> dict:
    best = 0.0
    per_round = []
    for _ in range(rounds):
        q: mp.Queue = mp.Queue()
        procs = [
            mp.Process(target=_triad_worker, args=(mib, passes, q))
            for _ in range(workers)
        ]
        for p in procs:
            p.start()
        # timeout so a dead worker (e.g. OOM-killed) fails the probe
        # loudly instead of hanging `make scaling` forever
        results = [q.get(timeout=600) for _ in procs]
        for p in procs:
            p.join()
        # aggregate = sum of each worker's own rate (they overlap ~fully;
        # using the max wall instead would under-report by straggler skew)
        gbps = sum(nbytes / dt for nbytes, dt in results) / 1e9
        per_round.append(round(gbps, 2))
        best = max(best, gbps)
    return {
        "workers": workers,
        "agg_gbps": round(best, 2),
        "per_worker_gbps": round(best / workers, 2),
        "rounds_gbps": per_round,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", type=int, nargs="+", default=[1, 2, 8, 32])
    ap.add_argument("--mib", type=int, default=64, help="MiB per array (3 arrays/worker)")
    ap.add_argument("--passes", type=int, default=20)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    out = {"triad_mib_per_array": args.mib, "passes": args.passes, "configs": []}
    for w in args.workers:
        r = measure(w, args.mib, args.passes, args.rounds)
        print(f"workers={w}: {r['agg_gbps']} GB/s aggregate "
              f"({r['per_worker_gbps']}/worker)", file=sys.stderr, flush=True)
        out["configs"].append(r)

    by_w = {c["workers"]: c["agg_gbps"] for c in out["configs"]}
    if 8 in by_w and 32 in by_w:
        out["gain_8_to_32"] = round(by_w[32] / by_w[8], 3)
    if 2 in by_w and 8 in by_w:
        out["gain_2_to_8"] = round(by_w[8] / by_w[2], 3)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
