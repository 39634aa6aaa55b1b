"""Fail when BENCH/scaling.json was measured against a different
PageRank loop than the working tree's — the round-2 failure mode
(loop rewritten, scaling evidence silently stale), institutionalized
away. Run via `make scaling-fresh`; re-measure with `make scaling`.

The stamp is the git BLOB hash of operators/pagerank.py recorded by
tools/bench_scaling.py at measurement time: it changes exactly when
the measured loop file changes, independent of unrelated commits.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
LOOP = "efficient_graph_algorithms_spark/operators/pagerank.py"


def main() -> int:
    path = REPO / "BENCH" / "scaling.json"
    if not path.exists():
        print(f"STALE: {path} missing — run `make scaling`", file=sys.stderr)
        return 1
    try:
        rec = json.loads(path.read_text())
    except json.JSONDecodeError:
        print(
            "STALE: BENCH/scaling.json is empty or truncated (an aborted "
            "`make scaling` run?) — run `make scaling`",
            file=sys.stderr,
        )
        return 1
    stamped = rec.get("loop_blob")
    if stamped is None:
        print(
            "STALE: BENCH/scaling.json carries no loop_blob stamp "
            "(pre-stamp measurement) — run `make scaling`",
            file=sys.stderr,
        )
        return 1
    current = subprocess.run(
        ["git", "hash-object", LOOP], cwd=REPO, check=True,
        capture_output=True, text=True,
    ).stdout.strip()
    if stamped != current:
        print(
            f"STALE: {LOOP} changed since scaling was measured "
            f"(stamped {stamped[:12]}, tree {current[:12]}) — run `make scaling`",
            file=sys.stderr,
        )
        return 1
    print(f"fresh: scaling.json measured on current {LOOP} ({current[:12]})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
