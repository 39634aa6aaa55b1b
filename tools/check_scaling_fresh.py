"""Fail when BENCH/scaling.json was measured against a different
PageRank loop than the working tree's — the round-2 failure mode
(loop rewritten, scaling evidence silently stale), institutionalized
away. Run via `make scaling-fresh`; re-measure with `make scaling`.

The stamp is the git BLOB hash of operators/pagerank.py — plus its hot
dependencies plans/lineage.py (StateCutter drives every iteration's
cut/observe) and session.py (shuffle geometry) — recorded by
tools/bench_scaling.py at measurement time: each changes exactly when
the measured file changes, independent of unrelated commits.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
LOOP = "efficient_graph_algorithms_spark/operators/pagerank.py"
DEPS = (
    "efficient_graph_algorithms_spark/plans/lineage.py",
    "efficient_graph_algorithms_spark/session.py",
)


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
    def blob(path: str) -> str:
        return subprocess.run(
            ["git", "hash-object", path], cwd=REPO, check=True,
            capture_output=True, text=True,
        ).stdout.strip()

    checks = {LOOP: stamped, **rec.get("dep_blobs", {})}
    missing = [d for d in DEPS if d not in checks]
    if missing:
        print(
            f"STALE: scaling.json carries no dep_blobs stamp for {missing} "
            "(pre-dep-stamp measurement) — run `make scaling`",
            file=sys.stderr,
        )
        return 1
    for path, want in checks.items():
        current = blob(path)
        if want != current:
            print(
                f"STALE: {path} changed since scaling was measured "
                f"(stamped {want[:12]}, tree {current[:12]}) — run "
                "`make scaling`",
                file=sys.stderr,
            )
            return 1
    print(
        f"fresh: scaling.json measured on current {LOOP} + "
        f"{len(checks) - 1} deps ({stamped[:12]})"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
