"""Fail when a scaling record (BENCH/scaling.json — the 2→8 strong-
scaling pair — or BENCH/multijvm.json — the executor-shaped N→4N pair)
was measured against a different PageRank loop than the working
tree's — the round-2 failure mode (loop rewritten, scaling evidence
silently stale), institutionalized away. Run via `make scaling-fresh`;
re-measure with `make scaling` / `make multijvm`.

The stamp is the git BLOB hash of operators/pagerank.py — plus its hot
dependencies plans/lineage.py (StateCutter drives every iteration's
cut/observe) and session.py (shuffle geometry) — recorded by
tools/bench_scaling.py / tools/bench_multijvm.py at measurement time:
each changes exactly when the measured file changes, independent of
unrelated commits.

A record carrying a `dep_blobs_note` retro-stamp marker (dep hashes
added after measurement rather than recorded by the tool) is flagged
loudly — the r4-advice fix — so a hand-edited record can never read as
indistinguishable from a tool-authored one.
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
RECORDS = ("scaling.json", "multijvm.json")


def _blob(path: str) -> str:
    return subprocess.run(
        ["git", "hash-object", path], cwd=REPO, check=True,
        capture_output=True, text=True,
    ).stdout.strip()


def check_record(name: str) -> tuple[int, int]:
    """Returns (failures, warnings) for one record file."""
    path = REPO / "BENCH" / name
    remeasure = "make scaling" if name == "scaling.json" else "make multijvm"
    if not path.exists():
        print(f"STALE: {path} missing — run `{remeasure}`", file=sys.stderr)
        return 1, 0
    try:
        rec = json.loads(path.read_text())
    except json.JSONDecodeError:
        print(
            f"STALE: BENCH/{name} is empty or truncated (an aborted "
            f"`{remeasure}` run?) — run `{remeasure}`",
            file=sys.stderr,
        )
        return 1, 0
    stamped = rec.get("loop_blob")
    if stamped is None:
        print(
            f"STALE: BENCH/{name} carries no loop_blob stamp "
            f"(pre-stamp measurement) — run `{remeasure}`",
            file=sys.stderr,
        )
        return 1, 0
    checks = {LOOP: stamped, **rec.get("dep_blobs", {})}
    missing = [d for d in DEPS if d not in checks]
    if missing:
        print(
            f"STALE: {name} carries no dep_blobs stamp for {missing} "
            f"(pre-dep-stamp measurement) — run `{remeasure}`",
            file=sys.stderr,
        )
        return 1, 0
    for fpath, want in checks.items():
        current = _blob(fpath)
        if want != current:
            print(
                f"STALE: {fpath} changed since {name} was measured "
                f"(stamped {want[:12]}, tree {current[:12]}) — run "
                f"`{remeasure}`",
                file=sys.stderr,
            )
            return 1, 0
    warnings = 0
    if "dep_blobs_note" in rec:
        warnings = 1
        print(
            f"WARNING: BENCH/{name} dep_blobs were RETRO-STAMPED, not "
            f"recorded at measurement time ({rec['dep_blobs_note']!r}) — "
            f"the blobs match the tree, but re-run `{remeasure}` to get a "
            "tool-authored record",
            file=sys.stderr,
        )
    print(
        f"fresh: {name} measured on current {LOOP} + "
        f"{len(checks) - 1} deps ({stamped[:12]})"
    )
    return 0, warnings


def main() -> int:
    failures = warnings = 0
    for name in RECORDS:
        f, w = check_record(name)
        failures += f
        warnings += w
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
