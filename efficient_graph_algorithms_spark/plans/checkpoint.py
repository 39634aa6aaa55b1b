"""Per-iteration checkpointing with lineage + convergence metrics.

Every iterative algorithm (PageRank, CC, LPA) writes its state table
each iteration and appends a metrics row, so a killed job resumes from
the latest complete iteration with identical final output (tested).

This plays two roles:
1. **Lineage control** — iterative DataFrames otherwise grow an
   unbounded logical plan; writing to storage (or localCheckpoint in
   memory-only mode) cuts it, keeping per-iteration time flat.
2. **Resumability** — the north rule's "resumable from per-iteration
   checkpoints carrying per-partition lineage and convergence metrics".

Layout (Iceberg-style semantics over plain parquet in the sandbox —
the table layout, snapshot-per-iteration naming, and metrics schema
are identical to what an Iceberg catalog deployment would use):

    <dir>/state/iter=<k>/   parquet snapshot of the state table
    <dir>/metrics.jsonl     one row per completed iteration:
        {iteration, delta, extra..., wall_ms, n_partitions,
         input_files: [per-partition parquet lineage]}
    <dir>/_META.json        algorithm, params, schema
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession


class CheckpointManager:
    def __init__(self, spark: SparkSession, path: str | None, algorithm: str, params: dict[str, Any]):
        self.spark = spark
        self.path = path
        self.algorithm = algorithm
        self.params = params
        if path:
            os.makedirs(path, exist_ok=True)
            meta = os.path.join(path, "_META.json")
            if not os.path.exists(meta):
                with open(meta, "w") as f:
                    json.dump({"algorithm": algorithm, "params": params}, f)
            else:
                # resuming into an existing dir with a different algorithm
                # or params would silently continue from incompatible state
                with open(meta) as f:
                    prev = json.load(f)
                if prev.get("algorithm") != algorithm or prev.get("params") != params:
                    raise ValueError(
                        f"checkpoint dir {path} holds state for "
                        f"{prev.get('algorithm')}{prev.get('params')}, "
                        f"refusing to continue as {algorithm}{params}"
                    )
        self._t0 = time.time()

    # -- write ---------------------------------------------------------
    def write_state(
        self, df: DataFrame, iteration: int, compression: str | None = None
    ) -> DataFrame:
        """Durably persist `iteration`'s state table and return the
        read-back DataFrame — the per-iteration lineage cut (the state
        plan references itself twice per step, so an uncut plan grows
        exponentially). Requires a path. compression: parquet codec —
        pass "none" for tmpfs-backed rolling state (memory-speed medium,
        compression is pure CPU overhead there: measured ~2x faster
        write at 12M rows); durable checkpoints default to snappy."""
        assert self.path is not None
        state_dir = os.path.join(self.path, "state", f"iter={iteration}")
        tmp = state_dir + "._tmp"
        w = df.write.mode("overwrite")
        if compression:
            w = w.option("compression", compression)
        w.parquet(tmp)
        if os.path.exists(state_dir):
            shutil.rmtree(state_dir)
        os.rename(tmp, state_dir)  # atomic publish (Iceberg snapshot analogue)
        return self.spark.read.parquet(state_dir)

    def log_metrics(self, iteration: int, metrics: dict[str, Any]) -> None:
        """Append the per-iteration metrics row (+ per-partition parquet
        lineage when the iteration's state snapshot exists on disk)."""
        wall_ms = (time.time() - self._t0) * 1000.0
        self._t0 = time.time()
        if not self.path:
            return
        row: dict[str, Any] = {"iteration": iteration, **metrics, "wall_ms": round(wall_ms, 3)}
        state_dir = os.path.join(self.path, "state", f"iter={iteration}")
        if os.path.isdir(state_dir):
            lineage = sorted(fn for fn in os.listdir(state_dir) if fn.endswith(".parquet"))
            row["n_partitions"] = len(lineage)
            row["input_files"] = lineage
        with open(os.path.join(self.path, "metrics.jsonl"), "a") as f:
            f.write(json.dumps(row) + "\n")

    def delete_iteration(self, iteration: int) -> None:
        """Drop a superseded state snapshot (ephemeral/rolling mode)."""
        if not self.path:
            return
        state_dir = os.path.join(self.path, "state", f"iter={iteration}")
        if os.path.isdir(state_dir):
            shutil.rmtree(state_dir)

    def save_iteration(self, df: DataFrame, iteration: int, metrics: dict[str, Any]) -> DataFrame:
        """Persist state for `iteration`; return a lineage-cut DataFrame
        (read back from storage when durable, localCheckpoint otherwise)."""
        if self.path:
            out = self.write_state(df, iteration)
            self.log_metrics(iteration, metrics)
            return out
        out = df.localCheckpoint(eager=True)
        return out

    def save_iteration_metrics_only(self, iteration: int, metrics: dict[str, Any]) -> None:
        """Memory-only loops: record the metrics row without a durable
        state snapshot (lineage is cut by the caller's localCheckpoint)."""
        wall_ms = (time.time() - self._t0) * 1000.0
        self._t0 = time.time()
        if self.path:
            row = {"iteration": iteration, **metrics, "wall_ms": round(wall_ms, 3)}
            with open(os.path.join(self.path, "metrics.jsonl"), "a") as f:
                f.write(json.dumps(row) + "\n")

    # -- resume --------------------------------------------------------
    def latest_iteration(self) -> int | None:
        if not self.path:
            return None
        state = os.path.join(self.path, "state")
        if not os.path.isdir(state):
            return None
        iters = [
            int(d.split("=", 1)[1])
            for d in os.listdir(state)
            if d.startswith("iter=") and not d.endswith("._tmp")
        ]
        return max(iters) if iters else None

    def load_iteration(self, iteration: int) -> DataFrame:
        assert self.path is not None
        return self.spark.read.parquet(os.path.join(self.path, "state", f"iter={iteration}"))

    def metrics(self) -> list[dict[str, Any]]:
        if not self.path:
            return []
        p = os.path.join(self.path, "metrics.jsonl")
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return [json.loads(line) for line in f if line.strip()]
