"""State cut: the lineage barrier for iterative DataFrame loops.

Why ``localCheckpoint`` is NOT enough (Spark 4.x): ``Dataset.checkpoint``
routes through ``LogicalRDD.fromDataset`` → ``rewriteStatsAndConstraints``,
which copies the ESTIMATED statistics of the checkpointed plan onto the
resulting ``LogicalRDD``.  Catalyst's size-only estimator multiplies
children's ``sizeInBytes`` at every inner/outer join, so a loop whose
iteration joins the previous state with something derived from itself
(pointer-jumping self-joins, gather + update two-reference patterns)
DOUBLES the carried BigInt's digit count per iteration — and the
checkpoint faithfully preserves it.  Measured on the Borůvka component
fixpoint (tiny 50-vertex input, local[4]): sizeInBytes goes
19 → 3.5k digits within one round, 2.7M digits by round two, after
which every stats visit runs million-digit Karatsuba/Toom-Cook
multiplications on the driver and a sub-second job takes minutes.
This is driver-side Catalyst work, so a 1000-executor cluster melts
exactly the same way.

The fix is a REAL state table: write the iteration's state to parquet
(tmpfs by default — memory-speed medium) and read it back.  That is

- a true lineage cut (the read-back plan is a file scan),
- a stats reset (leaf stats = actual file size — small and REAL),
- deterministic memory hygiene (superseded state is deleted explicitly;
  nothing accumulates in the block manager, unlike localCheckpoint
  blocks which wait for GC + ContextCleaner),
- and the same medium the engine's resumable checkpoints already use
  (plans/checkpoint.py) — on a cluster this directory is an Iceberg
  state table.

Cost: one uncompressed tmpfs parquet write+read per cut — measured
0.3-0.7 s at test scale, i.e. the same order as an eager
localCheckpoint, and unlike it, flat over arbitrarily many iterations.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame


def _scratch_dir(tag: str) -> str:
    base = os.environ.get("SPARK_GRAFT_STATE_DIR")
    if base is None:
        base = "/dev/shm" if os.access("/dev/shm", os.W_OK) else tempfile.gettempdir()
    return tempfile.mkdtemp(prefix=f"ega_{tag}_", dir=base)


class StateCutter:
    """Parquet-round-trip lineage cuts for one iterative loop.

    Usage::

        with StateCutter(spark, "cc") as cut:
            state = ...
            for it in ...:
                state = cut(update(state))   # barrier per iteration

    Each ``cut`` writes to a fresh subdirectory.  Generations are kept
    until ``close``/``__exit__`` (loops often interleave several state
    streams — transport + scaling vector, labels + forest — so rotating
    early would delete files a live reader still needs; pass ``keep`` to
    rotate anyway when the loop streams exactly one state).
    """

    def __init__(self, spark, tag: str = "cut", keep: int | None = None):
        self.spark = spark
        self.dir = _scratch_dir(tag)
        self.keep = keep
        self._n = 0

    def __call__(self, df: DataFrame) -> DataFrame:
        self._n += 1
        path = os.path.join(self.dir, f"cut={self._n}")
        df.write.mode("overwrite").option("compression", "none").parquet(path)
        out = self.spark.read.parquet(path)
        if self.keep is not None:
            prev = os.path.join(self.dir, f"cut={self._n - self.keep}")
            if os.path.exists(prev):
                shutil.rmtree(prev, ignore_errors=True)
        return out

    def observe(self, df: DataFrame, **exprs) -> tuple[DataFrame, dict]:
        """Cut ``df`` and ride scalar aggregates on the SAME write job.

        ``exprs`` maps name → aggregate Column; the values are collected
        as CollectMetrics partials during the parquet write (one job for
        write + metrics, instead of write + a second full-scan aggregate
        job — the pagerank observe() pattern, pagerank.py:384-396).
        Columns named ``_obs_*`` are treated as observation-only scratch
        and dropped before the write, so a caller can join in the
        previous generation for a convergence delta without persisting
        it into the new state table. Returns (cut_df, {name: value}).
        """
        import uuid

        from pyspark.sql.observation import Observation

        # name must be unique across the SparkSession, not just this
        # cutter: the Observation listener matches by name against ANY
        # terminated query, so two loops sharing a session (e.g. a
        # sinkhorn and a barycenter in parallel threads) with plain
        # "cut_<n>" names could cross-capture each other's metrics
        obs = Observation(f"cut_{uuid.uuid4().hex[:12]}_{self._n + 1}")
        observed = df.observe(obs, *[e.alias(k) for k, e in exprs.items()])
        scratch = [c for c in df.columns if c.startswith("_obs_")]
        if scratch:
            observed = observed.drop(*scratch)
        out = self(observed)  # the write is the action driving obs.get
        got = obs.get
        return out, {k: got[k] for k in exprs}

    def close(self) -> None:
        shutil.rmtree(self.dir, ignore_errors=True)

    def __enter__(self) -> "StateCutter":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
