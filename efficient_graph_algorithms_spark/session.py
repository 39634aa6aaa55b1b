"""SparkSession factory tuned for iterative link-graph analytics.

Defaults are sized for the sandbox (single JVM, local[N]) but every knob
matters identically on a 1000-executor cluster:

- AQE on (runtime re-plan, skew-join splitting, broadcast demotion)
- Arrow on (all pandas UDFs are vectorized batches, never per-row)
- shuffle partitions parameterized by data scale, not hardcoded 200
- float64 end-to-end (PageRank's 1e-6 bar disallows float32 downcasts)
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))


def get_spark(
    app_name: str = "ega-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's standard config."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    sp = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.default.parallelism", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # iterative gather-scatter: hash join beats sort-merge (nothing
        # should re-sort the edge table every iteration)
        .config("spark.sql.join.preferSortMergeJoin", "false")
        # iterative loops shed ~1GB/iteration of dead shuffle files and
        # unpersisted cache blocks whose JVM-side cleanup waits on
        # ContextCleaner, which waits on GC. 30s periodic GC + a
        # moderate heap keeps cleanup AHEAD of accumulation: measured at
        # 100M edges/local[8], a 48g heap with 1min GC degrades 18s →
        # 76s/iteration by iteration 9 (page-cache + storage pressure
        # cycles); 24g + 30s stays flat for 12+ iterations.
        .config("spark.cleaner.periodicGC.interval", "30s")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    # shuffle/spill scratch override (r6): concurrent multi-JVM probes
    # showed the sandbox's shared virtio disk is the bottleneck for
    # concurrent shuffle writers (BENCH/diskprobe.json: 4 writers =
    # 1.29x one writer) — a resource real executor nodes don't share.
    # SPARK_GRAFT_LOCAL_DIR points spark.local.dir at tmpfs (or any
    # fast per-JVM scratch); unset = Spark's default, so single-JVM
    # behaviour is unchanged.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir:
        b = b.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
