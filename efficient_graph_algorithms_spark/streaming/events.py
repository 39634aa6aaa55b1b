"""Structured Streaming extension: incremental crawl/event ingestion.

The reference is strictly batch (no streaming constructs anywhere under
its ``src/`` — SURVEY §2.10); the batch engine mirrors that. This module
is the engine's forward-looking extension for incremental ingestion:
the same aggregations the batch path runs, expressed over a stream with
event-time windows + watermarks, so a crawl feed can maintain degree /
in-link statistics continuously.

Transformations are defined on unbounded DataFrames and are equally
valid on a batch frame (used by tests: the same function is applied to
the static ``events`` table and to a file-stream over it, results must
match — the Structured Streaming "batch = stream prefix" contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    streaming: bool = False,
) -> DataFrame:
    """Per event-type counts + value sums over tumbling event-time
    windows. With streaming=True a watermark bounds state for late data."""
    if streaming:
        # watermarks require TIMESTAMP (tz-aware); parquet often carries NTZ.
        # Batch mode keeps the input type untouched (driver-oracle parity).
        src = events.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark(
            "ts", watermark
        )
    else:
        src = events
    return (
        src.groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def user_activity(events: DataFrame, streaming: bool = False, watermark: str = "2 hours") -> DataFrame:
    """Per-user running aggregates (streaming state analogue of the
    batch degree table)."""
    # same TIMESTAMP cast as windowed_event_counts: watermarks need a
    # tz-aware timestamp and parquet streams often carry NTZ
    src = (
        events.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark(
            "ts", watermark
        )
        if streaming
        else events
    )
    return src.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
        F.max("ts").alias("last_ts"),
    )


def stream_from_directory(spark, path: str, schema) -> DataFrame:
    """File-source stream (the sandbox's kafka-free ingestion path)."""
    return spark.readStream.schema(schema).parquet(path)
