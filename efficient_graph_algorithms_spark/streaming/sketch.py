"""Structured Streaming face of the count-min sketch.

Maintain hot-term counters INCREMENTALLY as documents land (the 100 TB
ingest shape: the sketch is the only state, d×w counters, regardless
of how much text has streamed through). The transformation is the
exact aggregation core of ``operators/cms.bucket_counts`` applied to
an unbounded frame — Structured Streaming's stateful aggregation keeps
the running counts; ``complete``/``update`` output modes emit them.

Because the sketch state is bounded (d·w rows) no watermark is needed
— this is the textbook case where unbounded-state concerns vanish by
construction. Stream == batch equality on the same documents is the
test contract (the "batch = stream prefix" discipline of
streaming/events.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from efficient_graph_algorithms_spark.operators.cms import bucket_counts


def stream_term_sketch(
    docs: DataFrame,
    text_col: str = "text",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Streaming CMS build over an unbounded document stream:
    (d, bucket, cnt), non-zero counters only (zero-filling a stream
    makes no sense; align on read with a grid join if the fixed shape
    is needed). Write with outputMode("complete") for the full sketch
    each trigger, or ("update") for changed counters only."""
    return bucket_counts(docs, text_col, depth, width)
