"""Streaming CMS == batch CMS on the same documents (prefix contract)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from efficient_graph_algorithms_spark.operators.cms import bucket_counts, cms_build
from efficient_graph_algorithms_spark.streaming.sketch import stream_term_sketch

DEPTH, WIDTH = 3, 64


def test_stream_sketch_equals_batch(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (0, "the cat sat on the mat"),
            (1, "the dog sat on the log"),
            (2, "cat and dog and cat"),
            (3, None),
            (4, "streams of terms and terms of streams"),
            (5, "  The   CAT\tsat  "),
        ],
        "doc_id long, text string",
    )
    sdir = tmp_path / "chunks"
    # two chunks so the aggregation genuinely spans microbatches
    for i, chunk in enumerate(
        [docs.where(F.col("doc_id") < 3), docs.where(F.col("doc_id") >= 3)]
    ):
        p = sdir / f"chunk{i}"
        chunk.coalesce(1).write.parquet(str(p))
        for f in p.glob("*.parquet"):
            os.utime(f, (1_700_000_000 + i, 1_700_000_000 + i))

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{sdir}/chunk*")
    )
    q = (
        stream_term_sketch(stream, depth=DEPTH, width=WIDTH)
        .writeStream.format("memory")
        .queryName("cms_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    assert len(q.recentProgress) >= 2  # counters accumulated across batches
    got = {
        (r["d"], r["bucket"]): r["cnt"]
        for r in spark.sql("select * from cms_stream").collect()
    }
    want = {
        (r["d"], r["bucket"]): r["cnt"]
        for r in bucket_counts(docs, depth=DEPTH, width=WIDTH).collect()
    }
    assert got == want
    # and the zero-filled batch sketch agrees on every non-zero counter
    full = {
        (r["d"], r["bucket"]): r["cnt"]
        for r in cms_build(docs, depth=DEPTH, width=WIDTH).collect()
    }
    assert {k: v for k, v in full.items() if v} == want
