"""Streaming exact-dedup: stream==batch exactness under reordered
delivery, winner semantics, and the bounded-horizon mode."""

from __future__ import annotations

import os
import time as _time

import pandas as pd
import pytest
from pyspark.sql import functions as F

from efficient_graph_algorithms_spark.streaming.dedup import (
    dedup_verdicts_batch,
    dedup_verdicts_stream,
)

BASE = pd.Timestamp("2026-03-01 00:00:00")


def _docs(spark):
    """120 docs over 40 distinct texts: fingerprint groups of size 3
    with strictly increasing ts inside each group, plus same-ts id
    tie-break groups."""
    rows = []
    for i in range(120):
        g = i % 40
        rep = i // 40  # 0,1,2: copies of group g
        ts = BASE + pd.Timedelta(minutes=10 * g + 90 * rep)
        if g < 5:  # same-ts groups: verdict must tie-break on doc_id
            ts = BASE + pd.Timedelta(minutes=10 * g)
        rows.append((i, ts.to_pydatetime(), f"document body number {g} lorem ipsum"))
    return spark.createDataFrame(rows, "doc_id long, ts timestamp, text string")


def test_batch_face_semantics(spark):
    docs = _docs(spark)
    out = dedup_verdicts_batch(docs).toPandas().set_index("doc_id")
    assert len(out) == 120
    # one keeper per fingerprint group, and it is the (ts, id) minimum
    assert out["keep"].sum() == 40
    for g in range(40):
        members = [g, g + 40, g + 80]
        winners = {out.loc[m, "winner_id"] for m in members}
        assert winners == {g}  # min ts, then min id -> the g-th doc
        assert bool(out.loc[g, "keep"]) and not bool(out.loc[g + 40, "keep"])


@pytest.mark.parametrize("split", ["chronological", "shuffled"])
def test_stream_matches_batch(spark, tmp_path, split):
    docs = _docs(spark)
    sdir = tmp_path / "docs_stream"
    if split == "chronological":
        parts = [docs.where(F.col("doc_id") < 60), docs.where(F.col("doc_id") >= 60)]
        watermark = "1 hour"
    else:
        # every second doc is ~a whole stream late: duplicates of a
        # fingerprint arrive BEFORE their event-time winner
        parts = [docs.where(F.col("doc_id") % 2 == 0), docs.where(F.col("doc_id") % 2 == 1)]
        watermark = "30 days"
    sentinel_ts = BASE + pd.Timedelta(days=40)
    chunks = parts + [
        spark.createDataFrame(
            [(999_999, sentinel_ts.to_pydatetime(), "sentinel body")], docs.schema
        )
    ]
    for i, c in enumerate(chunks):
        p = sdir / f"chunk{i}"
        c.coalesce(1).write.parquet(str(p))
        for f in p.glob("*.parquet"):
            os.utime(f, (1_700_000_000 + i, 1_700_000_000 + i))
        _time.sleep(0.01)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{sdir}/chunk*")
    )
    qname = f"dedup_pp_{split}"
    q = (
        dedup_verdicts_stream(stream, watermark=watermark)
        .writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    assert len(q.recentProgress) >= 3
    got = spark.sql(f"select * from {qname} where doc_id < 999999").toPandas()
    want = dedup_verdicts_batch(docs).toPandas()

    def norm(df):
        df = df.copy()
        df["ts"] = pd.to_datetime(df["ts"]).dt.tz_localize(None)
        cols = ["doc_id", "ts", "fp", "keep", "winner_id"]
        return set(map(tuple, df[cols].itertuples(index=False)))

    assert len(got) == len(want) and norm(got) == norm(want)
    # duplicates genuinely crossed batch boundaries
    assert (~got["keep"]).sum() == 80


def test_stream_horizon_forgets_old_winners(spark, tmp_path):
    """Bounded mode: a recurrence AFTER winner_ts + horizon (with
    nothing pending) counts as fresh — the dropDuplicatesWithinWatermark
    analogue that keeps state O(horizon), not O(history)."""
    rows = [
        (1, BASE.to_pydatetime(), "repeated text"),
        (2, (BASE + pd.Timedelta(hours=1)).to_pydatetime(), "repeated text"),
        (3, (BASE + pd.Timedelta(days=10)).to_pydatetime(), "repeated text"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, ts timestamp, text string")
    sdir = tmp_path / "docs_h"
    chunks = [
        docs.where(F.col("doc_id") <= 2),
        docs.where(F.col("doc_id") == 3),
        spark.createDataFrame(
            [(999_999, (BASE + pd.Timedelta(days=100)).to_pydatetime(), "sentinel body")], docs.schema
        ),
    ]
    for i, c in enumerate(chunks):
        p = sdir / f"chunk{i}"
        c.coalesce(1).write.parquet(str(p))
        for f in p.glob("*.parquet"):
            os.utime(f, (1_700_000_000 + i, 1_700_000_000 + i))
        _time.sleep(0.01)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{sdir}/chunk*")
    )
    q = (
        dedup_verdicts_stream(stream, watermark="2 hours", horizon_sec=6 * 3600)
        .writeStream.format("memory")
        .queryName("dedup_hz")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    got = (
        spark.sql("select * from dedup_hz where doc_id < 999999")
        .toPandas()
        .set_index("doc_id")
    )
    assert bool(got.loc[1, "keep"]) and not bool(got.loc[2, "keep"])
    # doc 3 recurs after the horizon: the fingerprint was forgotten
    assert bool(got.loc[3, "keep"]) and got.loc[3, "winner_id"] == 3
