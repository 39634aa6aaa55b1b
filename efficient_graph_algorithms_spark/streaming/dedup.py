"""Streaming exact deduplication: first-writer-wins by EVENT TIME,
verdicts finalized by the watermark (``applyInPandasWithState``).

The corpus-hygiene face of the streaming surface: documents arrive
continuously (a crawl), and each one needs a keep/drop verdict against
every document ever seen with the same content fingerprint. Spark's
built-in ``dropDuplicates`` on a stream keeps only the first ARRIVAL,
which is nondeterministic under reordered delivery; this operator keeps
the first document in (ts, doc_id) EVENT-TIME order, so the output is a
pure function of the event set — any delivery order the watermark
admits produces identical rows (the sessionizer's exactness contract,
asserted the same way in tests).

How: group by fingerprint; a document's verdict is final only once the
watermark strictly passes its ts (no admissible arrival can precede it
in event-time order after that), at which point it is emitted with
``keep = (it is the event-time minimum seen)`` and the winner's id.
Per-fingerprint state is the winner pair plus the pending (not yet
past-watermark) docs; an event-time timeout re-fires the group so
pending verdicts emit even if the fingerprint never recurs.

State growth — the honest 100 TB note: exact forever-dedup is
inherently O(distinct fingerprints) state (Spark's own streaming
``dropDuplicates`` shares this); pass ``horizon_sec`` to forget a
fingerprint's winner once the watermark passes ``winner_ts +
horizon_sec`` with nothing pending — bounded state with
dedup-within-horizon semantics (Spark's ``dropDuplicatesWithinWatermark``
analogue), at the cost that a recurrence after the horizon counts as
fresh.

The reference engine is batch-only (SURVEY §2.10); this module extends
the streaming surface alongside ``streaming/sessions.py``.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from efficient_graph_algorithms_spark.functions.text import fingerprint60

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState

DEDUP_SCHEMA = (
    "doc_id bigint, ts timestamp, fp bigint, keep boolean, winner_id bigint"
)
# winner pair + pending docs (epoch-us int64 exact arithmetic, the
# sessionizer convention)
_STATE_SCHEMA = "w_ts bigint, w_id bigint, p_ts array<bigint>, p_id array<bigint>"


def dedup_verdicts_batch(
    docs: DataFrame,
    id_col: str = "doc_id",
    ts_col: str = "ts",
    text_col: str = "text",
) -> DataFrame:
    """Batch face / oracle: (doc_id, ts, fp, keep, winner_id) where
    keep marks the (ts, doc_id)-minimum of each fingerprint group and
    winner_id is that minimum's doc_id for every member."""
    fp = fingerprint60(F.col(text_col)).alias("fp")
    base = docs.select(F.col(id_col).alias("doc_id"), F.col(ts_col).alias("ts"), fp)
    w = Window.partitionBy("fp")
    winner = F.min(F.struct("ts", "doc_id")).over(w)
    return base.select(
        "doc_id",
        "ts",
        "fp",
        (F.struct("ts", "doc_id") == winner).alias("keep"),
        winner["doc_id"].alias("winner_id"),
    )


def dedup_verdicts_stream(
    docs: DataFrame,
    watermark: str = "2 hours",
    horizon_sec: int | None = None,
    id_col: str = "doc_id",
    ts_col: str = "ts",
    text_col: str = "text",
) -> DataFrame:
    """Streaming face: identical rows to ``dedup_verdicts_batch`` once
    the watermark passes every document's ts, for ANY admissible
    delivery order. See module docstring for the state contract."""
    import pandas as pd  # driver + worker import; keep module import light

    from pyspark.sql.streaming.state import GroupStateTimeout

    horizon_us = None if horizon_sec is None else int(horizon_sec) * 1_000_000

    # Arrow hands SESSION-LOCAL naive timestamps while the watermark /
    # timeout APIs speak UTC epoch ms — convert at the boundary (the
    # sessions.py fix; identity under the UTC session pin).
    from datetime import datetime, timedelta, timezone
    from zoneinfo import ZoneInfo

    _tz = ZoneInfo(docs.sparkSession.conf.get("spark.sql.session.timeZone"))
    _EPOCH = datetime(1970, 1, 1)
    _US = timedelta(microseconds=1)

    def _wm_local_us(wm_ms: int) -> int:
        dt = datetime.fromtimestamp(wm_ms / 1000.0, tz=timezone.utc)
        return (dt.astimezone(_tz).replace(tzinfo=None) - _EPOCH) // _US

    def _local_us_to_utc_ms(us: int) -> int:
        return int((_EPOCH + us * _US).replace(tzinfo=_tz).timestamp() * 1000)

    def fn(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: "GroupState"
    ) -> Iterator["pd.DataFrame"]:
        fp = key[0]
        w: tuple | None = None
        pending: list[tuple] = []
        if state.exists:
            w_ts, w_id, p_ts, p_id = state.get
            # w_ts/w_id are NULL while every doc is still pending (no
            # verdict finalized yet)
            w = None if w_ts is None else (int(w_ts), int(w_id))
            pending = [(int(t), int(d)) for t, d in zip(p_ts, p_id)]
        if not state.hasTimedOut:
            chunks = [pdf[["ts", "doc_id"]] for pdf in pdfs]
            ev = pd.concat(chunks) if chunks else pd.DataFrame()
            if len(ev):
                ts_us = ev["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
                ids = ev["doc_id"].to_numpy()
                pending += [(int(t), int(d)) for t, d in zip(ts_us, ids)]
        if w is None and not pending:
            if state.exists:
                state.remove()
            return
        wm_us = _wm_local_us(state.getCurrentWatermarkMs())
        # strict: a doc at ts == watermark could still be preceded by an
        # admissible same-ts arrival with a smaller id
        finals = sorted(t for t in pending if t[0] < wm_us)
        pending = [t for t in pending if t[0] >= wm_us]
        # Verdicts in (ts, id) order. Every doc preceding a final in that
        # order has either been finalized already (summarized by w) or is
        # in this finals list — so the sweep sees the complete prefix.
        out: list[tuple] = []  # (ts, id, keep, winner_id)
        for d in finals:
            if w is None or (horizon_us is not None and d[0] > w[0] + horizon_us):
                # fresh: no winner yet, or (bounded mode) the standing
                # winner's dedup horizon has lapsed — the chain resets
                out.append((d[0], d[1], True, d[1]))
                w = d
            elif d < w:
                # exact mode only (in bounded mode finals are >= w in
                # order): a late arrival beats the standing winner
                out.append((d[0], d[1], True, d[1]))
                w = d
            else:
                out.append((d[0], d[1], d == w, w[1]))
        if pending:
            state.update(
                (
                    None if w is None else w[0],
                    None if w is None else w[1],
                    [t for t, _ in pending],
                    [d for _, d in pending],
                )
            )
            horizon_ms = _local_us_to_utc_ms(min(t for t, _ in pending)) + 1
            state.setTimeoutTimestamp(max(horizon_ms, state.getCurrentWatermarkMs() + 1))
        elif w is None:
            if state.exists:
                state.remove()
        elif horizon_us is not None and wm_us > w[0] + horizon_us:
            # bounded mode: the winner is out of the dedup horizon and
            # nothing is pending — forget the fingerprint entirely
            if state.exists:
                state.remove()
        else:
            state.update((w[0], w[1], [], []))
            if horizon_us is not None:
                state.setTimeoutTimestamp(
                    max(
                        _local_us_to_utc_ms(w[0] + horizon_us) + 1,
                        state.getCurrentWatermarkMs() + 1,
                    )
                )
        if out:
            yield pd.DataFrame(
                {
                    "doc_id": [d for _, d, _, _ in out],
                    "ts": [pd.Timestamp(t * 1000) for t, _, _, _ in out],
                    "fp": [fp] * len(out),
                    "keep": [k for _, _, k, _ in out],
                    "winner_id": [wid for _, _, _, wid in out],
                }
            )

    src = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(ts_col).cast("timestamp").alias("ts"),
        fingerprint60(F.col(text_col)).alias("fp"),
    ).withWatermark("ts", watermark)
    return src.groupBy("fp").applyInPandasWithState(
        fn,
        DEDUP_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
