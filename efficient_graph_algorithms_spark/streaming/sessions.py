"""Gap-based sessionization: batch window functions + a custom stateful
streaming operator (``applyInPandasWithState``).

A session is a maximal run of a user's events in which consecutive
events are at most ``gap_sec`` apart. This is the canonical
"operator Spark lacks as a built-in" for event streams: the batch form
is expressible with window functions (lag → gap flag → running sum),
the streaming form needs per-key state with an event-time timeout.

Scale notes (the shapes that matter at 100 TB):

- **Batch** (`sessionize`): ONE shuffle on ``user_id``; both window
  functions (lag and the running sum) share the same partitioning and
  ordering, so Catalyst plans a single sort. The per-user event list is
  streamed through the sort-based window operator — nothing is
  materialized per key, so only a single pathologically hot user (all
  events one key) would skew a task; web-scale event tables key by
  user/session actor where the heaviest key is ~1e6 events — megabytes.
- **Streaming** (`sessionize_stream`): state per user is the list of
  PENDING session intervals (4 scalars each) still inside the watermark
  horizon — events are aggregated into intervals immediately, never
  buffered raw. A session is emitted (and dropped from state) only once
  the watermark passes ``session_end + gap``, at which point no
  admissible event can extend or split it — so the operator is correct
  under ARBITRARY event order within the watermark, not just
  chronological delivery (asserted in tests with shuffled microbatches).
  The event-time timeout clears users who go quiet; state is O(pending
  intervals in the watermark horizon), not O(history).

The reference engine is batch-only (SURVEY §2.10); this module extends
the engine's streaming surface alongside `streaming/events.py`.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal
from typing import TYPE_CHECKING, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState

SESSION_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, sum_value double"
)
# pending session intervals as parallel arrays, sorted by start;
# timestamps as epoch microseconds (exact int64 arithmetic — float
# would lose sub-ms precision on 2024+ epochs)
_STATE_SCHEMA = (
    "starts array<bigint>, lasts array<bigint>, "
    "ns array<bigint>, ss array<double>"
)


def _round6_half_up(x: float) -> float:
    """Match Spark's F.round on doubles: BigDecimal of the SHORTEST
    decimal repr (repr(x) in Python = Double.toString in Java), then
    HALF_UP — Python's round() is half-even on the binary value and can
    differ in the last digit."""
    return float(Decimal(repr(float(x))).quantize(Decimal("0.000001"),
                                                  rounding=ROUND_HALF_UP))


def sessionize(events: DataFrame, gap_sec: int = 1800) -> DataFrame:
    """Batch sessionization of an ``(user_id, ts, value)`` event table.

    Returns one row per (user_id, session_idx) with the session span,
    event count and value sum; ``session_idx`` is 1-based in event-time
    order per user. Timestamp arithmetic stays in JVM interval algebra
    (works for TIMESTAMP and TIMESTAMP_NTZ alike, no epoch casts —
    ANSI-safe)."""
    gap = F.expr(f"INTERVAL '{int(gap_sec)}' SECOND")
    w = Window.partitionBy("user_id").orderBy("ts")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    flagged = events.select(
        "user_id",
        "ts",
        "value",
        # first event per user: lag is NULL -> comparison NULL -> otherwise(1)
        F.when(F.col("ts") - F.lag("ts").over(w) <= gap, F.lit(0))
        .otherwise(F.lit(1))
        .alias("new_s"),
    )
    return (
        flagged.withColumn("session_idx", F.sum("new_s").over(run).cast("long"))
        .groupBy("user_id", "session_idx")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )


def sessionize_stream(
    events: DataFrame, gap_sec: int = 1800, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming sessionization: per-user pending-interval state; a
    session is emitted (append mode) once the event-time watermark
    strictly passes ``session_end + gap`` — before that boundary a
    late-but-admissible event could still extend it or bridge it with a
    neighbor, so earlier emission would break exactness.

    Contract vs `sessionize`: after the watermark passes every pending
    session's horizon, the union of emitted rows equals the batch result
    minus ``session_idx`` — for ANY delivery order of events the
    watermark admits (asserted in tests, including shuffled batches).
    """
    import math
    from datetime import datetime, timedelta, timezone
    from zoneinfo import ZoneInfo

    import pandas as pd  # driver + worker import; keep module import light

    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = int(gap_sec) * 1_000_000

    # Arrow hands the UDF SESSION-LOCAL naive timestamps, but
    # getCurrentWatermarkMs()/setTimeoutTimestamp speak UTC epoch — on
    # a non-UTC session the raw comparison would shift finalization by
    # the tz offset (hours-early emission). Capture the session tz at
    # build time and convert at the boundary; under UTC (session.py's
    # pin) both conversions are the identity, so existing behavior is
    # bit-for-bit unchanged. (Naive local times are inherently
    # ambiguous for one hour at DST fall-back; fold=0 resolution.)
    _tz = ZoneInfo(events.sparkSession.conf.get("spark.sql.session.timeZone"))
    _EPOCH = datetime(1970, 1, 1)
    _US = timedelta(microseconds=1)

    def _wm_local_us(wm_ms: int) -> int:
        dt = datetime.fromtimestamp(wm_ms / 1000.0, tz=timezone.utc)
        return (dt.astimezone(_tz).replace(tzinfo=None) - _EPOCH) // _US

    def _local_us_to_utc_ms(us: int) -> int:
        naive = _EPOCH + us * _US
        return int(naive.replace(tzinfo=_tz).timestamp() * 1000)

    def _nadd(a: float, b: float) -> float:
        """NaN-skipping add: NaN encodes 'no non-null values yet', the
        batch F.sum null-skip semantics (all-null group stays NaN and
        is emitted as NULL)."""
        if math.isnan(b):
            return a
        if math.isnan(a):
            return b
        return a + b

    def _rows(uid: int, intervals: list[list]) -> "pd.DataFrame":
        return pd.DataFrame(
            {
                "user_id": [uid] * len(intervals),
                "session_start": [pd.Timestamp(m[0] * 1000) for m in intervals],
                "session_end": [pd.Timestamp(m[1] * 1000) for m in intervals],
                "n_events": [m[2] for m in intervals],
                "sum_value": pd.array(
                    [
                        None if math.isnan(m[3]) else _round6_half_up(m[3])
                        for m in intervals
                    ],
                    dtype="Float64",  # nullable: NaN-sentinel -> true NULL
                ),
            }
        )

    def _settle(state: "GroupState", uid: int, items: list[list]):
        """Merge intervals/events (sorted sweep), emit the final ones,
        persist the rest with a timeout at the earliest horizon."""
        items.sort(key=lambda m: (m[0], m[1]))
        merged: list[list] = []
        for it in items:
            if merged and it[0] <= merged[-1][1] + gap_us:
                m = merged[-1]
                m[1] = max(m[1], it[1])
                m[2] += it[2]
                m[3] = _nadd(m[3], it[3])
            else:
                merged.append(list(it))
        wm_us = _wm_local_us(state.getCurrentWatermarkMs())
        # strict: an event at exactly last+gap (== watermark) still merges
        final = [m for m in merged if m[1] + gap_us < wm_us]
        pending = [m for m in merged if m[1] + gap_us >= wm_us]
        if pending:
            state.update(
                (
                    [m[0] for m in pending],
                    [m[1] for m in pending],
                    [m[2] for m in pending],
                    [m[3] for m in pending],
                )
            )
            horizon_ms = (
                _local_us_to_utc_ms(min(m[1] for m in pending))
                + int(gap_sec) * 1000
                + 1
            )
            state.setTimeoutTimestamp(max(horizon_ms, state.getCurrentWatermarkMs() + 1))
        elif state.exists:
            state.remove()
        return final

    def fn(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: "GroupState"
    ) -> Iterator["pd.DataFrame"]:
        uid = key[0]
        items: list[list] = []
        if state.exists:
            starts, lasts, ns, ss = state.get
            items = [
                [int(a), int(b), int(n), float(s)]
                for a, b, n, s in zip(starts, lasts, ns, ss)
            ]
        if not state.hasTimedOut:
            chunks = [pdf[["ts", "value"]] for pdf in pdfs]
            ev = pd.concat(chunks) if chunks else pd.DataFrame()
            if len(ev):
                # arrow may hand datetime64[us] or [ns]; normalize via numpy
                ts_us = ev["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
                vals = ev["value"].to_numpy()
                items += [[int(t), int(t), 1, float(v)] for t, v in zip(ts_us, vals)]
        if not items:
            return
        final = _settle(state, uid, items)
        if final:
            yield _rows(uid, final)

    src = events.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark(
        "ts", watermark
    )
    return src.groupBy("user_id").applyInPandasWithState(
        fn,
        SESSION_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
