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
- **Streaming** (`sessionize_stream`): state per OPEN session only
  (4 scalars/user), closed sessions are emitted and dropped; the
  event-time timeout bounds state for users that go quiet — state size
  is O(active users in the watermark horizon), not O(history).

The reference engine is batch-only (SURVEY §2.10); this module extends
the engine's streaming surface alongside `streaming/events.py`.
"""

from __future__ import annotations

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
# open-session state: timestamps as epoch microseconds (exact int64
# arithmetic — float would lose sub-ms precision on 2024+ epochs)
_STATE_SCHEMA = "start_us bigint, last_us bigint, n bigint, s double"


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
    """Streaming sessionization: per-user open-session state, sessions
    emitted (append mode) when closed by a gap or by the event-time
    timeout once the watermark passes ``last_event + gap``.

    Contract vs `sessionize`: after the watermark passes every open
    session's horizon, the union of emitted rows equals the batch result
    minus ``session_idx`` (batch=stream-prefix; asserted in tests).
    """
    import pandas as pd  # driver + worker import; keep module import light

    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = int(gap_sec) * 1_000_000

    def _emit(uid: int, st: tuple) -> "pd.DataFrame":
        start_us, last_us, n, s = st
        return pd.DataFrame(
            {
                "user_id": [uid],
                "session_start": [pd.Timestamp(start_us * 1000)],
                "session_end": [pd.Timestamp(last_us * 1000)],
                "n_events": [n],
                "sum_value": [round(s, 6)],
            }
        )

    def fn(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: "GroupState"
    ) -> Iterator["pd.DataFrame"]:
        uid = key[0]
        if state.hasTimedOut:
            # watermark passed last_event + gap: the open session is final
            st = state.get
            state.remove()
            yield _emit(uid, st)
            return
        chunks = [pdf[["ts", "value"]] for pdf in pdfs]
        ev = pd.concat(chunks).sort_values("ts") if chunks else pd.DataFrame()
        if len(ev) == 0:
            # defensive: a data invocation with no rows leaves the open
            # session (and its pending timeout) untouched
            return
        # arrow may hand pandas datetime64[us] or [ns]; normalize via numpy
        ts_us = ev["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
        vals = ev["value"].to_numpy()
        open_s = list(state.get) if state.exists else None
        for t, v in zip(ts_us, vals):
            if open_s is not None and t - open_s[1] <= gap_us:
                open_s[1] = max(open_s[1], int(t))
                open_s[2] += 1
                open_s[3] += float(v)
            else:
                if open_s is not None:
                    yield _emit(uid, tuple(open_s))
                open_s = [int(t), int(t), 1, float(v)]
        state.update(tuple(open_s))
        # fire once the watermark passes the session horizon; the API
        # rejects timestamps at/behind the current watermark, so clamp
        timeout_ms = max(
            open_s[1] // 1000 + int(gap_sec) * 1000,
            state.getCurrentWatermarkMs() + 1,
        )
        state.setTimeoutTimestamp(timeout_ms)

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
