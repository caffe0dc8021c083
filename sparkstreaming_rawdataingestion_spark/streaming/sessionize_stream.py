"""Streaming sessionization — per-user session assembly with event-time
timeouts (the custom stateful operator ``session_window`` cannot express:
it emits per-session aggregates, while trajectory/conversation pipelines
need the COMPLETED-session record stream with exact boundaries).

Batch twin: ``operators/analytics.py::q_sessionize_events`` (gap > 30 min
opens a new session). The streaming form keeps one tiny state row per
ACTIVE user session — (start, last, count) — and closes a session two
ways:

- **in-batch gap**: a later event of the same user arrives > gap after
  the previous one → the finished session is emitted immediately;
- **event-time timeout**: the watermark passes ``last + gap`` with no new
  event → the state-store timer fires and the session is emitted.

State size therefore tracks ACTIVE users only (bounded by the watermark,
RocksDB state store in production), never stream history — the property
that lets this run forever on a 100 TB/day event stream. The reference
had no event-time state at all (its only time axis was the 5 s
processing-time batch, RawDataIngestion.java:91); this is the operator
its per-record ``dateTime`` field implies.

Implemented on ``applyInPandasWithState`` (Arrow-batched; see
streaming/stateful.py for why not transformWithStateInPandas in this
container).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: session gap — same constant as the batch twin (30 minutes); all
#: event-time arithmetic runs in MICROSECONDS (the events table's native
#: precision — ms truncation would disagree with the batch twin's
#: interval comparison on sub-ms gap boundaries)
SESSION_GAP_MS = 30 * 60 * 1000
SESSION_GAP_US = SESSION_GAP_MS * 1000

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def _session_row(user_id, start_us: int, last_us: int, n: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "session_start": [pd.Timestamp(start_us, unit="us")],
            "session_end": [pd.Timestamp(last_us, unit="us")],
            "n_events": [n],
        }
    )


def _sessionize(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this batch's events (sorted by event time) into the open
    session; emit every session closed by an in-batch gap, keep the still
    open one in state with an event-time timer at ``last + gap``."""
    (user_id,) = key
    if state.hasTimedOut:
        start_us, last_us, n = state.get
        state.remove()
        yield _session_row(user_id, start_us, last_us, n)
        return

    times: list[int] = []
    for pdf in pdfs:
        # timestamps arrive as datetime64[ns|us] — normalize to int µs
        times.extend(
            (pdf["ts"].astype("datetime64[us]").astype("int64")).tolist()
        )
    times.sort()

    start_us, last_us, n = state.get if state.exists else (None, None, 0)
    for t in times:
        if last_us is not None and t - last_us > SESSION_GAP_US:
            yield _session_row(user_id, start_us, last_us, n)
            start_us, n = t, 0
        if start_us is None:
            start_us = t
        last_us = t
        n += 1
    state.update((start_us, last_us, n))
    # close via timer (millisecond API) once the watermark passes the gap
    # horizon; the timer must sit strictly beyond the current watermark
    # (late-arriving keys whose horizon already passed fire next batch)
    wm = state.getCurrentWatermarkMs()
    state.setTimeoutTimestamp(max(last_us // 1000 + SESSION_GAP_MS + 1, wm + 1))


def sessionize_stream(events: DataFrame, watermark: str = "1 second") -> DataFrame:
    """Completed-session stream: one output row per closed session
    (append semantics; a session is final once emitted)."""
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
