"""Streaming ordered-funnel detection — the incremental twin of
``operators/behavior.py::q_funnel_pattern_match``.

The batch operator chains three grouped minima (first view, first click
strictly after it, first purchase strictly after that). Processed in
event-time order those greedy minima ARE the first qualifying events, so
the streaming fold carries only the current stage timestamps per user —
two microsecond longs and a done flag, O(1) per key forever — and emits
exactly one completion row per user, at the micro-batch where the
purchase lands.

Parity contract: with each key's events arriving in event-time order
across batches (late events dropped, as in ewma/cusum streams), the
emitted (t_view, t_click, t_purchase, funnel_sec) rows are identical to
the batch operator's output. Completion is final: state collapses to a
tombstone afterwards, so a user costs nothing once converted.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("t_view", T.TimestampNTZType()),
        T.StructField("t_click", T.TimestampNTZType()),
        T.StructField("t_purchase", T.TimestampNTZType()),
        T.StructField("funnel_sec", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_us", T.LongType()),
        T.StructField("last_eid", T.LongType()),
        T.StructField("view_us", T.LongType()),
        T.StructField("click_us", T.LongType()),
        T.StructField("done", T.IntegerType()),
    ]
)

_US = 1_000_000


def _fold(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows["__us"] = rows["ts"].astype("datetime64[us]").astype("int64")
    rows = rows.sort_values(["__us", "event_id"])

    last_us, last_eid, view_us, click_us, done = (
        state.get if state.exists else (None, None, None, None, 0)
    )
    out = None
    for eid, t, typ in zip(
        rows["event_id"].tolist(),
        rows["__us"].tolist(),
        rows["event_type"].tolist(),
    ):
        # lateness frontier is the batch twin's (ts, event_id) order —
        # same-microsecond ties are processed (see ewma_stream docstring)
        if last_us is not None and (t, eid) <= (last_us, last_eid):
            continue  # late arrival — dropped (module docstring)
        last_us, last_eid = t, eid
        if done:
            continue
        if typ == "view":
            if view_us is None:
                view_us = t
        elif typ == "click":
            if view_us is not None and click_us is None and t > view_us:
                click_us = t
        elif typ == "purchase":
            if click_us is not None and t > click_us:
                done = 1
                out = pd.DataFrame(
                    {
                        "user_id": [user_id],
                        "t_view": [pd.Timestamp(view_us, unit="us")],
                        "t_click": [pd.Timestamp(click_us, unit="us")],
                        "t_purchase": [pd.Timestamp(t, unit="us")],
                        "funnel_sec": [(t - view_us) // _US],
                    }
                )
    state.update((last_us, last_eid, view_us, click_us, done))
    yield out if out is not None else pd.DataFrame(
        {
            "user_id": pd.Series([], dtype="int64"),
            "t_view": pd.Series([], dtype="datetime64[us]"),
            "t_click": pd.Series([], dtype="datetime64[us]"),
            "t_purchase": pd.Series([], dtype="datetime64[us]"),
            "funnel_sec": pd.Series([], dtype="int64"),
        }
    )


def funnel_stream(events: DataFrame) -> DataFrame:
    """Completion stream: one row per user at the moment their
    view → click → purchase funnel closes (append semantics; the row is
    final when emitted)."""
    return (
        events.select(
            "user_id", "event_id", F.col("ts").cast("timestamp").alias("ts"),
            "event_type",
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            _fold,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
