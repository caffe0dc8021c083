"""Streaming debounce — the incremental twin of
``operators/signals.py::q_debounce_events``.

The batch operator collapses same-(user, type) events closer than 30 s to
their predecessor into bursts. Streaming, that predicate needs exactly
ONE microsecond long per key carried between micro-batches (the last
accepted event time), so the debounced stream — the burst-START events —
emits with O(1) state per key forever: the canonical edge-trigger filter
in front of an alerting pipeline.

Parity contract: with per-key event-time order across batches (late
events dropped, as in ewma/cusum/funnel streams), the emitted burst-start
event ids equal the batch operator's ``first_event_id`` set, under any
micro-batch slicing. The batch twin also reports per-burst collapse
counts — a retrospective quantity the stream deliberately does not wait
for (a burst is only known closed once its gap passes; the start row is
what alerting needs immediately).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.signals import _DEBOUNCE_GAP_S

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_us", T.LongType()),
        T.StructField("last_eid", T.LongType()),
    ]
)

_GAP_US = _DEBOUNCE_GAP_S * 1_000_000


def _fold(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    user_id, event_type = key
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows["__us"] = rows["ts"].astype("datetime64[us]").astype("int64")
    rows = rows.sort_values(["__us", "event_id"])

    last_us, last_eid = state.get if state.exists else (None, None)
    out_ids, out_ts = [], []
    for eid, t in zip(rows["event_id"].tolist(), rows["__us"].tolist()):
        # lateness frontier is the batch twin's (ts, event_id) order —
        # a same-microsecond tie is processed (and collapses into the
        # burst, gap 0), not dropped (see ewma_stream docstring)
        if last_us is not None and (t, eid) <= (last_us, last_eid):
            continue  # late arrival — dropped
        if last_us is None or (t - last_us) > _GAP_US:
            out_ids.append(eid)
            out_ts.append(pd.Timestamp(t, unit="us"))
        last_us, last_eid = t, eid
    if last_us is not None:
        state.update((last_us, last_eid))
    yield pd.DataFrame(
        {
            "user_id": [user_id] * len(out_ids),
            "event_type": [event_type] * len(out_ids),
            "event_id": out_ids,
            "ts": pd.Series(out_ts, dtype="datetime64[us]"),
        }
    )


def debounce_stream(events: DataFrame) -> DataFrame:
    """The debounced stream: burst-start events only, append semantics."""
    return (
        events.select(
            "user_id", "event_type", "event_id",
            F.col("ts").cast("timestamp").alias("ts"),
        )
        .groupBy("user_id", "event_type")
        .applyInPandasWithState(
            _fold,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
