"""Streaming CUSUM — the incremental twin of
``operators/segments.py::q_cusum_changepoint``.

The batch operator estimates each key's (μ, σ) from the full history and
replays the one-sided CUSUM recurrence s_t = max(0, s_{t−1} + (x_t − μ −
k)). The streaming deployment is the textbook monitoring shape: (μ, σ)
come from a BASELINE table (trained offline, e.g. by the batch twin on a
reference window) joined stream-static onto the firehose, and the
recurrence itself is keyed state — ONE double plus the last event time
carried between micro-batches, O(1) per key forever.

Exactness contract (same as ewma_stream): state stores the raw IEEE
accumulator and each step applies the exact batch expression
``max(0.0, s + (x − μ − k))`` with k = σ/2, so under any micro-batch
slicing the emitted per-event CUSUM values are bit-identical to the
batch kernel run with the same (μ, σ) — as long as each key's events
arrive in event-time order across batches. Late events are dropped
(see ewma_stream's watermark discussion; the lateness audit operator
sizes that discipline).
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
        T.StructField("event_id", T.LongType()),
        T.StructField("cusum", T.DoubleType()),
        T.StructField("alarm", T.BooleanType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_us", T.LongType()),
        T.StructField("last_eid", T.LongType()),
        T.StructField("s", T.DoubleType()),
    ]
)


def _fold(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    import math

    (user_id,) = key
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows["__us"] = rows["ts"].astype("datetime64[us]").astype("int64")
    rows = rows.sort_values(["__us", "event_id"])

    last_us, last_eid, s = state.get if state.exists else (None, None, 0.0)
    out_ids, out_s, out_alarm = [], [], []
    for eid, t, x, mu, sd in zip(
        rows["event_id"].tolist(),
        rows["__us"].tolist(),
        rows["value"].tolist(),
        rows["mu"].tolist(),
        rows["sd"].tolist(),
    ):
        # lateness frontier is the batch twin's (ts, event_id) order —
        # same-microsecond ties fold in (see ewma_stream docstring)
        if last_us is not None and (t, eid) <= (last_us, last_eid):
            continue  # late arrival — dropped, see module docstring
        s = max(0.0, s + (x - mu - 0.5 * sd))
        last_us, last_eid = t, eid
        out_ids.append(eid)
        out_s.append(math.floor(s * 1e6 + 0.5) / 1e6)
        out_alarm.append(s > 4.0 * sd)
    if last_us is not None:
        state.update((last_us, last_eid, s))
    yield pd.DataFrame(
        {
            "user_id": [user_id] * len(out_ids),
            "event_id": out_ids,
            "cusum": out_s,
            "alarm": out_alarm,
        }
    )


def cusum_stream(events: DataFrame, baseline: DataFrame) -> DataFrame:
    """Per-event CUSUM monitoring stream.

    ``events``: streaming DataFrame with (user_id, event_id, ts, value).
    ``baseline``: STATIC DataFrame (user_id, mu, sd) — the offline-
    trained reference stats; the stream-static join broadcasts it onto
    each micro-batch (keys without a baseline row are not monitored,
    an inner-join semantics deliberate for a monitoring deployment).
    Output: one row per accepted event, append mode (a CUSUM value is
    final when emitted).
    """
    return (
        events.select(
            "user_id", "event_id", F.col("ts").cast("timestamp").alias("ts"),
            "value",
        )
        .join(baseline, "user_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            _fold,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
