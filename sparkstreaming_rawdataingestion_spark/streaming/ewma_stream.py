"""Streaming EWMA — the incremental twin of
``operators/mining.py::q_ewma_smoothing``.

The batch operator declares EWMA the one genuinely sequential recurrence
(y_t = α·x_t + (1−α)·y_{t−1}); that recurrence is also the textbook case
for keyed streaming state: each key needs exactly TWO numbers carried
between micro-batches — the last event time and the raw (unrounded)
accumulator. State is O(1) per key forever, independent of stream
length, so this runs indefinitely on the reference's per-user DataPoint
firehose (RawDataIngestion.java:134-152) where the batch twin would need
the whole history.

Exactness contract: the state stores the raw IEEE double accumulator and
every step applies the SAME multiply-add expression as the batch kernel,
so the streamed output is BIT-IDENTICAL to the batch twin under ANY
micro-batch slicing — as long as each key's events arrive in event-time
order across batches. Order — and therefore lateness — is the batch
twin's (ts, event_id) sort order: the state carries (last_us, last_eid)
and an event folds in iff (t, event_id) is strictly greater, so a second
event sharing a key's exact microsecond is a processed tie, not a drop.
Genuinely late events cannot be folded into an already-advanced
recurrence; they are DROPPED, mirroring what a watermark does to late
rows in built-in stateful aggregations (the lateness audit operator
exists to size that discipline).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.mining import _EWMA_ALPHA

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ewma", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_us", T.LongType()),
        T.StructField("last_eid", T.LongType()),
        T.StructField("acc", T.DoubleType()),
    ]
)


def _fold(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this batch's events (event-time order) into the carried
    accumulator; emit one smoothed row per accepted event."""
    import math

    (user_id,) = key
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows["__us"] = rows["ts"].astype("datetime64[us]").astype("int64")
    rows = rows.sort_values(["__us", "event_id"])

    last_us, last_eid, acc = state.get if state.exists else (None, None, None)
    out_ids, out_vals = [], []
    for eid, t, x in zip(
        rows["event_id"].tolist(),
        rows["__us"].tolist(),
        rows["value"].tolist(),
    ):
        # late = not strictly after the frontier in the batch twin's
        # (ts, event_id) order — a same-microsecond event with a higher
        # event_id is a legitimate tie and folds in, not a late drop
        if last_us is not None and (t, eid) <= (last_us, last_eid):
            continue  # late arrival — see module docstring
        acc = x if acc is None else _EWMA_ALPHA * x + (1 - _EWMA_ALPHA) * acc
        last_us, last_eid = t, eid
        out_ids.append(eid)
        # same 6 dp floor-round expression as the batch kernel
        out_vals.append(math.floor(acc * 1e6 + 0.5) / 1e6)
    if last_us is not None:
        state.update((last_us, last_eid, acc))
    yield pd.DataFrame(
        {
            "user_id": [user_id] * len(out_ids),
            "event_id": out_ids,
            "ewma": out_vals,
        }
    )


def ewma_stream(events: DataFrame) -> DataFrame:
    """Smoothed-value stream: one output row per accepted event, append
    semantics (a smoothed value is final when emitted)."""
    return (
        events.select(
            "user_id", "event_id", F.col("ts").cast("timestamp").alias("ts"),
            "value",
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
