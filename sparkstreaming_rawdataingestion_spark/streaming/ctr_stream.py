"""Streaming conversion-rate monitor with Wilson bounds — the
incremental twin of ``operators/evaluation.py::q_ctr_wilson_bounds``.

One built-in tumbling event-time window (1 day) with a watermark keeps
the per-day (trials, successes) counts; the Wilson 95% interval rides
the SAME ``wilson_cols`` expressions the batch query uses, applied to
the windowed counts — so the streamed bounds for a finalized day equal
the batch query's row for that day exactly (pytest parity). Append
mode: a day's row emits once, when the watermark passes its end; state
is bounded by windows-in-flight, the interval math is stateless column
algebra on top.

This is the live twin of ranking-by-lower-bound: a day whose lower
bound collapses is drifting BELOW its historical conversion floor with
95% confidence, small-n honest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.evaluation import wilson_cols

DEFAULT_WINDOW = "1 day"
DEFAULT_LATENESS = "1 hour"


def ctr_wilson_stream(
    events: DataFrame,
    window: str = DEFAULT_WINDOW,
    lateness: str = DEFAULT_LATENESS,
) -> DataFrame:
    """Per-window conversion trials/successes + Wilson bounds for the
    click→purchase rate. Append semantics; schema mirrors the batch
    query with ``day`` = the window start date."""
    trials = events.where(
        F.col("event_type").isin("click", "purchase")
    ).select(
        F.col("ts").cast("timestamp").alias("ts"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("y"),
    )
    counted = (
        trials.withWatermark("ts", lateness)
        .groupBy(F.window("ts", window).alias("w"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_trials"),
            F.sum("y").cast("long").alias("n_success"),
        )
    )
    return counted.select(
        F.col("w.start").cast("date").alias("day"),
        "n_trials",
        "n_success",
        *wilson_cols(),
    )
