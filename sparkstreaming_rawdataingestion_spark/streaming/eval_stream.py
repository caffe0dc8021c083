"""Streaming model-quality monitor — the incremental twin of
``operators/evaluation.py::q_classifier_eval_metrics``, per event-time
window.

Online scoring systems watch their live precision/recall as labels
arrive; this is that monitor as ONE built-in windowed aggregation: the
whole confusion tableau rides conditional sums inside a tumbling
event-time window with a watermark, so windows finalize exactly once
(append mode) and state is bounded by windows-in-flight — no custom
state, no Python in the hot path.

The decision threshold is an OFFLINE-TRAINED constant (like
cusum_stream's baseline): evaluation compares the live stream against a
frozen decision rule; re-fitting the threshold on the stream itself
would conflate model drift with threshold drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_WINDOW = "1 day"
DEFAULT_LATENESS = "1 hour"


def eval_stream(
    events: DataFrame,
    threshold: float,
    window: str = DEFAULT_WINDOW,
    lateness: str = DEFAULT_LATENESS,
) -> DataFrame:
    """Per-window confusion tableau + precision/recall for the frozen
    rule ``predict positive ⇔ value ≥ threshold`` against the observed
    label ``event_type == 'purchase'``. Append semantics: a window's
    row is final when the watermark passes its end."""
    y = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    yhat = F.when(F.col("value") >= threshold, 1).otherwise(0)
    tagged = events.select(
        F.col("ts").cast("timestamp").alias("ts"),
        y.alias("y"),
        yhat.alias("yhat"),
    )
    agg = (
        tagged.withWatermark("ts", lateness)
        .groupBy(F.window("ts", window).alias("w"))
        .agg(
            F.sum(F.col("y") * F.col("yhat")).alias("tp"),
            F.sum((1 - F.col("y")) * F.col("yhat")).alias("fp"),
            F.sum(F.col("y") * (1 - F.col("yhat"))).alias("fn"),
            F.sum((1 - F.col("y")) * (1 - F.col("yhat"))).alias("tn"),
        )
    )
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    # try_divide: the session runs Spark's default ANSI mode, where x/0
    # raises DIVIDE_BY_ZERO. A finalized window with no predicted
    # positives (tp+fp=0) or no actual positives (tp+fn=0) — a quiet day
    # — must emit NULL metrics, not kill the query; a plain `/` here
    # poisons the checkpoint (the failing window replays on every
    # restart).
    return agg.select(
        F.col("w.start").alias("window_start"),
        tp.cast("long").alias("tp"),
        fp.cast("long").alias("fp"),
        fn.cast("long").alias("fn"),
        F.col("tn").cast("long").alias("tn"),
        F.round(F.try_divide(tp.cast("double"), tp + fp), 6)
        .alias("precision_"),
        F.round(F.try_divide(tp.cast("double"), tp + fn), 6)
        .alias("recall_"),
    )
