"""Streaming distribution-drift monitor — the incremental twin of
``operators/mining.py::q_psi_drift``.

The batch PSI operator notes that the binned, smoothed PSI form is "cheap
to maintain incrementally"; this module is that maintenance. A reference
profile (per-series bin bounds + smoothed bin proportions) is frozen
offline; the live stream then only has to keep **per-window bin counts**
up to date — a watermark-bounded windowed aggregation in UPDATE mode,
exactly the rollup_stream pattern: each micro-batch emits absolute
totals for the (window, series, bin) keys it touched, and the foreachBatch
merge REPLACES those keys in the materained counts table (replay- and
retry-idempotent by construction). The PSI report is then recomputed from
the tiny counts table (windows × series × bins rows) and rewritten whole.

Scale shape: the stream side pays one broadcast stream-static join
(bounds are |series| rows) and one windowed aggregation whose state is
bounded by watermark × series × bins — never stream history. The merge
rewrites only touched day partitions; the report is O(windows·series·bins),
dashboard-sized at any corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.mining import _PSI_BINS
from .ingest_stream import _trigger_kwargs
from .rollup_stream import merge_rollup
from .windows import DEFAULT_WATERMARK

COUNT_KEY = ("win_start", "event_type", "bin")
_SMOOTH = _PSI_BINS / 2.0


def reference_profile(ref_events: DataFrame) -> DataFrame:
    """Freeze the reference cohort into (event_type, lo, hi, bin, p_ref):
    per-series fixed-width bin bounds plus Laplace-smoothed reference
    proportions over the DENSE bin grid (absent bins carry the smoothing
    floor, never zero). Train once, broadcast forever."""
    ev = ref_events.where(F.col("value").isNotNull())
    bounds = ev.groupBy("event_type").agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    binned = ev.join(F.broadcast(bounds), "event_type").select(
        "event_type", _bin_expr().alias("bin")
    )
    grid = bounds.crossJoin(
        F.broadcast(
            ref_events.sparkSession.range(_PSI_BINS).select(
                F.col("id").alias("bin")
            )
        )
    )
    counts = grid.join(
        binned.groupBy("event_type", "bin").agg(F.count(F.lit(1)).alias("c")),
        ["event_type", "bin"],
        "left",
    ).select(
        "event_type",
        "lo",
        "hi",
        "bin",
        F.coalesce(F.col("c"), F.lit(0)).alias("cnt"),
    )
    from pyspark.sql import Window

    wtot = Window.partitionBy("event_type")
    return counts.select(
        "event_type",
        "lo",
        "hi",
        "bin",
        (
            (F.col("cnt") + F.lit(0.5))
            / (F.sum("cnt").over(wtot) + F.lit(_SMOOTH))
        ).alias("p_ref"),
    )


def _bin_expr():
    """Same clamped fixed-width formula as the batch operator."""
    width = (F.col("hi") - F.col("lo")) / F.lit(float(_PSI_BINS))
    return F.least(
        F.lit(_PSI_BINS - 1),
        F.greatest(
            F.lit(0),
            F.floor((F.col("value") - F.col("lo")) / width).cast("long"),
        ),
    )


def windowed_bin_counts(
    events: DataFrame,
    profile: DataFrame,
    window: str = "1 day",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Per-(event-time window, series, bin) counts — batch or streaming.
    Streaming: watermark-bounded UPDATE-mode aggregation emitting
    absolute totals for touched keys."""
    bounds = profile.select("event_type", "lo", "hi").distinct()
    ev = events.where(F.col("value").isNotNull()).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    if ev.isStreaming:
        ev = ev.withWatermark("ts", watermark)
    return (
        ev.join(F.broadcast(bounds), "event_type")
        .select("ts", "event_type", _bin_expr().alias("bin"))
        .groupBy(F.window("ts", window), "event_type", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").cast("timestamp_ntz").alias("win_start"),
            "event_type",
            "bin",
            "n",
            F.date_format(F.col("window.start"), "yyyyMMdd").alias("day"),
        )
    )


def psi_report_from_counts(counts: DataFrame, profile: DataFrame) -> DataFrame:
    """(win_start, event_type, psi, n_cur, drifted) from the maintained
    counts table: densify over the bin grid, smooth, sum the PSI terms.
    Pure column algebra over a dashboard-sized input."""
    from pyspark.sql import Window

    grid = (
        counts.select("win_start", "event_type").distinct()
        .join(
            F.broadcast(
                counts.sparkSession.range(_PSI_BINS).select(
                    F.col("id").alias("bin")
                )
            )
        )
    )
    dense = grid.join(
        counts.select("win_start", "event_type", "bin", "n"),
        ["win_start", "event_type", "bin"],
        "left",
    ).select(
        "win_start",
        "event_type",
        "bin",
        F.coalesce(F.col("n"), F.lit(0)).alias("cnt"),
    )
    wtot = Window.partitionBy("win_start", "event_type")
    props = dense.select(
        "win_start",
        "event_type",
        "bin",
        F.sum("cnt").over(wtot).alias("n_cur"),
        (
            (F.col("cnt") + F.lit(0.5))
            / (F.sum("cnt").over(wtot) + F.lit(_SMOOTH))
        ).alias("p_cur"),
    )
    term = (F.col("p_cur") - F.col("p_ref")) * F.log(
        F.col("p_cur") / F.col("p_ref")
    )
    psi = F.round(F.sum(term), 6)
    return (
        props.join(
            F.broadcast(profile.select("event_type", "bin", "p_ref")),
            ["event_type", "bin"],
        )
        .groupBy("win_start", "event_type")
        .agg(
            F.max("n_cur").alias("n_cur"),
            psi.alias("psi"),
        )
        .withColumn("drifted", F.col("psi") > F.lit(0.1))
    )


def start_drift_monitor(
    events: DataFrame,
    profile: DataFrame,
    counts_dir: str,
    report_dir: str,
    checkpoint_dir: str,
    window: str = "1 day",
    trigger_seconds: float | None = None,
) -> StreamingQuery:
    """Wire the event stream → windowed bin counts → merged counts table
    → rewritten PSI report. ``profile`` is the frozen output of
    ``reference_profile`` (read it from storage in production)."""
    updates = windowed_bin_counts(events, profile, window=window)

    def _merge(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge_rollup(batch_df, counts_dir, keys=COUNT_KEY)
        spark = batch_df.sparkSession
        report = psi_report_from_counts(
            spark.read.parquet(counts_dir), profile
        )
        # dashboard-sized — rewrite whole, atomically enough for a report
        report.localCheckpoint(eager=True).write.mode("overwrite").parquet(
            report_dir
        )

    return (
        updates.writeStream.outputMode("update")
        .foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**_trigger_kwargs(trigger_seconds))
        .start()
    )
