"""Incremental continuous-aggregate maintenance — the streaming twin of
``operators/profiling.py::rollup_time_hierarchy``.

A materialized hourly rollup (per-datastream datapoint counts, the
rollup a sensor platform serves dashboards from) is kept up to date by
the message stream itself: the windowed aggregation runs in UPDATE output
mode, so each micro-batch emits **absolute totals** for every (hour,
datastream) the batch touched — not deltas — straight from the
watermark-bounded state store. The foreachBatch merge then *replaces*
those keys in the day-partitioned rollup table. Replace-not-add makes
replays and foreachBatch retries idempotent by construction (the same
totals overwrite themselves), the same guarantee the ingest upsert sink
gives (sinks.py; reference parity: RawDataIngestion.java:152).

Scale notes: state is keyed by (hour window, datastream) and bounded by
the watermark; the merge rewrites only the day partitions the batch
touched (dynamic partition overwrite + partition pruning on the read
side), so maintenance cost follows batch activity, not table size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.ingest import ingest_normalize
from .ingest_stream import _trigger_kwargs
from .windows import DEFAULT_WATERMARK

ROLLUP_KEY = ("datastream_id", "hour_start")


def hourly_rollup(datapoints: DataFrame) -> DataFrame:
    """(datastream_id, hour) datapoint counts — batch or streaming."""
    dp = datapoints.withColumn("ts", F.col("datetime").cast("timestamp"))
    if dp.isStreaming:
        dp = dp.withWatermark("ts", DEFAULT_WATERMARK)
    return (
        dp.groupBy(F.window("ts", "1 hour"), "datastream_id")
        .agg(F.count("*").alias("n_points"))
        .select(
            "datastream_id",
            F.col("window.start").cast("timestamp_ntz").alias("hour_start"),
            "n_points",
            F.date_format(F.col("window.start"), "yyyyMMdd").alias("day"),
        )
    )


def merge_rollup(
    updates: DataFrame, rollup_dir: str, keys: tuple[str, ...] = ROLLUP_KEY
) -> None:
    """Replace updated ``keys`` rows in a day-partitioned materialized
    table, rewriting only the touched day partitions (generic replace
    merge — also the maintenance kernel for drift_stream's counts)."""
    spark = updates.sparkSession
    from pyspark.errors import AnalysisException

    try:
        existing: DataFrame | None = spark.read.parquet(rollup_dir)
    except AnalysisException as ex:
        cls = ""
        getter = getattr(ex, "getCondition", None) or ex.getErrorClass
        try:
            cls = getter() or ""
        except Exception:
            pass
        if "PATH_NOT_FOUND" not in cls and "PATH_NOT_FOUND" not in str(ex):
            raise
        existing = None

    out = updates
    if existing is not None:
        touched_days = updates.select("day").distinct()
        kept = (
            existing.join(F.broadcast(touched_days), "day", "left_semi")
            .join(updates, list(keys), "left_anti")
        )
        out = kept.select(*updates.columns).unionByName(updates)
    # Materialize before overwriting: the merge reads the same files the
    # write replaces. localCheckpoint(eager) is correct here — this is a
    # per-micro-batch cut inside foreachBatch, and a failed batch is
    # retried from the checkpoint with the same absolute totals, so
    # replace-semantics idempotency (not block durability) carries the
    # exactly-once guarantee.
    out = out.localCheckpoint(eager=True)
    (
        out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("day")
        .parquet(rollup_dir)
    )


def start_rollup_maintenance(
    messages: DataFrame,
    rollup_dir: str,
    checkpoint_dir: str,
    trigger_seconds: float | None = None,
) -> StreamingQuery:
    """Wire the message stream → normalize → hourly totals → merge."""
    updates = hourly_rollup(ingest_normalize(messages))

    def _merge(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge_rollup(batch_df, rollup_dir)

    return (
        updates.writeStream.outputMode("update")
        .foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**_trigger_kwargs(trigger_seconds))
        .start()
    )
