"""Streaming CUSUM vs its batch twin — with the baseline (μ, σ) trained
from the same history, the streamed recurrence must reproduce the batch
operator's per-user summary under micro-batch slicing; late events are
dropped, not folded."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from sparkstreaming_rawdataingestion_spark import catalog
from sparkstreaming_rawdataingestion_spark.operators import segments
from sparkstreaming_rawdataingestion_spark.streaming import cusum_stream

D = datetime.datetime
SF = "/root/testdata/sf0.001"


def _run_stream(spark, src, out, ckpt, baseline):
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        cusum_stream.cusum_stream(stream, baseline)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_streamed_cusum_matches_batch_twin(spark, tmp_path):
    """Events split into three time-ordered micro-batch files: per-user
    max CUSUM / alarm counts / first alarm equal the batch operator."""
    ev = catalog.load_table(spark, SF, "events").select(
        "user_id", "event_id", "ts", "value"
    )
    baseline = ev.groupBy("user_id").agg(
        F.round(F.avg("value"), 6).alias("mu"),
        F.round(F.stddev_pop("value"), 6).alias("sd"),
    )
    src = str(tmp_path / "src")
    cuts = ("2024-01-08 00:00:00", "2024-01-17 00:00:00")
    lo = F.lit(cuts[0]).cast("timestamp_ntz")
    hi = F.lit(cuts[1]).cast("timestamp_ntz")
    for part in (
        ev.where(F.col("ts") < lo),
        ev.where((F.col("ts") >= lo) & (F.col("ts") < hi)),
        ev.where(F.col("ts") >= hi),
    ):
        part.coalesce(1).write.mode("append").parquet(src)

    out = str(tmp_path / "out")
    _run_stream(spark, src, out, str(tmp_path / "ckpt"), baseline)

    streamed = spark.read.parquet(out)
    got = {
        r.user_id: (r.max_cusum, r.n_alarm_points, r.first_alarm_event_id)
        for r in streamed.groupBy("user_id")
        .agg(
            F.max("cusum").alias("max_cusum"),
            F.count(F.when(F.col("alarm"), 1)).alias("n_alarm_points"),
            F.min(F.when(F.col("alarm"), F.col("event_id"))).alias(
                "first_alarm_event_id"
            ),
        )
        .collect()
    }
    want = {
        r.user_id: (r.max_cusum, r.n_alarm_points, r.first_alarm_event_id)
        for r in segments.q_cusum_changepoint(spark, SF).collect()
    }
    assert got == want  # same recurrence, same rounding — exact equality


def test_late_event_dropped_and_unmonitored_key_ignored(spark, tmp_path):
    rows1 = [
        (1, 1, D(2024, 1, 1, 0, 0, 1), 10.0),
        (2, 1, D(2024, 1, 1, 0, 10, 0), 20.0),
        (10, 9, D(2024, 1, 1, 0, 0, 1), 5.0),   # user 9: no baseline row
    ]
    rows2 = [
        (3, 1, D(2024, 1, 1, 0, 5, 0), 99.0),   # LATE — before event 2
        (4, 1, D(2024, 1, 1, 0, 20, 0), 30.0),
    ]
    schema = "event_id long, user_id long, ts timestamp_ntz, value double"
    src = str(tmp_path / "src")
    for rows in (rows1, rows2):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    baseline = spark.createDataFrame(
        [(1, 10.0, 2.0)], "user_id long, mu double, sd double"
    )
    out = str(tmp_path / "out")
    _run_stream(spark, src, out, str(tmp_path / "ckpt"), baseline)
    got = {r.event_id: r for r in spark.read.parquet(out).collect()}
    # user 9 unmonitored; late event 3 dropped
    assert set(got) == {1, 2, 4}
    # k = sd/2 = 1: s1 = max(0, 10-10-1) = 0; s2 = max(0, 0+20-11) = 9
    # s4 = max(0, 9+30-11) = 28; alarm threshold 4*sd = 8
    assert got[1].cusum == 0.0 and not got[1].alarm
    assert got[2].cusum == 9.0 and got[2].alarm
    assert got[4].cusum == 28.0 and got[4].alarm
