"""Stateful-monitor stream-vs-batch parity at 10× the fixture scale
(round-4 verdict item 8): the sf0.001 parity suites prove the
recurrences; these re-run the same exact-equality contracts at sf0.01
(~60k events, thousands of keys), where state-handoff bugs that a tiny
key set can mask — per-key batch boundaries landing mid-tie, keys whose
whole history spans one micro-batch — actually occur."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkstreaming_rawdataingestion_spark import catalog
from sparkstreaming_rawdataingestion_spark.operators import (
    behavior,
    mining,
    segments,
    signals,
)
from sparkstreaming_rawdataingestion_spark.streaming import (
    cusum_stream,
    debounce_stream,
    ewma_stream,
    funnel_stream,
)

SF = "/root/testdata/sf0.01"
_CUTS = ("2024-01-08 00:00:00", "2024-01-17 00:00:00")


def _as_batches(spark, df, src):
    """Write three time-ordered micro-batch files (same slicing as the
    sf0.001 suites)."""
    lo = F.lit(_CUTS[0]).cast("timestamp_ntz")
    hi = F.lit(_CUTS[1]).cast("timestamp_ntz")
    for part in (
        df.where(F.col("ts") < lo),
        df.where((F.col("ts") >= lo) & (F.col("ts") < hi)),
        df.where(F.col("ts") >= hi),
    ):
        part.coalesce(1).write.mode("append").parquet(src)


def _run(spark, src, out, ckpt, build):
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        build(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_ewma_parity_sf01(spark, tmp_path):
    ev = catalog.load_table(spark, SF, "events").select(
        "user_id", "event_id", "ts", "value"
    )
    src = str(tmp_path / "src")
    _as_batches(spark, ev, src)
    out = str(tmp_path / "out")
    _run(spark, src, out, str(tmp_path / "ckpt"), ewma_stream.ewma_stream)
    got = {
        (r.user_id, r.event_id): r.ewma
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r.user_id, r.event_id): r.ewma
        for r in mining.q_ewma_smoothing(spark, SF).collect()
    }
    assert got == want


def test_cusum_parity_sf01(spark, tmp_path):
    ev = catalog.load_table(spark, SF, "events").select(
        "user_id", "event_id", "ts", "value"
    )
    baseline = ev.groupBy("user_id").agg(
        F.round(F.avg("value"), 6).alias("mu"),
        F.round(F.stddev_pop("value"), 6).alias("sd"),
    )
    src = str(tmp_path / "src")
    _as_batches(spark, ev, src)
    out = str(tmp_path / "out")
    _run(
        spark,
        src,
        out,
        str(tmp_path / "ckpt"),
        lambda s: cusum_stream.cusum_stream(s, baseline),
    )
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
    assert got == want


def test_debounce_parity_sf01(spark, tmp_path):
    ev = catalog.load_table(spark, SF, "events").select(
        "user_id", "event_type", "event_id", "ts"
    )
    src = str(tmp_path / "src")
    _as_batches(spark, ev, src)
    out = str(tmp_path / "out")
    _run(
        spark, src, out, str(tmp_path / "ckpt"),
        debounce_stream.debounce_stream,
    )
    got = {r.event_id for r in spark.read.parquet(out).collect()}
    want = {
        r.first_event_id
        for r in signals.q_debounce_events(spark, SF).collect()
    }
    assert got == want


def test_funnel_parity_sf01(spark, tmp_path):
    ev = catalog.load_table(spark, SF, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    src = str(tmp_path / "src")
    _as_batches(spark, ev, src)
    out = str(tmp_path / "out")
    _run(
        spark, src, out, str(tmp_path / "ckpt"), funnel_stream.funnel_stream
    )
    got = {
        r.user_id: (r.t_view, r.t_click, r.t_purchase, r.funnel_sec)
        for r in spark.read.parquet(out).collect()
    }
    want = {
        r.user_id: (r.t_view, r.t_click, r.t_purchase, r.funnel_sec)
        for r in behavior.q_funnel_pattern_match(spark, SF).collect()
    }
    assert got == want
