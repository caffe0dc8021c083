"""Streaming funnel vs its batch twin — greedy stage minima carried as
keyed state must reproduce the batch min-chain exactly under micro-batch
slicing; completions emit once and are final."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from sparkstreaming_rawdataingestion_spark import catalog
from sparkstreaming_rawdataingestion_spark.operators import behavior
from sparkstreaming_rawdataingestion_spark.streaming import funnel_stream

D = datetime.datetime
SF = "/root/testdata/sf0.001"


def _run_stream(spark, src, out, ckpt):
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        funnel_stream.funnel_stream(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_streamed_funnel_matches_batch_twin(spark, tmp_path):
    ev = catalog.load_table(spark, SF, "events").select(
        "user_id", "event_id", "ts", "event_type"
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
    _run_stream(spark, src, out, str(tmp_path / "ckpt"))

    got = {
        r.user_id: (r.t_view, r.t_click, r.t_purchase, r.funnel_sec)
        for r in spark.read.parquet(out).collect()
    }
    want = {
        r.user_id: (r.t_view, r.t_click, r.t_purchase, r.funnel_sec)
        for r in behavior.q_funnel_pattern_match(spark, SF).collect()
    }
    assert got == want


def test_funnel_stream_strict_order_and_single_emission(spark, tmp_path):
    """Stage ties don't advance the funnel; a second purchase emits
    nothing (completion is final)."""
    rows1 = [
        (1, 1, D(2024, 1, 1, 0, 0, 1), "view"),
        (2, 1, D(2024, 1, 1, 0, 0, 1), "click"),      # tie — not after view
        (3, 1, D(2024, 1, 1, 0, 0, 5), "click"),      # qualifies
        (4, 2, D(2024, 1, 1, 0, 0, 1), "purchase"),   # wrong order user
        (5, 2, D(2024, 1, 1, 0, 0, 2), "view"),
    ]
    rows2 = [
        (6, 1, D(2024, 1, 1, 0, 1, 0), "purchase"),   # completes funnel
        (7, 1, D(2024, 1, 1, 0, 2, 0), "purchase"),   # must NOT re-emit
        (8, 2, D(2024, 1, 1, 0, 0, 9), "click"),
    ]
    schema = (
        "event_id long, user_id long, ts timestamp_ntz, event_type string"
    )
    src = str(tmp_path / "src")
    for rows in (rows1, rows2):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    out = str(tmp_path / "out")
    _run_stream(spark, src, out, str(tmp_path / "ckpt"))
    got = spark.read.parquet(out).collect()
    assert len(got) == 1
    r = got[0]
    assert r.user_id == 1
    assert r.t_click == D(2024, 1, 1, 0, 0, 5)
    assert r.t_purchase == D(2024, 1, 1, 0, 1, 0)
    assert r.funnel_sec == 59
