"""Streaming eval monitor vs a batch recomputation of the same windowed
confusion tableau — finalized windows must agree exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkstreaming_rawdataingestion_spark import catalog
from sparkstreaming_rawdataingestion_spark.streaming import eval_stream

SF = "/root/testdata/sf0.001"


def test_streamed_windows_match_batch_recomputation(spark, tmp_path):
    ev = catalog.load_table(spark, SF, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    threshold = ev.agg(
        F.percentile("value", F.lit(0.5)).alias("m")
    ).first().m

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

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = str(tmp_path / "out")
    q = (
        eval_stream.eval_stream(stream, threshold)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        r.window_start: (r.tp, r.fp, r.fn, r.tn, r.precision_, r.recall_)
        for r in spark.read.parquet(out).collect()
    }
    y = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    yhat = F.when(F.col("value") >= threshold, 1).otherwise(0)
    batch = (
        ev.select(F.date_trunc("day", "ts").alias("d"), y.alias("y"),
                  yhat.alias("yhat"))
        .groupBy("d")
        .agg(
            F.sum(F.col("y") * F.col("yhat")).alias("tp"),
            F.sum((1 - F.col("y")) * F.col("yhat")).alias("fp"),
            F.sum(F.col("y") * (1 - F.col("yhat"))).alias("fn"),
            F.sum((1 - F.col("y")) * (1 - F.col("yhat"))).alias("tn"),
        )
        .collect()
    )
    want = {}
    for r in batch:
        p = round(r.tp / (r.tp + r.fp), 6) if (r.tp + r.fp) else None
        rec = round(r.tp / (r.tp + r.fn), 6) if (r.tp + r.fn) else None
        want[r.d] = (r.tp, r.fp, r.fn, r.tn, p, rec)
    # append mode emits only windows the watermark closed: every emitted
    # window must match the batch truth, and most windows must be final
    # (availableNow drains the source, leaving only the tail open)
    assert got
    for k, v in got.items():
        assert want[k] == v, k
    assert len(got) >= len(want) - 1
