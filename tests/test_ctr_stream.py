"""Streaming Wilson CTR vs its batch twin — finalized windows must
reproduce the batch query's daily rows exactly (same wilson_cols
expressions, so any drift is a wiring bug)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from sparkstreaming_rawdataingestion_spark import catalog
from sparkstreaming_rawdataingestion_spark.operators import evaluation
from sparkstreaming_rawdataingestion_spark.streaming import ctr_stream

D = datetime.datetime
SF = "/root/testdata/sf0.001"


def _run(spark, src, out, ckpt):
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        ctr_stream.ctr_wilson_stream(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_streamed_wilson_matches_batch_on_finalized_days(spark, tmp_path):
    """Three time-ordered micro-batches over sf0.001: every emitted day
    equals the batch row for that day bit-for-bit, every day strictly
    before the final watermark is emitted, and no day emits twice."""
    ev = catalog.load_table(spark, SF, "events").select(
        "event_id", "ts", "event_type"
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
    _run(spark, src, out, str(tmp_path / "ckpt"))

    got = {
        str(r.day): (r.n_trials, r.n_success, r.p_hat, r.wilson_lo, r.wilson_hi)
        for r in spark.read.parquet(out).collect()
    }
    want = {
        str(r.day): (r.n_trials, r.n_success, r.p_hat, r.wilson_lo, r.wilson_hi)
        for r in evaluation.q_ctr_wilson_bounds(spark, SF).collect()
    }
    # emitted ⊆ batch, value-exact
    for day, row in got.items():
        assert want[day] == row
    # duplicates would break the ⊆-with-dict check only silently — pin it
    n_rows = spark.read.parquet(out).count()
    assert n_rows == len(got)
    # completeness: every day that surely finalized (strictly before the
    # final watermark = max ts − 1 h, minus a safety margin) is present
    max_ts = ev.agg(F.max("ts")).first()[0]
    wm = max_ts - datetime.timedelta(hours=1)
    surely_final = {
        d for d in want
        if datetime.datetime.fromisoformat(d + "T23:59:59.999999")
        < wm - datetime.timedelta(minutes=1)
    }
    assert surely_final <= set(got)


def test_ctr_stream_checkpoint_restart_no_duplicate_days(spark, tmp_path):
    """Stop after the first two files, restart against the same
    checkpoint with a third: finalized days emit exactly once across
    the two runs and still match the batch rows."""
    ev = catalog.load_table(spark, SF, "events").select(
        "event_id", "ts", "event_type"
    )
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    cuts = ("2024-01-08 00:00:00", "2024-01-17 00:00:00")
    lo = F.lit(cuts[0]).cast("timestamp_ntz")
    hi = F.lit(cuts[1]).cast("timestamp_ntz")
    ev.where(F.col("ts") < lo).coalesce(1).write.mode("append").parquet(src)
    ev.where((F.col("ts") >= lo) & (F.col("ts") < hi)).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _run(spark, src, out, ckpt)  # first run: two files

    ev.where(F.col("ts") >= hi).coalesce(1).write.mode("append").parquet(src)
    _run(spark, src, out, ckpt)  # restart: third file only

    rows = spark.read.parquet(out).collect()
    days = [str(r.day) for r in rows]
    assert len(days) == len(set(days)), f"duplicate day emissions: {days}"
    want = {
        str(r.day): (r.n_trials, r.n_success, r.wilson_lo, r.wilson_hi)
        for r in evaluation.q_ctr_wilson_bounds(spark, SF).collect()
    }
    for r in rows:
        assert want[str(r.day)] == (
            r.n_trials, r.n_success, r.wilson_lo, r.wilson_hi
        )
