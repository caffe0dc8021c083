"""Streaming bootstrap CI vs its batch twin — the per-replica state
must merge exactly across micro-batches, so the CI emitted after the
final batch equals the batch kernel's answer on the same rows."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from sparkstreaming_rawdataingestion_spark import catalog
from sparkstreaming_rawdataingestion_spark.operators import experiments
from sparkstreaming_rawdataingestion_spark.streaming import bootstrap_stream

D = datetime.datetime
SF = "/root/testdata/sf0.001"


def _run_stream(spark, src, collected):
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sums = bootstrap_stream.bootstrap_sums_stream(stream)

    def emit(batch_df, batch_id):
        row = bootstrap_stream.ci_of_batch(batch_df).collect()
        if row:
            collected.append((batch_id, row[0]))

    q = (
        sums.writeStream.outputMode("complete")
        .foreachBatch(emit)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_streamed_ci_converges_to_batch(spark, tmp_path):
    """Three micro-batches over the sf0.001 events: a CI is emitted per
    batch, and the LAST one equals the batch kernel bit-for-bit."""
    ev = catalog.load_table(spark, SF, "events").select("event_id", "value")
    src = str(tmp_path / "src")
    third = ev.count() // 3
    for part in (
        ev.where(F.col("event_id") % 3 == 0),
        ev.where(F.col("event_id") % 3 == 1),
        ev.where(F.col("event_id") % 3 == 2),
    ):
        part.coalesce(1).write.mode("append").parquet(src)
    assert third > 0

    collected: list = []
    _run_stream(spark, src, collected)
    assert len(collected) >= 1  # availableNow may fuse files, never skip
    want = experiments.q_bootstrap_mean_ci(spark, SF).collect()[0]
    got = collected[-1][1]
    assert got.n_replicas == want.n_replicas == experiments.BOOT_B
    assert got.boot_mean == want.boot_mean
    assert got.ci_lo == want.ci_lo
    assert got.ci_hi == want.ci_hi


def test_state_is_bounded_to_B_rows(spark, tmp_path):
    """The streaming state (= the complete-mode output) is exactly the
    B-row replica table no matter how much data flows through."""
    rows = [
        (i, 1, D(2024, 1, 1, 0, 0, i % 60), "m", float(i % 7), "{}")
        for i in range(500)
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp_ntz, "
        "event_type string, value double, props string",
    ).write.parquet(src)

    snapshots: list = []

    def emit(batch_df, batch_id):
        snapshots.append(batch_df.count())

    q = (
        bootstrap_stream.bootstrap_sums_stream(
            spark.readStream.schema(
                spark.read.parquet(src).schema
            ).parquet(src)
        )
        .writeStream.outputMode("complete")
        .foreachBatch(emit)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert snapshots and all(n == experiments.BOOT_B for n in snapshots)
