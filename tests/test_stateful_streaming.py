"""Advanced streaming: arbitrary keyed state, stream-stream joins,
stream-static enrichment, multi-sink foreachBatch — each checked against
its batch twin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkstreaming_rawdataingestion_spark import catalog
from sparkstreaming_rawdataingestion_spark.streaming import stateful

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def event_stream_dir(spark, tmp_path_factory):
    """events staged as multiple parquet files so availableNow replays them
    across several micro-batches (state must survive batch boundaries)."""
    path = str(tmp_path_factory.mktemp("events_stream"))
    catalog.load_table(spark, SF, "events").repartition(5).write.mode(
        "overwrite"
    ).parquet(path)
    return path


def _read_stream(spark, path):
    schema = spark.read.parquet(path).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def test_stateful_running_totals_match_batch(spark, event_stream_dir, tmp_path):
    stream = _read_stream(spark, event_stream_dir)
    out = str(tmp_path / "totals")
    ckpt = str(tmp_path / "ckpt")
    q = (
        stateful.running_user_totals(stream)
        .writeStream.foreachBatch(
            # update-mode emissions appended per batch (parquet sink itself
            # rejects update mode)
            lambda df, _id: df.write.mode("append").parquet(out)
        )
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update-mode emissions: the LAST emission per user holds the final
    # running totals — must equal the batch aggregate
    got = spark.read.parquet(out)
    final = got.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max("total_value").alias("total_value"),
    )
    events = catalog.load_table(spark, SF, "events")
    want = events.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )
    g = {r["user_id"]: (r["n_events"], round(r["total_value"], 6))
         for r in final.collect()}
    w = {r["user_id"]: (r["n_events"], r["total_value"]) for r in want.collect()}
    assert set(g) == set(w)
    for k in w:
        assert g[k][0] == w[k][0]
        assert abs(g[k][1] - w[k][1]) < 1e-6


def test_stream_stream_join_matches_batch(spark, event_stream_dir, tmp_path):
    # single availableNow batch: the staged files are not time-ordered, so
    # multi-batch replay would (correctly) drop cross-batch late matches
    # via the watermark — ordered replay is a Kafka property, not a file
    # source one
    schema = spark.read.parquet(event_stream_dir).schema
    ev_stream = spark.readStream.schema(schema).parquet(event_stream_dir)
    purchases_s = ev_stream.where(F.col("event_type") == "purchase")
    clicks_s = ev_stream.where(F.col("event_type") == "click")
    out = str(tmp_path / "ssj")
    ckpt = str(tmp_path / "ssj_ckpt")
    q = (
        stateful.purchases_with_recent_clicks(purchases_s, clicks_s)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out)

    events = catalog.load_table(spark, SF, "events")
    p = events.where(F.col("event_type") == "purchase")
    c = events.where(F.col("event_type") == "click")
    want = stateful.purchases_with_recent_clicks(p, c)
    # streaming inner join may withhold matches still inside the watermark
    # at drain time; everything emitted must be correct, and the bulk of
    # the batch result must have been emitted
    got_set = set(map(tuple, got.collect()))
    want_set = set(map(tuple, want.collect()))
    assert got_set <= want_set
    assert len(got_set) >= len(want_set) * 0.9


def test_stream_static_enrichment(spark, event_stream_dir, tmp_path):
    """Stream-static join: no state, the static side is just re-planned
    per batch — the standard dim-enrichment pattern."""
    stream = _read_stream(spark, event_stream_dir)
    customers = catalog.load_table(spark, SF, "customer")
    enriched = stream.join(
        F.broadcast(customers),
        stream.user_id == customers.c_custkey,
        "inner",
    ).select("event_id", "user_id", "c_mktsegment")
    out = str(tmp_path / "enriched")
    q = (
        enriched.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    events = catalog.load_table(spark, SF, "events")
    want = events.join(
        customers, events.user_id == customers.c_custkey, "inner"
    ).count()
    assert spark.read.parquet(out).count() == want


def test_foreachbatch_multi_sink(spark, event_stream_dir, tmp_path):
    """One stream, two sinks per batch (raw + rollup) — the pattern that
    replaces the reference's second job (its debug print re-ran the whole
    pipeline; here the batch is computed once and reused)."""
    stream = _read_stream(spark, event_stream_dir)
    raw_path = str(tmp_path / "raw")
    agg_path = str(tmp_path / "agg")

    def two_sinks(batch_df, batch_id):
        batch_df.persist()
        try:
            batch_df.write.mode("append").parquet(raw_path)
            (
                batch_df.groupBy("event_type")
                .agg(F.count("*").alias("n"))
                .withColumn("batch_id", F.lit(batch_id))
                .write.mode("append")
                .parquet(agg_path)
            )
        finally:
            batch_df.unpersist()

    q = (
        stream.writeStream.foreachBatch(two_sinks)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    events = catalog.load_table(spark, SF, "events")
    assert spark.read.parquet(raw_path).count() == events.count()
    per_type = (
        spark.read.parquet(agg_path)
        .groupBy("event_type")
        .agg(F.sum("n").alias("n"))
    )
    want = {r["event_type"]: r["count"] for r in
            events.groupBy("event_type").count().collect()}
    got = {r["event_type"]: r["n"] for r in per_type.collect()}
    assert got == want
