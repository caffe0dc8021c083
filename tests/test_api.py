"""Engine facade + UDF-surface tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkstreaming_rawdataingestion_spark.api import Engine
from sparkstreaming_rawdataingestion_spark.operators import udfs
from sparkstreaming_rawdataingestion_spark.sources import fixtures

SF01 = "/root/testdata/sf0.01"


def test_sql_frontend(spark, sf_dir):
    eng = Engine(spark, sf_dir)
    eng.register_views()
    n = eng.sql("SELECT count(*) AS n FROM lineitem").first()["n"]
    assert n == 6000
    joined = eng.sql(
        """
        SELECT r_name, count(*) AS n FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
        """
    )
    assert joined.count() == 5


def test_engine_batch_ingest_roundtrip(spark, sf_dir, tmp_path):
    eng = Engine(spark, sf_dir)
    messages = fixtures.events_to_messages(eng.table("events"))
    out = str(tmp_path / "dp")
    eng.ingest_to_table(messages, out)
    dp = spark.read.parquet(out)
    assert dp.count() == eng.table("events").count()
    assert set(dp.columns) == {"datastream_id", "day", "datetime", "offset", "sample"}
    # day partitioning materialized on disk
    assert any(p.name.startswith("day=") for p in (tmp_path / "dp").iterdir())


def test_engine_stream_facade(spark, sf_dir, tmp_path):
    eng = Engine(spark, sf_dir)
    msg_dir = str(tmp_path / "msgs")
    fixtures.write_message_files(eng.table("events"), msg_dir)
    q = eng.ingest_stream(
        msg_dir,
        str(tmp_path / "sink"),
        str(tmp_path / "ckpt"),
        trigger_seconds=None,  # availableNow drain
    )
    q.awaitTermination()
    assert spark.read.parquet(str(tmp_path / "sink")).count() == eng.table(
        "events"
    ).count()


def test_approx_sketches_within_tolerance(spark):
    rows = udfs.q_udf_approx_sketches(spark, SF01).collect()
    for r in rows:
        err = abs(r["approx_customers"] - r["exact_customers"]) / max(
            r["exact_customers"], 1
        )
        assert err < 0.05, f"HLL error {err:.3f} too large"
        assert r["price_p50"] <= r["price_p95"] <= r["price_p99"]


def test_cli_entrypoint_available_now(spark, sf_dir, tmp_path):
    """The reference-job CLI: drain fixture messages once, exit 0, output
    equals the event count."""
    from sparkstreaming_rawdataingestion_spark.__main__ import main

    msg_dir = str(tmp_path / "msgs")
    fixtures.write_message_files(
        Engine(spark, sf_dir).table("events"), msg_dir
    )
    sink = str(tmp_path / "cli_sink")
    rc = main([sink, msg_dir, "--available-now"])
    assert rc == 0
    n = spark.read.parquet(sink).count()
    assert n == Engine(spark, sf_dir).table("events").count()


def test_udtf_sentence_split_fans_out_with_contiguous_positions(spark):
    out = udfs.QUERIES["udtf_sentence_split"](spark, SF01)
    rows = out.collect()
    n_docs = len({r.doc_id for r in rows})
    assert len(rows) > n_docs  # genuine 1→N generation
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.pos)
    for positions in by_doc.values():
        assert sorted(positions) == list(range(len(positions)))
    assert all(r.n_words >= 1 and r.sentence for r in rows)


def test_engine_named_queries_and_compact(spark, tmp_path):
    from pyspark.sql import functions as F

    from sparkstreaming_rawdataingestion_spark.api import Engine

    eng = Engine(spark, sf_dir="/root/testdata/sf0.001")
    assert "ingest_normalize" in eng.query_names()
    assert eng.query("dedup_exact_hash").count() > 0

    sink = str(tmp_path / "dp")
    df = spark.range(100).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 2).cast("string").alias("day"),
    )
    for _ in range(2):
        df.repartition(5).write.partitionBy("day").mode("append").parquet(sink)
    eng.compact(sink, target_files=1)
    import os

    files = [
        f for f in os.listdir(os.path.join(sink, "day=0"))
        if f.endswith(".parquet")
    ]
    assert len(files) <= 1


def test_engine_bootstrap_ci_stream_facade(spark, tmp_path):
    """The facade's streaming bootstrap returns the B-row replica state
    and ci_of_batch reduces an emission to the batch kernel's answer."""
    from pyspark.sql import functions as F

    from sparkstreaming_rawdataingestion_spark.api import Engine
    from sparkstreaming_rawdataingestion_spark.operators.experiments import (
        BOOT_B,
    )
    from sparkstreaming_rawdataingestion_spark.streaming import (
        bootstrap_stream,
    )

    src = str(tmp_path / "src")
    spark.range(50).select(
        F.col("id").alias("event_id"), F.lit(3.5).alias("value")
    ).write.parquet(src)

    eng = Engine(spark)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(
        src
    )
    out: list = []

    q = (
        eng.bootstrap_ci_stream(stream)
        .writeStream.outputMode("complete")
        .foreachBatch(
            lambda df, _id: out.append(
                bootstrap_stream.ci_of_batch(df).collect()[0]
            )
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert out and out[-1].n_replicas == BOOT_B
    assert out[-1].boot_mean == 3.5


def test_engine_ctr_wilson_stream_facade(spark, tmp_path):
    """The facade's streaming CTR monitor wires the batch formula onto
    a windowed streaming aggregation (isStreaming, batch-shaped schema)."""
    from sparkstreaming_rawdataingestion_spark.api import Engine

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, 1, __import__("datetime").datetime(2024, 1, 1), "click", 0.0, "{}")],
        "event_id long, user_id long, ts timestamp_ntz, "
        "event_type string, value double, props string",
    ).write.parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(
        src
    )
    df = Engine(spark).ctr_wilson_stream(stream)
    assert df.isStreaming
    assert set(df.columns) == {
        "day", "n_trials", "n_success", "p_hat", "wilson_lo", "wilson_hi",
    }


def test_cli_entrypoint_sim_broker(spark, sf_dir, tmp_path):
    """The reference job from the CLI against the simulated broker — the
    complete spark-submit story with zero infrastructure: produce fixture
    messages to topic logs, run `python -m ... SINK datapoints
    --sim-log-dir LOG --available-now`, output equals one batch
    normalize."""
    from sparkstreaming_rawdataingestion_spark.__main__ import main
    from sparkstreaming_rawdataingestion_spark.operators import ingest
    from sparkstreaming_rawdataingestion_spark.sources import kafka_sim

    log = str(tmp_path / "log")
    messages = fixtures.events_to_messages(
        Engine(spark, sf_dir).table("events"), include_edge_cases=True
    )
    values = [r["value"] for r in messages.collect()]
    kafka_sim.produce(log, "datapoints", values[0::2], 0)
    kafka_sim.produce(log, "datapoints", values[1::2], 1)

    sink = str(tmp_path / "cli_sim_sink")
    rc = main([sink, "datapoints", "--sim-log-dir", log, "--available-now"])
    assert rc == 0
    got = spark.read.parquet(sink)
    want = ingest.ingest_normalize(messages)
    cols = sorted(want.columns)
    assert sorted(got.columns) == cols
    assert sorted(map(tuple, got.select(*cols).collect())) == sorted(
        map(tuple, want.select(*cols).collect())
    )
