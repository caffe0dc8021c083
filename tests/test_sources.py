"""Source/sink format coverage: csv + json round trips with explicit
schemas, day-partition pruning on the datapoint sink, and the Kafka
builder's behavior in an environment without the connector."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkstreaming_rawdataingestion_spark import catalog, plans
from sparkstreaming_rawdataingestion_spark.operators.ingest import ingest_normalize
from sparkstreaming_rawdataingestion_spark.sinks import write_datapoints
from sparkstreaming_rawdataingestion_spark.sources import fixtures, kafka

SF = "/root/testdata/sf0.001"


def test_csv_roundtrip_preserves_values(spark, tmp_path):
    li = catalog.load_table(spark, SF, "lineitem").limit(500)
    path = str(tmp_path / "li_csv")
    (
        li.write.option("header", True)
        .option("timestampNTZFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .csv(path)
    )
    back = (
        spark.read.option("header", True)
        .option("timestampNTZFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .schema(li.schema)
        .csv(path)
    )
    assert back.schema == li.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, li.collect()))


def test_json_roundtrip_preserves_values(spark, tmp_path):
    ev = catalog.load_table(spark, SF, "events")
    path = str(tmp_path / "ev_json")
    fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"  # default truncates to millis
    ev.write.option("timestampNTZFormat", fmt).json(path)
    back = spark.read.option("timestampNTZFormat", fmt).schema(ev.schema).json(path)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, ev.collect()))


def test_day_partition_pruning(spark, tmp_path):
    """The sink's partitionBy('day') must produce a layout where a day
    predicate prunes at the metadata level — the engine's central 100 TB
    pruning mechanism (reference: Cassandra day bucketing)."""
    events = catalog.load_table(spark, SF, "events")
    dp_path = str(tmp_path / "dp")
    write_datapoints(
        ingest_normalize(fixtures.events_to_messages(events)), dp_path
    )
    dp = spark.read.parquet(dp_path)
    one_day = dp.where(F.col("day") == "20240115")
    plan = plans.formatted_plan(one_day)
    # partition filter present, and no pushed data filter needed for day
    assert "PartitionFilters" in plan
    assert any(
        "day" in line
        for line in plan.splitlines()
        if "PartitionFilters" in line
    ), plan
    assert one_day.count() > 0
    # pruned scan reads fewer files than the full table
    full_files = dp.select(F.input_file_name()).distinct().count()
    pruned_files = one_day.select(F.input_file_name()).distinct().count()
    assert pruned_files < full_files


def test_kafka_builder_without_connector(spark):
    """No Kafka jars ship in this container: the builder must fail with
    the standard missing-data-source error (and nothing stranger). In
    production the spark-sql-kafka package supplies the source; the plan
    shape downstream of CAST(value AS STRING) is identical to the file
    stand-in used everywhere in these tests."""
    with pytest.raises(Exception) as ei:
        kafka.kafka_value_stream(spark, "broker:9092", "t1,t2")
    msg = str(ei.value)
    assert "kafka" in msg.lower()


def test_dynamic_partition_pruning_on_day_join(spark, tmp_path):
    """Runtime partition pruning: joining the day-partitioned sink with a
    dimension filtered on a NON-key column must inject a dynamicpruning
    subquery on `day` — the fact scan reads only the days the (runtime)
    dim rows name. This is the 100 TB star-join path: a filter the
    optimizer cannot propagate statically still prunes partitions."""
    events = catalog.load_table(spark, SF, "events")
    dp_path = str(tmp_path / "dp")
    write_datapoints(
        ingest_normalize(fixtures.events_to_messages(events)), dp_path
    )
    dp = spark.read.parquet(dp_path)
    dim_path = str(tmp_path / "dim")
    dp.select("day").distinct().withColumn(
        "tag", F.when(F.col("day") == "20240115", "keep").otherwise("drop")
    ).write.parquet(dim_path)
    dim = spark.read.parquet(dim_path).where(F.col("tag") == "keep")
    joined = dp.join(dim, "day")
    assert "dynamicpruning" in plans.formatted_plan(joined).lower()
    assert joined.count() > 0
