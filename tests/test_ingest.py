"""Ingest-normalize parity tests (SURVEY §2.1 ops 3-11)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from sparkstreaming_rawdataingestion_spark import catalog
from sparkstreaming_rawdataingestion_spark.operators import ingest
from sparkstreaming_rawdataingestion_spark.schemas import DATAPOINT_SCHEMA
from sparkstreaming_rawdataingestion_spark.sinks import dedup_on_pk
from sparkstreaming_rawdataingestion_spark.sources import fixtures


def _messages(spark, sf_dir, edge=True):
    events = catalog.load_table(spark, sf_dir, "events")
    return events, fixtures.events_to_messages(events, include_edge_cases=edge)


def test_flagship_schema_and_rows(spark, sf_dir):
    events, messages = _messages(spark, sf_dir)
    out = ingest.ingest_normalize(messages)
    assert out.schema == DATAPOINT_SCHEMA
    # explode row-count == sum of array lengths == event count (SURVEY §5.2)
    assert out.count() == events.count()


def test_malformed_and_empty_messages_dropped(spark):
    df = spark.createDataFrame(
        [
            (fixtures.MALFORMED_MESSAGE,),
            (fixtures.EMPTY_DATA_MESSAGE,),
            ('{"datastream_id": 3, "data": [{"dateTime": 1704067200000, '
             '"offset": -90000, "sample": {"hr": 72}}]}',),
        ],
        "value string",
    )
    rows = ingest.ingest_normalize(df).collect()
    assert len(rows) == 1
    r = rows[0].asDict()
    assert r["datastream_id"] == 3
    assert r["day"] == "20240101"
    # -90000 ms div 60000 truncates toward zero → -1 (Java parity, op 8)
    assert r["offset"] == -1
    # opaque payload round-trip (op 9): compact JSON, content-identical
    assert json.loads(r["sample"]) == {"hr": 72}


def test_offset_truncation_matrix(spark):
    cases = [(-119999, -1), (-60000, -1), (-59999, 0), (0, 0), (59999, 0),
             (60000, 1), (119999, 1), (-120000, -2)]
    data = [
        ('{"datastream_id": 1, "data": [{"dateTime": 1704067200000, '
         f'"offset": {ms}, "sample": 1}}]}}',)
        for ms, _ in cases
    ]
    out = ingest.ingest_normalize(
        spark.createDataFrame(data, "value string")
    ).select("offset").collect()
    assert [r["offset"] for r in out] == [want for _, want in cases]


def test_day_boundary(spark):
    # 2023-12-31T23:59:59.999Z and +1ms land in different buckets
    df = spark.createDataFrame(
        [('{"datastream_id": 1, "data": ['
          '{"dateTime": 1704067199999, "offset": 0, "sample": 1},'
          '{"dateTime": 1704067200000, "offset": 0, "sample": 1}]}',)],
        "value string",
    )
    days = sorted(
        r["day"] for r in ingest.ingest_normalize(df).select("day").collect()
    )
    assert days == ["20231231", "20240101"]


def test_idempotent_reingest(spark, sf_dir):
    """Reference's at-least-once + Cassandra-upsert contract: re-ingesting
    the same data leaves the table unchanged (RawDataIngestion.java:152)."""
    _, messages = _messages(spark, sf_dir)
    once = dedup_on_pk(ingest.ingest_normalize(messages))
    twice = dedup_on_pk(ingest.ingest_normalize(messages.unionAll(messages)))
    # (exceptAll over two plans sharing lineage trips a Catalyst
    # self-reference bug in Spark 4.1; compare collected multisets instead)
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_opaque_payload_arbitrary_json(spark):
    """Op 9: nested objects, arrays, scalars all survive as opaque strings.

    Documented divergence from Gson's ``JsonElement.toString()``: a JSON
    *string* payload is captured as its content (``s``), not its quoted
    literal (``"s"``) — Spark's parser reads VALUE_STRING tokens directly.
    All non-string payloads round-trip as compact JSON.
    """
    samples = ['{"a":{"b":[1,2,{"c":null}]}}', "[1,2,3]", "7", "true", '"s"']
    data = [
        ('{"datastream_id": 1, "data": [{"dateTime": 0, "offset": 0, '
         f'"sample": {s}}}]}}',)
        for s in samples
    ]
    out = ingest.ingest_normalize(
        spark.createDataFrame(data, "value string")
    ).select("sample").collect()
    got = [r["sample"] for r in out]
    assert [json.loads(g) for g in got[:4]] == [json.loads(s) for s in samples[:4]]
    assert got[4] == "s"


def test_ingest_plan_is_shuffle_free(spark, sf_dir):
    """Scale invariant: the normalize pipeline must contain no exchange
    (same zero-shuffle profile as the reference, SURVEY §3.3)."""
    df = spark.createDataFrame([("x",)], "value string")
    plan = ingest.ingest_normalize(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_observed_ingest_counts_drops_in_the_same_job(spark):
    """df.observe rides the ingest job itself (no second pass): the
    malformed and empty-array fixtures must show up in n_dropped/n_parsed
    exactly, and n_messages must equal the input count."""
    from sparkstreaming_rawdataingestion_spark.operators.ingest import (
        observed_ingest_normalize,
    )
    from sparkstreaming_rawdataingestion_spark.sources import fixtures

    messages = fixtures.cached_messages(
        spark, "/root/testdata/sf0.001", include_edge_cases=True
    )
    n_in = messages.count()
    dp, obs = observed_ingest_normalize(messages)
    dp.write.format("noop").mode("overwrite").save()
    got = obs.get
    assert got["n_messages"] == n_in
    # the two edge-case messages: one malformed JSON (null data), one
    # empty array (parses fine, explodes to zero rows)
    assert got["n_dropped"] == 1
    assert got["n_parsed"] == n_in - 1
