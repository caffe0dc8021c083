"""Ingest robustness: unicode, nulls, large arrays, boundary values —
inputs a real sensor/Kafka feed will eventually contain."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from sparkstreaming_rawdataingestion_spark.operators import ingest


def _msg(datastream_id=1, data=None):
    return json.dumps({"datastream_id": datastream_id, "data": data or []})


def test_unicode_payload_roundtrip(spark):
    payloads = [{"txt": "héllo wörld"}, {"zh": "传感器"}, {"emoji": "🌡️"}]
    rows = [
        (_msg(data=[{"dateTime": 0, "offset": 0, "sample": p}]),)
        for p in payloads
    ]
    out = ingest.ingest_normalize(
        spark.createDataFrame(rows, "value string")
    ).select("sample").collect()
    assert [json.loads(r["sample"]) for r in out] == payloads


def test_null_fields_inside_elements(spark):
    """Null dateTime/offset/sample inside an element must not kill the
    batch: the row survives with null columns (the reference NPE'd)."""
    rows = [(_msg(data=[{"dateTime": None, "offset": None, "sample": None}]),)]
    out = ingest.ingest_normalize(
        spark.createDataFrame(rows, "value string")
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["datetime"] is None and r["offset"] is None and r["sample"] is None


def test_null_and_empty_values(spark):
    df = spark.createDataFrame(
        [(None,), ("",), ("   ",), ("null",), ("[]",)], "value string"
    )
    assert ingest.ingest_normalize(df).count() == 0


def test_large_array_flatten(spark):
    data = [
        {"dateTime": 1704067200000 + i * 1000, "offset": 0, "sample": i}
        for i in range(5000)
    ]
    out = ingest.ingest_normalize(
        spark.createDataFrame([(_msg(data=data),)], "value string")
    )
    assert out.count() == 5000


def test_epoch_boundaries(spark):
    cases = [
        (0, "19700101"),
        (-1, "19691231"),  # 1ms before epoch
        (253402300799999, "99991231"),  # end of year 9999
    ]
    rows = [
        (_msg(data=[{"dateTime": ms, "offset": 0, "sample": 1}]),)
        for ms, _ in cases
    ]
    out = ingest.ingest_normalize(
        spark.createDataFrame(rows, "value string")
    ).select("day").collect()
    assert [r["day"] for r in out] == [d for _, d in cases]


def test_extra_unknown_fields_ignored(spark):
    """Schema-on-read: unknown top-level and element fields are dropped,
    not errors (forward compatibility for evolving producers)."""
    msg = json.dumps(
        {
            "datastream_id": 9,
            "unknown_top": {"a": 1},
            "data": [
                {"dateTime": 0, "offset": 0, "sample": 1, "extra": "x"}
            ],
        }
    )
    out = ingest.ingest_normalize(
        spark.createDataFrame([(msg,)], "value string")
    ).collect()
    assert len(out) == 1
    assert out[0]["datastream_id"] == 9


def test_events_ts_load_is_session_timezone_independent(spark, tmp_path):
    """ADVICE r3: the LTZ→NTZ conversion in catalog.load_table must yield
    the UTC wall clock whatever spark.sql.session.timeZone is — a bare
    driver session on a non-UTC host must read the same naive timestamps
    DuckDB does."""
    import datetime
    import os

    from sparkstreaming_rawdataingestion_spark import catalog

    sf = str(tmp_path)
    base = datetime.datetime(2024, 3, 9, 12, 34, 56, 789000)  # spans US DST
    rows = [(i, base + datetime.timedelta(hours=i * 7)) for i in range(8)]
    # write an LTZ (plain timestamp) events table — the generator-variant
    # path that triggers the elif cast branch
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.createDataFrame(rows, "event_id long, ts timestamp").write.mode(
            "overwrite"
        ).parquet(os.path.join(sf, "events.parquet"))
        utc_read = {
            r.event_id: r.ts
            for r in catalog.load_table(spark, sf, "events").collect()
        }
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        ny_read = {
            r.event_id: r.ts
            for r in catalog.load_table(spark, sf, "events").collect()
        }
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
    assert ny_read == utc_read == dict(rows)


def test_schema_evolution_merge_read(spark, tmp_path):
    """Schema evolution across parquet generations: a v2 writer adds a
    column; mergeSchema reads both generations with NULLs backfilled —
    the contract that lets the day-partitioned sink evolve without
    rewriting history."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, payload string"
    ).write.mode("append").parquet(path)
    spark.createDataFrame(
        [(3, "c", 0.9)], "id long, payload string, quality double"
    ).write.mode("append").parquet(path)

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"id", "payload", "quality"}
    rows = {r.id: r for r in merged.collect()}
    assert rows[1].quality is None and rows[2].quality is None
    assert rows[3].quality == 0.9
    # old readers projecting only v1 columns keep working
    assert merged.select("id", "payload").count() == 3
    # and quality-aware logic treats legacy rows explicitly
    n_legacy = merged.where(F.col("quality").isNull()).count()
    assert n_legacy == 2
