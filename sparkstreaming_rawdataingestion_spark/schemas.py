"""Explicit schemas for the reference's implicit data model.

The reference enforces its message schema only by Gson accessor calls
(``RawDataIngestion.java:134-141``); here it is an explicit StructType so
Catalyst can prune JSON parsing to the referenced leaves.

``sample`` is declared ``StringType`` on purpose: Spark's JSON parser
re-serializes any non-string token encountered under a string field back to
its compact JSON text, which reproduces the reference's
``JsonElement.toString()`` opaque-payload behavior
(``RawDataIngestion.java:140``) without imposing a schema on the payload.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Kafka message value: {"datastream_id": int, "data": [{"dateTime": long_ms,
# "offset": int_ms, "sample": <arbitrary JSON>}]}   (SURVEY §1.1)
MESSAGE_SCHEMA = T.StructType(
    [
        T.StructField("datastream_id", T.IntegerType()),
        T.StructField(
            "data",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("dateTime", T.LongType()),
                        T.StructField("offset", T.IntegerType()),
                        T.StructField("sample", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)

# Normalized output row (DataPoint.java:33-37). ``datetime`` is
# TIMESTAMP_NTZ: the engine treats all wall-clock values as UTC-naive so the
# day bucket is timezone-stable (SURVEY §1.2) and matches the DuckDB oracle.
DATAPOINT_SCHEMA = T.StructType(
    [
        T.StructField("datastream_id", T.IntegerType()),
        T.StructField("day", T.StringType()),
        T.StructField("datetime", T.TimestampNTZType()),
        T.StructField("offset", T.IntegerType()),
        T.StructField("sample", T.StringType()),
    ]
)

# Primary key giving the Cassandra-upsert idempotency contract of
# ``saveToCassandra()`` (RawDataIngestion.java:152).
DATAPOINT_PK = ["datastream_id", "day", "datetime"]

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
