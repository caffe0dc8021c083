"""Sinks — the engine's equivalent of the reference's Cassandra upsert
(SURVEY §2.1 op 11).

``saveToCassandra()`` (RawDataIngestion.java:152) is an idempotent upsert on
the table's primary key, which is how the reference survives its
at-least-once delivery (no checkpoint, ``auto.offset.reset=smallest`` —
SURVEY §0). Parquet has no upsert, so the engine makes the write idempotent
explicitly: dedup on the DataPoint PK inside the batch, then
partition-overwrite by ``day`` (dynamic partition overwrite), which is the
scalable idempotency unit — re-processing a day replaces that day only.

Scale note: ``partitionBy("day")`` is the same day-bucketing the reference
used for Cassandra partition pruning (``RawDataIngestion.java:137``); on a
100 TB archive it is what makes time-ranged queries prune at file level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .schemas import DATAPOINT_PK


def dedup_on_pk(datapoints: DataFrame) -> DataFrame:
    """Cassandra-upsert semantics: last write per PK wins; with value-equal
    duplicates (the at-least-once redelivery case) any-write-wins is
    equivalent. ``dropDuplicates`` is a hash-based map-side-combinable
    shuffle on the PK — the only shuffle in the sink path."""
    return datapoints.dropDuplicates(DATAPOINT_PK)


def write_datapoints(datapoints: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Day-partitioned parquet sink with dynamic partition overwrite."""
    (
        dedup_on_pk(datapoints)
        .write.mode(mode)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("day")
        .parquet(path)
    )
