"""Scalar helpers with exact reference-parity semantics (SURVEY §2.1 ops 6-9).

All of these stay JVM-side (built-in expressions, whole-stage codegen) —
no Python UDFs in the ingest hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def epoch_ms_to_ts(col: Column | str) -> Column:
    """Op 6 — epoch milliseconds → timestamp (``new Date(ms)``,
    RawDataIngestion.java:138). Returned as TIMESTAMP_NTZ (engine treats
    wall-clock as UTC-naive; session TZ is pinned UTC)."""
    return F.timestamp_millis(_c(col)).cast("timestamp_ntz")


def day_bucket(ts: Column | str) -> Column:
    """Op 7 — ``yyyyMMdd`` day-bucket string
    (``SimpleDateFormat("yyyyMMdd")``, RawDataIngestion.java:137).
    The reference used the JVM default TZ; the engine pins UTC (SURVEY §1.2).
    This column is the partition/pruning key at scale: a 100 TB sensor
    archive partitioned by ``day`` keeps every partition bounded and makes
    time-range queries prune at the metadata level."""
    return F.date_format(_c(ts), "yyyyMMdd")


def trunc_div(col: Column | str, divisor: int) -> Column:
    """Truncating integer division toward zero — Java ``int`` semantics
    (``offset / 60000``, RawDataIngestion.java:139). Implemented with exact
    integer arithmetic: Spark's ``%`` keeps the dividend's sign, so
    ``(c - c % d) / d`` truncates toward zero (-90000 ms → -1 min, where
    ``floor`` would give -2)."""
    c = _c(col).cast("long")
    return ((c - (c % divisor)) / divisor).cast("long")


def ms_to_offset_minutes(offset_ms: Column | str) -> Column:
    """Op 8 — UTC-offset milliseconds → whole minutes, truncating."""
    return trunc_div(offset_ms, 60000).cast("int")


def json_payload(col: Column | str) -> Column:
    """Op 9 — keep an arbitrary JSON subtree opaque as its compact string
    form (``JsonElement.toString()``, RawDataIngestion.java:140). When the
    subtree was captured by ``from_json`` under a StringType field it is
    already the compact re-serialization; this is the identity then."""
    return _c(col)


def seq1(end: Column) -> Column:
    """Ascending ``[1 .. end]`` as ``array<int>``, EMPTY when end < 1.

    Spark's ``sequence(1, 0)`` yields the DESCENDING ``[1, 0]`` (and a
    negative end keeps descending), so the common
    ``sequence(1, greatest(n - k, 0))`` guard silently produces index 0
    and crashes ``slice`` with INVALID_PARAMETER_VALUE.START on inputs
    shorter than the gram width. Every caller here wants SQL
    ``generate_series`` semantics — empty when start > stop with a
    positive step — which is also what the DuckDB oracles compute."""
    return F.when(end >= 1, F.sequence(F.lit(1), end)).otherwise(
        F.expr("CAST(array() AS array<int>)")
    )
