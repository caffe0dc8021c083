"""Loaders for the synthetic test tables (TESTDATA.md / FIXTURES.md §B).

Scale note: these are plain parquet scans — predicate pushdown and column
pruning reach the file scan untouched. The only normalization is the
``events.ts`` nanosecond fix-up (Spark 4 cannot natively read parquet
TIMESTAMP(NANOS); with ``spark.sql.legacy.parquet.nanosAsLong`` the column
arrives as BIGINT nanos and is converted here to TIMESTAMP_NTZ, truncating
to microseconds). The conversion is a cheap projection on top of the scan —
pushdown on other columns is unaffected.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _ensure_nanos_conf(spark: SparkSession) -> None:
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table, normalizing timestamp columns to NTZ."""
    _ensure_nanos_conf(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # Normalize ts to TIMESTAMP_NTZ whatever the generator wrote:
        # timestamp[ns] parquet arrives as raw BIGINT nanos (via the
        # nanosAsLong legacy conf) and is truncated to µs; timestamp[us]
        # arrives as a timestamp type and only needs the NTZ cast.
        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "bigint":
            # ``div`` truncates like the reference's integer division.
            df = df.withColumn(
                "ts",
                F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"),
            )
        elif ts_type != "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}
