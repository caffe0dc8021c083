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


def _ntz_from_epoch_micros(us):
    """TIMESTAMP_NTZ holding the UTC wall clock of an epoch-µs instant,
    built with pure interval arithmetic — NO timezone conversion at any
    point, so the result is bit-identical under any
    ``spark.sql.session.timeZone`` (a cast LTZ→NTZ renders in the session
    zone, and to_utc_timestamp/convert_timezone round trips are off by an
    hour for instants landing in a DST gap/ambiguous hour)."""
    secs = us.cast("decimal(20,0)") / F.lit(1000000)
    epoch = F.make_timestamp_ntz(
        F.lit(1970), F.lit(1), F.lit(1), F.lit(0), F.lit(0), F.lit(0)
    )
    return epoch + F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0), secs)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table, normalizing timestamp columns to NTZ."""
    _ensure_nanos_conf(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # Normalize ts to TIMESTAMP_NTZ whatever the generator wrote:
        # timestamp[ns] parquet arrives as raw BIGINT nanos (via the
        # nanosAsLong legacy conf) and is truncated to µs; timestamp[us]
        # arrives as LTZ and goes through the same tz-free rebuild
        # (``div`` truncates like the reference's integer division).
        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "bigint":
            df = df.withColumn(
                "ts", _ntz_from_epoch_micros(F.expr("ts div 1000"))
            )
        elif ts_type != "timestamp_ntz":
            df = df.withColumn(
                "ts", _ntz_from_epoch_micros(F.unix_micros(F.col("ts")))
            )
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}
