"""SparkSession factory.

Scale notes (100 TB / 1000-executor target):

- ``spark.sql.session.timeZone`` is pinned to UTC because the reference's
  ``yyyyMMdd`` day-bucket derivation used the JVM default timezone
  (``RawDataIngestion.java:137``); pinning makes the bucket deterministic
  across a heterogeneous cluster and matches the DuckDB oracle.
- AQE is on: runtime coalescing of shuffle partitions, auto broadcast-join
  demotion/promotion and skew-join splitting are exactly the knobs that keep
  the relational surface healthy at 1000× the test data.
- ``spark.sql.shuffle.partitions`` defaults to the local core count here;
  on a real cluster this is sized to ~2-3× total cores and AQE coalesces
  down — never hardcode a small number into operator code.
- ``spark.sql.legacy.parquet.nanosAsLong`` lets Spark 4 read the test
  tables' ``timestamp[ns]`` columns (as raw nanos; ``catalog`` converts).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "sparkstreaming-rawdataingestion-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) the engine session with scale-ready defaults."""
    master = master or f"local[{DEFAULT_CPUS}]"
    shuffle_partitions = shuffle_partitions or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # keep the day partition column its declared STRING type on
        # read-back (inference would turn day=20240101 into an int)
        .config("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


# Every DataFrame persisted via ``stage`` is tracked here so a long-lived
# session (the driver runs 50 registry queries back to back) doesn't
# accumulate dead cached shingle sets / edges / centroids for its whole
# lifetime. ``release_staged`` is called by the query-registry wrapper at
# the START of the next query — by then the previous query's result has
# been collected, so its staged inputs are safe to drop.
_STAGED: list = []


def staging_storage_level():
    """The storage level every engine-managed persist uses: DISK_ONLY
    under ``SPARK_GRAFT_SCALE_MODE=disk`` (large staged data must not
    pressure executor memory), else MEMORY_AND_DISK_DESER (deserialized
    reads measure ~10% faster than the serialized default on the
    staged-index workloads)."""
    from pyspark import StorageLevel

    return (
        StorageLevel.DISK_ONLY
        if os.environ.get("SPARK_GRAFT_SCALE_MODE", "").lower() == "disk"
        else StorageLevel.MEMORY_AND_DISK_DESER
    )


def stage(df):
    """Materialization point for a DataFrame consumed by multiple downstream
    operators (signatures + verification joins, iterative-loop state, ...).

    Uses ``persist`` — fault-tolerant on a real cluster (lost partitions
    recompute from lineage), unlike ``localCheckpoint`` whose executor-local
    blocks die with the executor and kill the job. Default storage level is
    MEMORY_AND_DISK_DESER (deserialized reads measure ~10% faster than the
    serialized default on the staged-index workloads); set
    ``SPARK_GRAFT_SCALE_MODE=disk`` for DISK_ONLY when the staged data
    would pressure executor memory at large scale factors.
    """
    staged = df.persist(staging_storage_level())
    _STAGED.append(staged)
    return staged


def release_staged() -> int:
    """Unpersist every DataFrame staged since the last call (async — no
    blocking wait on block eviction). Returns how many were released."""
    n = len(_STAGED)
    for df in _STAGED:
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped — nothing to release
    _STAGED.clear()
    return n


def spread_small_scan(df):
    """Parallelize heavy per-row work over a SMALL scan (round 14, guide
    §2.5/§6): a single small parquet file scans as ONE input partition
    (``maxPartitionBytes`` can't split below a row group), which
    serializes every downstream map stage — shingle transforms, media
    codec mapInPandas chains, quantize/encode projections — onto one
    core of the local session. Round-robin repartition to the session's
    default parallelism ONLY when the plan yields fewer partitions;
    keyless repartition is deterministic under sortBeforeRepartition
    (default on) and the shuffle moves the small scan's bytes once. At
    production scale inputs already split into >= cores partitions and
    this is a structural no-op — the condition, not a constant, decides."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def tune_for_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine defaults to an externally created
    session (the driver hands us its own SparkSession in ``entry``)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # static conf on some builds; catalog falls back to a cast
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set(
        "spark.sql.sources.partitionColumnTypeInference.enabled", "false"
    )
    return spark
