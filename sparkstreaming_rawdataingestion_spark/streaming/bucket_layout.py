"""Shared bucket-layout marker discipline for hash/band-bucketed state
directories (the print index's ``band_bucket``, the census seen
index's ``id_bucket``): the bucket count is a frozen layout property
of the DIRECTORY — a row written at ``x % 16`` simply is not in the
partition an ``x % 32`` reader prunes to, so a constant/directory
mismatch silently MISSES rows. Each archive therefore records its
bucket count as an empty dot-named marker FILE (``.<prefix>.N`` —
existence is the record, nothing to parse cross-filesystem;
dot-prefixed names are hidden from Spark's file listing, unlike an
underscore-prefixed ``name=value`` file, which partition discovery
tries to read as data — measured in round 13), and every
reader/appender refuses on mismatch, pointing at the matching
one-shot migration tool. ONE definition of the discipline (round 13:
generalized from the print archives to the census seen index)."""

from __future__ import annotations

from pyspark.sql import SparkSession


def hadoop_fs(spark: SparkSession, sink_dir: str):
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(sink_dir)
    fs = path.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return jvm, fs, path


def write_bucket_marker(
    spark: SparkSession, sink_dir: str, prefix: str, buckets: int
) -> None:
    """Record ``buckets`` as the empty marker file ``.<prefix>.N``."""
    if buckets < 1:
        raise ValueError(f"bucket count must be >= 1, got {buckets}")
    jvm, fs, _ = hadoop_fs(spark, sink_dir)
    marker = jvm.org.apache.hadoop.fs.Path(
        f"{sink_dir}/.{prefix}.{buckets}"
    )
    fs.createNewFile(marker)


def check_bucket_marker(
    spark: SparkSession,
    sink_dir: str,
    prefix: str,
    expected: int,
    tool: str,
    _hfs=None,
    _exists: bool | None = None,
) -> bool:
    """Refuse (ValueError) when the directory's recorded bucket count
    disagrees with ``expected``. Directories without a marker
    (pre-round-13) are assumed current; returns True when a marker was
    found, so appenders can BACKFILL the marker on legacy directories.
    ``_hfs``/``_exists`` let hot paths reuse an already-constructed
    FileSystem and existence probe (object-store appends are
    RPC-bound)."""
    jvm, fs, path = _hfs if _hfs is not None else hadoop_fs(
        spark, sink_dir
    )
    if not (fs.exists(path) if _exists is None else _exists):
        return False
    statuses = fs.globStatus(
        jvm.org.apache.hadoop.fs.Path(f"{sink_dir}/.{prefix}.*")
    )
    found = sorted(
        int(s.getPath().getName().rsplit(".", 1)[1])
        for s in (statuses or [])
    )
    if found and found != [expected]:
        raise ValueError(
            f"bucket layout mismatch at {sink_dir}: directory recorded "
            f"% {found[0]} (marker .{prefix}.{found[0]}), session "
            f"expects % {expected}. Rewrite the directory with {tool} "
            f"before reading or appending."
        )
    return bool(found)
