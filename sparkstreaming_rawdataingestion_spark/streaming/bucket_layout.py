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

from pyspark.sql import SparkSession, functions as F

# rows sampled per backfill spot-check: a wrong assumed modulus
# survives one sampled row with probability <= 1/2 (the recomputed
# bucket collides only when the extra modulus bits are zero), so 24
# rows bound the miss probability by 2^-24
_SPOT_ROWS = 24


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
    bucket_col: str | None = None,
    recompute=None,
) -> bool:
    """Refuse (ValueError) when the directory's recorded bucket count
    disagrees with ``expected``. Returns True when a marker was found,
    so appenders can BACKFILL the marker on legacy (pre-round-13)
    directories. ``_hfs``/``_exists`` let hot paths reuse an
    already-constructed FileSystem and existence probe (object-store
    appends are RPC-bound).

    Marker-less directories are NOT blindly assumed current (round-13
    advice: the first guarded append would then stamp the session's
    constant as authoritative, permanently certifying a wrong count if
    the constant changed before that first append). When ``bucket_col``
    names the partition column, the observed partition values are
    cross-checked: any observed bucket >= expected refuses outright,
    and when ``recompute`` (DataFrame -> Column recomputing a row's
    bucket under the SESSION constant) is given, {_SPOT_ROWS} rows of
    the highest observed bucket are spot-checked — a halved assumed
    modulus survives per sampled row only when the extra modulus bits
    are zero, so the silent-miss hazard is bounded by 2^-{_SPOT_ROWS}
    instead of trusted."""
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
        markers = ", ".join(f".{prefix}.{n}" for n in found)
        raise ValueError(
            f"bucket layout mismatch at {sink_dir}: directory recorded "
            f"% {found} (markers: {markers}), session expects "
            f"% {expected}. Rewrite the directory with {tool} before "
            f"reading or appending."
            + (
                " Multiple markers coexist — an interrupted migration "
                "or manual copy; resolve to ONE before migrating."
                if len(found) > 1
                else ""
            )
        )
    if not found and bucket_col is not None:
        _validate_legacy_layout(
            spark, jvm, fs, sink_dir, expected, tool, bucket_col,
            recompute,
        )
    return bool(found)


def _validate_legacy_layout(
    spark, jvm, fs, sink_dir, expected, tool, bucket_col, recompute
) -> None:
    """The marker-less backfill cross-check (see check_bucket_marker).
    Listing-only unless ``recompute`` is given (one bounded read of
    {_SPOT_ROWS} rows, and only on the legacy path — after the first
    guarded append stamps the marker this never runs again)."""
    observed: list[tuple[int, str]] = []
    for pat in (
        f"{sink_dir}/{bucket_col}=*",
        f"{sink_dir}/*/{bucket_col}=*",
    ):
        for s in (
            fs.globStatus(jvm.org.apache.hadoop.fs.Path(pat)) or []
        ):
            name = s.getPath().getName()
            try:
                observed.append(
                    (int(name.split("=", 1)[1]), s.getPath().toString())
                )
            except ValueError:
                continue
    if not observed:
        return
    mx, mx_path = max(observed)
    if mx >= expected:
        raise ValueError(
            f"bucket layout mismatch at {sink_dir}: marker-less "
            f"directory holds {bucket_col}={mx} >= the session's "
            f"% {expected} — written under a larger modulus. Rewrite "
            f"with {tool} before reading or appending."
        )
    if recompute is not None:
        df = spark.read.parquet(mx_path)
        n_bad = (
            df.limit(_SPOT_ROWS)
            .where(recompute(df) != F.lit(mx))
            .count()
        )
        if n_bad:
            raise ValueError(
                f"bucket layout mismatch at {sink_dir}: marker-less "
                f"directory's {bucket_col}={mx} rows do not reproduce "
                f"their bucket under the session's % {expected} "
                f"({n_bad}/{_SPOT_ROWS} sampled rows disagree) — "
                f"written under a different modulus. Rewrite with "
                f"{tool} before reading or appending."
            )
