"""One-shot print-archive bucket migration (round-12 verdict Next #5):
rewrite a band-bucketed print index (streaming/print_index.py layout)
to a NEW PRINT_BUCKETS value, with a full data-equivalence check
before the swap, so the bucket count stops being deploy-frozen.

Usage:
    python tools/migrate_print_buckets.py SINK_DIR NEW_BUCKETS

Steps:
1. read the long inverted-index table (all data columns: keys +
   band_idx + band_val + carried print);
2. recompute band_bucket = band_val % NEW_BUCKETS and write the whole
   table to SINK_DIR.migrating under the same partitionBy;
3. EQUIVALENCE CHECK: the data-column row multisets of old and new
   archives must be identical (exceptAll both directions == empty) —
   buckets are derived layout, the data rows must survive bit-exactly;
4. swap: SINK_DIR -> SINK_DIR.pre_migrate_backup, .migrating ->
   SINK_DIR, and record the new `.print_buckets.N` marker.

Readers/appenders running with the OLD constant then refuse loudly
(check_print_layout) instead of silently missing matches; delete the
backup once the deployment has flipped its PRINT_BUCKETS.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def migrate(spark, sink_dir: str, new_buckets: int) -> None:
    from pyspark.sql import functions as F

    from sparkstreaming_rawdataingestion_spark.streaming.print_index import (
        _hadoop_fs,
        write_print_layout_marker,
    )

    if new_buckets < 1:
        # pmod(x, 0) is NULL -> every row in the Hive default
        # partition, invisible to any isin prune — and the data-column
        # equivalence check would certify it (r13 review)
        raise SystemExit(f"new_buckets must be >= 1, got {new_buckets}")
    old = spark.read.parquet(sink_dir)
    data_cols = [c for c in old.columns if c != "band_bucket"]
    tmp = sink_dir.rstrip("/") + ".migrating"
    (
        old.select(*data_cols)
        .withColumn(
            "band_bucket",
            F.pmod(F.col("band_val"), F.lit(new_buckets)).cast("int"),
        )
        .write.mode("overwrite")
        .partitionBy("band_idx", "band_bucket")
        .parquet(tmp)
    )
    # the NEW tree carries its marker BEFORE the swap: a crash between
    # the renames and a post-swap marker write would otherwise leave a
    # rewritten archive that check_print_layout "assumes current" —
    # the silent-miss hole the marker exists to close (r13 review)
    write_print_layout_marker(spark, tmp, new_buckets)
    new = spark.read.parquet(tmp)
    a = old.select(*data_cols).persist()
    b = new.select(*data_cols).persist()
    n_rows = a.count()
    missing = a.exceptAll(b).count()
    extra = b.exceptAll(a).count()
    a.unpersist()
    b.unpersist()
    if missing or extra:
        raise SystemExit(
            f"equivalence check FAILED: {missing} rows missing, "
            f"{extra} rows extra — {tmp} left in place, {sink_dir} "
            f"untouched"
        )
    jvm, fs, path = _hadoop_fs(spark, sink_dir)
    backup = jvm.org.apache.hadoop.fs.Path(
        sink_dir.rstrip("/") + ".pre_migrate_backup"
    )
    if not fs.rename(path, backup):
        raise SystemExit(f"could not move {sink_dir} aside")
    if not fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), path):
        fs.rename(backup, path)  # roll back
        raise SystemExit(f"could not move {tmp} into place (rolled back)")
    print(
        f"migrated {sink_dir} to band_bucket = band_val % {new_buckets} "
        f"({n_rows} index rows, equivalence checked); backup at "
        f"{backup}"
    )


def main() -> None:
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    sink_dir, new_buckets = sys.argv[1], int(sys.argv[2])
    from sparkstreaming_rawdataingestion_spark import session

    migrate(session.get_spark(), sink_dir, new_buckets)


if __name__ == "__main__":
    main()
