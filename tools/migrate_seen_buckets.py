"""One-shot census seen-index bucket migration — the
migrate_print_buckets recipe applied to the census stream's id-bucket
layout: rewrite `<state>/seen` (partitioned by (ingest_key,
id_bucket = pmod(xxhash64(doc_id), SEEN_BUCKETS))) to a NEW bucket
count with a full data-equivalence check before the swap.

Usage:
    python tools/migrate_seen_buckets.py SEEN_DIR NEW_BUCKETS

Steps mirror migrate_print_buckets (marker written into the tmp tree
BEFORE the swap; equivalence = exceptAll both directions over the data
columns (doc_id, ingest_key); backup kept). Readers/appenders running
with the OLD SEEN_BUCKETS then refuse loudly (bucket_layout guard)
instead of silently re-admitting absorbed ids.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def migrate(spark, seen_dir: str, new_buckets: int) -> None:
    from pyspark.sql import functions as F

    from sparkstreaming_rawdataingestion_spark.streaming.bucket_layout import (
        hadoop_fs,
        write_bucket_marker,
    )
    from sparkstreaming_rawdataingestion_spark.streaming.census_stream import (
        SEEN_MARKER,
    )

    if new_buckets < 1:
        raise SystemExit(f"new_buckets must be >= 1, got {new_buckets}")
    old = spark.read.parquet(seen_dir)
    data_cols = [c for c in old.columns if c != "id_bucket"]
    tmp = seen_dir.rstrip("/") + ".migrating"
    (
        old.select(*data_cols)
        .withColumn(
            "id_bucket",
            F.pmod(F.xxhash64(F.col("doc_id")), F.lit(new_buckets)).cast(
                "int"
            ),
        )
        .write.mode("overwrite")
        .partitionBy("ingest_key", "id_bucket")
        .parquet(tmp)
    )
    write_bucket_marker(spark, tmp, SEEN_MARKER, new_buckets)
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
            f"{extra} rows extra — {tmp} left in place, {seen_dir} "
            f"untouched"
        )
    jvm, fs, path = hadoop_fs(spark, seen_dir)
    backup = jvm.org.apache.hadoop.fs.Path(
        seen_dir.rstrip("/") + ".pre_migrate_backup"
    )
    if not fs.rename(path, backup):
        raise SystemExit(f"could not move {seen_dir} aside")
    if not fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), path):
        fs.rename(backup, path)  # roll back
        raise SystemExit(f"could not move {tmp} into place (rolled back)")
    print(
        f"migrated {seen_dir} to id_bucket = xxhash64(doc_id) % "
        f"{new_buckets} ({n_rows} seen rows, equivalence checked); "
        f"backup at {backup}"
    )


def main() -> None:
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    seen_dir, new_buckets = sys.argv[1], int(sys.argv[2])
    from sparkstreaming_rawdataingestion_spark import session

    migrate(session.get_spark(), seen_dir, new_buckets)


if __name__ == "__main__":
    main()
