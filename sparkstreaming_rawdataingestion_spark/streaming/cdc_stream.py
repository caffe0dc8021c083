"""Incremental CDC apply — the streaming twin of
``operators/modern.py::merge_upsert_apply``.

A keyed base table is maintained from a change stream of
(key, action I/U/D, payload, seq) rows — the shape a Debezium/binlog
feed lands as. Each micro-batch:

1. reduces the batch to its LATEST change per key (max ``seq`` — the
   cdc_latest_per_key pattern),
2. reads ONLY the hash-bucket partitions containing changed keys
   (partition pruning on the bucket directory layout),
3. full-outer-merges changes into those buckets with MERGE semantics —
   insert when absent, update when ``seq`` advances, delete when a
   delete's ``seq`` advances — and
4. dynamically overwrites just the touched bucket partitions.

Exactly-once without a table format: every applied row carries
``last_seq``; a change with ``seq <= last_seq`` is a no-op, so
foreachBatch retries and full replays converge to the same table
(monotonic-sequence idempotency — the same replace-not-add contract as
rollup_stream / the ingest upsert sink, reference parity
RawDataIngestion.java:152).

Scale notes: maintenance cost follows batch activity, not table size —
a batch touching k of the N_BUCKETS partitions reads and rewrites only
those directories. The bucket count is a layout constant (like the
sink's ``day``): raise it so a bucket fits an executor; the touched-
bucket list that drives pruning is bounded by N_BUCKETS, never by data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.streaming import StreamingQuery

from .ingest_stream import _trigger_kwargs

#: hash-bucket partition count for the maintained table's directory layout
N_BUCKETS = 16

#: maintained-table schema: key, payload..., bookkeeping
BASE_COLUMNS = ("o_orderkey", "o_custkey", "totalprice", "last_seq", "bucket")


def _bucket(key):
    return F.pmod(F.xxhash64(key), F.lit(N_BUCKETS)).cast("int")


def seed_base_table(base: DataFrame, path: str) -> None:
    """Materialize the initial table state, bucket-partitioned."""
    (
        base.select(
            "o_orderkey",
            "o_custkey",
            "totalprice",
            F.lit(0).cast("long").alias("last_seq"),
            _bucket(F.col("o_orderkey")).alias("bucket"),
        )
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )


def apply_cdc_batch(changes: DataFrame, base_path: str) -> None:
    """Merge one micro-batch of changes into the bucket-partitioned base.

    Dynamic-overwrite edge handled below: a touched bucket whose EVERY
    row is deleted produces no output rows for that partition, and
    dynamic overwrite cannot tombstone a partition it emits nothing
    for — so fully-emptied bucket directories are removed explicitly
    (the touched-bucket set is layout metadata, ≤ N_BUCKETS entries)."""
    if len(changes.take(1)) == 0:
        return
    spark = changes.sparkSession
    # latest change per key within the batch — earlier same-key changes
    # are superseded before they ever touch storage
    w = Window.partitionBy("o_orderkey").orderBy(F.desc("seq"))
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
        .withColumn("bucket", _bucket(F.col("o_orderkey")))
    )
    # touched-bucket list: bounded by N_BUCKETS (layout metadata, not
    # data) — the one driver-side collect, by design
    buckets = [r.bucket for r in latest.select("bucket").distinct().collect()]
    base = spark.read.parquet(base_path).where(F.col("bucket").isin(buckets))
    merged = (
        base.join(latest, ["o_orderkey", "bucket"], "full_outer")
        .withColumn(
            "_apply",
            F.col("seq").isNotNull()
            & (F.col("last_seq").isNull() | (F.col("seq") > F.col("last_seq"))),
        )
        .where(
            # delete wins only when it advances the sequence; stale or
            # absent changes keep the base row (if one exists)
            ~(F.col("_apply") & (F.col("action") == "D"))
            & (F.col("last_seq").isNotNull() | F.col("_apply"))
        )
        .select(
            "o_orderkey",
            F.when(F.col("_apply"), F.col("c_custkey"))
            .otherwise(F.col("o_custkey"))
            .alias("o_custkey"),
            F.when(F.col("_apply"), F.col("new_price"))
            .otherwise(F.col("totalprice"))
            .alias("totalprice"),
            F.when(F.col("_apply"), F.col("seq"))
            .otherwise(F.col("last_seq"))
            .cast("long")
            .alias("last_seq"),
            "bucket",
        )
    )
    # per-micro-batch cut: the merge reads the files the write replaces;
    # a failed batch retries from the checkpoint and the seq guard makes
    # the re-merge a no-op-or-identical write (see module docstring)
    merged = merged.localCheckpoint(eager=True)
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(base_path)
    )
    # tombstone buckets the batch emptied entirely (cheap: reads the
    # checkpointed cut, bounded by N_BUCKETS)
    surviving = {r.bucket for r in merged.select("bucket").distinct().collect()}
    emptied = set(buckets) - surviving
    if emptied:
        jvm = spark._jvm
        HPath = jvm.org.apache.hadoop.fs.Path
        fs = HPath(base_path).getFileSystem(spark._jsc.hadoopConfiguration())
        for b in emptied:
            fs.delete(HPath(base_path, f"bucket={b}"), True)


def start_cdc_apply_stream(
    changes: DataFrame,
    base_path: str,
    checkpoint_dir: str,
    trigger_seconds: float | None = None,
) -> StreamingQuery:
    """Wire a change stream (o_orderkey, action, c_custkey, new_price,
    seq) into MERGE maintenance of the bucket-partitioned base table."""
    return (
        changes.writeStream.foreachBatch(
            lambda batch, _id: apply_cdc_batch(batch, base_path)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**_trigger_kwargs(trigger_seconds))
        .start()
    )
