"""Streaming heavy-hitters — the incremental twin of
``operators/stats.py::q_sketch_heavy_hitters``.

The batch sketch bounds memory with per-partition Misra-Gries summaries
merged by estimate sums. The streaming form shards the same algorithm by
a hash BUCKET of the item instead of by partition: every distinct item
belongs to exactly one bucket, each bucket's keyed state carries at most
``k`` counters plus its cumulative decrement — O(k·B) state total,
forever, at any stream length or vocabulary size. That sharding makes
the streamed bound TIGHTER than the batch merge: an item's undercount is
bounded by its OWN bucket's decrement, not the sum across all partitions
(est ≤ true ≤ est + decr[bucket(item)]), and any item whose true count
exceeds its bucket decrement is guaranteed present.

Architecture (the repo's streaming-maintenance shape, cf.
``rollup_stream``/``drift_stream``): the stateful operator emits each
touched bucket's FULL current summary per micro-batch (update-mode
semantics — absolute snapshots, not deltas), and ``foreachBatch``
replaces those buckets' rows wholesale in a parquet sketch table
partitioned by bucket. Bucket replacement makes retries and full
replays converge to the same table (idempotent maintenance); a fresh
replay re-folds the identical per-bucket sequence. The report — global
top-k with per-item undercount bounds — is a dashboard-sized batch
query over the ≤ k·B-row sketch table.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

TOPK_K = 8       # Misra-Gries counters per bucket
TOPK_BUCKETS = 4
TOPK_REPORT = 20

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType()),
        T.StructField("tok", T.StringType()),
        T.StructField("est", T.LongType()),
        T.StructField("decr", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("toks", T.ArrayType(T.StringType())),
        T.StructField("ests", T.ArrayType(T.LongType())),
        T.StructField("decr", T.LongType()),
    ]
)


def _fold_bucket(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this batch's tokens into the bucket's Misra-Gries counters
    (same batched-decrement algorithm as the batch kernel
    ``mg_partial_summaries``) and emit the bucket's full summary."""
    (bucket,) = key
    if state.exists:
        toks, ests, decr = state.get
        counters = dict(zip(toks, ests))
    else:
        counters, decr = {}, 0
    for pdf in pdfs:
        for tok, c in pdf["tok"].value_counts().items():
            counters[tok] = counters.get(tok, 0) + int(c)
        while len(counters) > TOPK_K:
            m = min(counters.values())
            decr += m
            counters = {t: c - m for t, c in counters.items() if c > m}
    state.update((list(counters), [int(v) for v in counters.values()], decr))
    yield pd.DataFrame(
        {
            "bucket": [bucket] * len(counters),
            "tok": list(counters),
            "est": [int(v) for v in counters.values()],
            "decr": [decr] * len(counters),
        }
    )


def heavy_hitters_stream(toks: DataFrame) -> DataFrame:
    """Per-bucket summary stream from a streaming ``tok`` column. The
    shuffle key is the item-hash bucket, so each micro-batch moves
    (bucket, tok) pairs — pre-aggregated by value_counts inside the
    Arrow batches — and touches at most TOPK_BUCKETS states."""
    bucketed = toks.select(
        F.pmod(F.xxhash64("tok"), F.lit(TOPK_BUCKETS))
        .cast("int")
        .alias("bucket"),
        "tok",
    )
    return bucketed.groupBy("bucket").applyInPandasWithState(
        _fold_bucket,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def start_sketch_maintenance(
    summaries: DataFrame, sketch_path: str, checkpoint: str, **trigger
):
    """Maintain the bucket-partitioned sketch table: each batch's touched
    buckets are replaced wholesale (dynamic partition overwrite) —
    absolute snapshots make replays and retries converge."""

    def apply_batch(batch: DataFrame, _epoch: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                batch.write.mode("overwrite")
                .partitionBy("bucket")
                .parquet(sketch_path)
            )
        finally:
            if prev is not None:
                spark.conf.set(
                    "spark.sql.sources.partitionOverwriteMode", prev
                )

    return (
        summaries.writeStream.foreachBatch(apply_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(**trigger)
        .start()
    )


def heavy_hitters_report(spark: SparkSession, sketch_path: str) -> DataFrame:
    """Global top-k over the sketch table with per-item bounds:
    est ≤ true ≤ est + the item's OWN bucket decrement."""
    s = spark.read.parquet(sketch_path)
    return (
        s.select("tok", "est", F.col("decr").alias("max_undercount"))
        .orderBy(F.col("est").desc(), "tok")
        .limit(TOPK_REPORT)
    )
