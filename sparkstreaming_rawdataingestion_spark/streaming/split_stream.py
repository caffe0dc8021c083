"""Streaming train/val/test routing — the incremental twin of
``operators/layout.py::q_train_val_test_split``.

A continuously-constructed dataset needs every arriving document routed
to its holdout split AT INGEST TIME, with the same assignment the batch
manifest would produce — otherwise a later batch rebuild silently moves
documents across the train/test boundary (leakage). Because the split
is a pure function of ``doc_id`` (the portable multiplicative hash —
stable across engines, runs, and arrival order), the streaming form is
a stateless map: no state store, no watermark, nothing to replay.

The sink partitions by ``split``, so each split is a self-contained
directory a trainer (or evaluator) reads without touching the others —
the layout the batch manifest merely describes, materialized. File-sink
exactly-once (checkpointed offsets + transactional file commits) makes
at-least-once upstream delivery idempotent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..operators.layout import _SPLIT_TRAIN_PCT, _SPLIT_VAL_PCT
from .ingest_stream import _trigger_kwargs


def assign_split(docs: DataFrame) -> DataFrame:
    """Stateless split assignment — identical expression to the batch
    manifest (one shared hash family, layout.py)."""
    from pyspark.sql import functions as F

    from ..operators.profiling import _bucket_col

    b = _bucket_col(F.col("doc_id"))
    return docs.withColumn(
        "split",
        F.when(b < _SPLIT_TRAIN_PCT, F.lit("train"))
        .when(b < _SPLIT_TRAIN_PCT + _SPLIT_VAL_PCT, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def start_split_router(
    docs: DataFrame,
    sink_dir: str,
    checkpoint_dir: str,
    trigger_seconds: int | None = None,
) -> StreamingQuery:
    """Route a document stream into split-partitioned parquet
    (``trigger_seconds=None`` → availableNow, the drain-and-stop mode
    tests use; the reference's 5 s cadence in production)."""
    return (
        assign_split(docs)
        .writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("split")
        .outputMode("append")
        .trigger(**_trigger_kwargs(trigger_seconds))
        .start()
    )
