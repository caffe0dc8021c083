"""Streaming ingest — the reference job itself, as ONE Structured
Streaming query (SURVEY §2.1 ops 11, 13-15; §3.4).

Differences from the reference, all deliberate (SURVEY §0):

- **One query, not two jobs.** The reference's two output ops
  (``saveToCassandra`` + ``print``) re-ran the whole pipeline twice per
  batch over the uncached DStream (RawDataIngestion.java:129,152,165).
  Here a single query writes the sink; the debug view is a bounded
  ``show(10)`` on the *already computed* batch inside ``foreachBatch``.
- **Checkpointed, exactly-once.** The reference had no checkpoint and
  re-read Kafka from earliest on restart, relying on Cassandra's upsert to
  absorb duplicates. The native parquet sink + checkpoint WAL gives
  exactly-once to the sink; the foreachBatch variant reproduces the
  reference's at-least-once + PK-upsert contract for upsert-capable
  external stores (Cassandra in prod).
- **5 s processing-time trigger** preserved as the default cadence
  (``Durations.seconds(5)``, RawDataIngestion.java:61); tests use
  ``availableNow`` to drain fixtures deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..operators.ingest import ingest_normalize
from ..sinks import dedup_on_pk

DEFAULT_TRIGGER_SECONDS = 5  # reference cadence, RawDataIngestion.java:61
DEBUG_ROWS = 10  # DStream.print() default, RawDataIngestion.java:165


def _trigger_kwargs(trigger_seconds: int | None) -> dict:
    if trigger_seconds is None:
        return {"availableNow": True}
    return {"processingTime": f"{trigger_seconds} seconds"}


def start_ingest_file_sink(
    values: DataFrame,
    sink_path: str,
    checkpoint_path: str,
    trigger_seconds: int | None = None,
) -> StreamingQuery:
    """Exactly-once path: normalize → native parquet sink partitioned by
    ``day``. The file sink's commit log + the checkpoint WAL make restarts
    and replays idempotent without any dedup."""
    datapoints = ingest_normalize(values)
    return (
        datapoints.writeStream.format("parquet")
        .option("path", sink_path)
        .option("checkpointLocation", checkpoint_path)
        .partitionBy("day")
        .trigger(**_trigger_kwargs(trigger_seconds))
        .start()
    )


def start_ingest_upsert_sink(
    values: DataFrame,
    sink_path: str,
    checkpoint_path: str,
    trigger_seconds: int | None = None,
    debug: bool = False,
) -> StreamingQuery:
    """Upsert-contract path (the reference's semantics): per micro-batch,
    PK-dedup and append — mirroring ``saveToCassandra``'s
    upsert-by-primary-key absorption of at-least-once redelivery
    (RawDataIngestion.java:152). ``debug=True`` adds the reference's
    10-row per-batch debug print (op 13) on the already-computed batch —
    no second pipeline execution."""
    datapoints = ingest_normalize(values)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            (
                dedup_on_pk(batch_df)
                .write.mode("append")
                .partitionBy("day")
                .parquet(sink_path)
            )
            if debug:
                batch_df.select("sample").show(DEBUG_ROWS, truncate=False)
        finally:
            batch_df.unpersist()

    return (
        datapoints.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(**_trigger_kwargs(trigger_seconds))
        .start()
    )


def drain_progress(
    query: StreamingQuery, n_messages: int, timeout_s: float = 300.0
) -> list[dict]:
    """Poll a running ingest query until ``n_messages`` source rows have
    been consumed (or ``timeout_s`` elapses) and return the non-empty
    progress events. Shared by tools/ingest_slo.py (the BASELINE
    measurement) and the CI batch-time guard so both read batch
    durations from the same accounting.

    ``recentProgress`` is a ~100-event ring buffer: a slow drain on a
    short trigger accumulates empty-batch events that EVICT the early
    data-bearing ones, so a naive sum over the buffer can permanently
    undercount and spin to timeout (ADVICE r7). Totals are therefore
    accumulated across polls — each batchId's numInputRows is added
    exactly once, and data-bearing events are retained even after the
    ring buffer drops them."""
    import time

    seen: dict[int, dict] = {}
    consumed = 0
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        for p in query.recentProgress:
            if p["batchId"] not in seen:
                seen[p["batchId"]] = p
                consumed += p["numInputRows"]
        if consumed >= n_messages:
            break
        time.sleep(0.5)
    else:
        for p in query.recentProgress:
            if p["batchId"] not in seen:
                seen[p["batchId"]] = p
    return [
        p
        for _, p in sorted(seen.items())
        if p["numInputRows"] > 0
    ]
