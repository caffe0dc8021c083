"""Streaming PII scrub on the ingest path — the destructive
``pii_redact_text`` transform running where a production pipeline
actually wants it: on the live stream, BEFORE anything lands in the
day-partitioned sink, so raw identifiers never touch durable storage.

Composition, not re-implementation: the scrub is the same
``PII_DIGIT_RUN`` / ``PII_REDACTION_TOKEN`` pair the batch operator and
its audit (``pii_redaction_stats``) share — three consumers, one
pattern, so the stream, the batch pass and the audit can never
disagree about what counts as a digit run.

Shape: a pure map-side projection appended to ``ingest_normalize`` —
zero extra shuffles, zero state, exactly-once through the native
parquet sink's commit log, with the per-batch redaction volume exposed
through the same ``observe()`` channel the ingest drop-counter uses
(op 13's metrics idiom), so an operator can alarm on a redaction-rate
spike (a PII leak upstream) straight from StreamingQueryProgress.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.ingest import ingest_normalize
from ..operators.validation import PII_DIGIT_RUN, PII_REDACTION_TOKEN
from .ingest_stream import _trigger_kwargs

OBSERVATION_NAME = "pii_scrub"


def scrub_datapoints(datapoints: DataFrame) -> DataFrame:
    """Redact every digit run in the opaque ``sample`` payload and carry
    the per-row match count forward as ``n_redacted`` (the sink-side
    audit column). Map-only; works identically on a batch or streaming
    frame — the parity tests run it both ways."""
    return datapoints.withColumn(
        "n_redacted",
        F.regexp_count("sample", F.lit(PII_DIGIT_RUN)).cast("long"),
    ).withColumn(
        "sample",
        F.regexp_replace("sample", PII_DIGIT_RUN, PII_REDACTION_TOKEN),
    )


def start_scrubbed_ingest(
    values: DataFrame,
    sink_path: str,
    checkpoint_path: str,
    trigger_seconds: int | None = None,
) -> StreamingQuery:
    """normalize → scrub → observe → day-partitioned parquet, one
    query. The observed metrics (rows, total_redacted) ride each
    StreamingQueryProgress event — the redaction-rate signal costs no
    second pass over the batch."""
    scrubbed = scrub_datapoints(ingest_normalize(values)).observe(
        OBSERVATION_NAME,
        F.count(F.lit(1)).alias("rows"),
        F.sum("n_redacted").alias("total_redacted"),
    )
    return (
        scrubbed.writeStream.format("parquet")
        .option("path", sink_path)
        .option("checkpointLocation", checkpoint_path)
        .partitionBy("day")
        .trigger(**_trigger_kwargs(trigger_seconds))
        .start()
    )
