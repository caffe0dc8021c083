"""Streaming decontamination monitor — the intake-time form of
``decontamination_ngram_overlap``: documents arriving for a training
corpus are checked against a STATIC eval/benchmark index per
micro-batch, and contaminated (train, eval) pairs append to a report
table a removal policy (or an alert) reads.

Why foreachBatch and not a streaming aggregation: the per-pair
shared-gram count groups grams of ONE arriving document, and a document
arrives whole inside a single micro-batch — there is no cross-batch
n-gram state to carry, so the batch kernel (`decontamination_pairs`)
applies verbatim to each increment. The eval side is a benchmark —
small and frozen for the life of the monitor — so its inverted gram
index and per-doc sizes are staged (persisted) ONCE at query start and
every batch joins against the same broadcast frames; the arriving
batch's grams never shuffle.

Guarantee: at-least-once delivery absorbed idempotently — a replayed
batch's pairs are dropped by an anti-join on (train_doc_id,
eval_doc_id) against the already-written report (pair-sized, never
documents), the same content-addressed absorption curation_stream uses
for its archive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from .. import session
from ..operators.dedup import build_eval_index, decontamination_pairs
from .curation_stream import read_archive
from .ingest_stream import _trigger_kwargs

REPORT_COLUMNS = (
    "train_doc_id", "eval_doc_id", "shared_ngrams", "eval_coverage",
)


def decon_increment(
    batch: DataFrame,
    ev: DataFrame,
    ev_sizes: DataFrame,
    report: DataFrame | None,
) -> DataFrame:
    """Contaminated pairs of one micro-batch, minus pairs the report
    already holds (replay absorption).

    The anti-join absorbs replays only ACROSS micro-batches; a train
    document delivered twice INSIDE one batch (producer duplicates under
    at-least-once) would double its gram rows and inflate the persisted
    shared_ngrams/eval_coverage 2x (ADVICE r7) — so duplicate doc_ids
    are dropped from the arriving batch first. Gram counts per (train,
    eval) pair are invariant to WHICH copy survives: the kernel counts
    distinct shared grams of the document's text."""
    pairs = decontamination_pairs(
        batch.dropDuplicates(["doc_id"]), ev, ev_sizes
    )
    if report is not None:
        pairs = pairs.join(
            report.select("train_doc_id", "eval_doc_id"),
            ["train_doc_id", "eval_doc_id"],
            "left_anti",
        )
    return pairs


def start_decon_stream(
    docs_stream: DataFrame,
    eval_docs: DataFrame,
    report_dir: str,
    checkpoint_dir: str,
    trigger_seconds: int | None = None,
) -> StreamingQuery:
    """Monitor a document stream for eval contamination. ``eval_docs``
    is the static benchmark table; its index is staged once here (not
    per batch) — at 100 TB the arriving increment is micro-batch-sized
    and the benchmark is model-table-sized, so every join broadcasts."""
    ev, ev_sizes = build_eval_index(eval_docs)
    ev = session.stage(ev)
    ev_sizes = session.stage(ev_sizes)

    def write_batch(batch_df: DataFrame, _batch_id: int) -> None:
        spark = batch_df.sparkSession
        report = read_archive(spark, report_dir)
        out = decon_increment(batch_df, ev, ev_sizes, report)
        out.select(*REPORT_COLUMNS).write.mode("append").parquet(report_dir)

    return (
        docs_stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**_trigger_kwargs(trigger_seconds))
        .start()
    )
