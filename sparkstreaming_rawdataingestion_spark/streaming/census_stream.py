"""Incremental vocab-usage census — the streaming twin of
``operators/text.py::tokenizer_piece_frequencies``.

A tokenizer team watching a continuously-ingested corpus wants the
piece census (per emitted piece: corpus occurrence count + document
frequency) kept current without rescanning the corpus per refresh.
Each micro-batch of documents is encoded ONCE by the SAME shared
greedy kernel the batch query uses (``tokenizer_piece_frequencies`` —
one matching implementation, every consumer moves together), and its
per-piece deltas are summed into a materialized census table.

State layout (the archive-as-state design, curation_stream.py):

- ``<dir>/census`` — (piece, n_occurrences, n_docs, merged_through),
  REWRITTEN each batch; bounded by |vocab| + unknown chars, so the
  rewrite is a constant-size job no matter how much corpus has flowed
  through. ``merged_through`` (the highest merged batch id, constant
  across rows) makes the merge a no-op when foreachBatch RETRIES a
  batch whose census write already landed.
- ``<dir>/seen`` — (doc_id) partitioned by ``ingest_batch``; the
  replay absorber. The census is additive, so at-least-once delivery
  needs an explicit dedup: a redelivered document anti-joins its own
  archived doc_id and contributes nothing. Written with DYNAMIC
  partition overwrite to the batch's own partition — a retried batch
  replaces its own ids instead of appending duplicates — and the
  anti-join reads every partition EXCEPT the current batch's, so a
  retry whose seen write landed but whose census write did not still
  computes the full delta.

Retry analysis (the two state writes cannot be one atomic commit):
census is written FIRST, then seen. Fail before census → retry
recomputes the same delta (anti-join excludes own partition). Fail
between the writes → retry sees ``merged_through == batch_id``, skips
the merge, and (re)writes only the seen partition. Cross-restart
replays (fresh checkpoint over the same source) re-form the same
deterministic batches, so partition overwrite replaces like with like
— the same same-chunking contract the curation and media stream
replay guarantees rest on.

Guarantee: final census equals the batch query over everything
delivered, regardless of batch boundaries (pure addition commutes) —
test-pinned via chunked arrival + full-replay runs. foreachBatch is
sequential across triggers, so the read-merge-rewrite cycle is
race-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.text import (
    VOCAB_GREEDY_PIECES,
    tokenizer_piece_frequencies,
)
from .curation_stream import read_archive
from .ingest_stream import _trigger_kwargs

CENSUS_COLUMNS = ("piece", "n_occurrences", "n_docs")


def census_increment(
    batch_docs: DataFrame,
    census: DataFrame | None,
    seen_other: DataFrame | None,
    pieces: tuple[str, ...] = VOCAB_GREEDY_PIECES,
) -> tuple[DataFrame, DataFrame]:
    """Merge one micro-batch into the census; returns (new full census
    without the merged_through stamp, newly-seen doc ids).
    ``seen_other`` must hold every previously-absorbed doc_id EXCEPT
    ids a failed attempt of THIS batch may have written (module
    docstring). Pure function over DataFrames — the streaming wrapper
    adds IO and the retry guard."""
    new_docs = batch_docs.select("doc_id", "text").dropDuplicates(
        ["doc_id"]
    )
    if seen_other is not None:
        new_docs = new_docs.join(
            seen_other.select("doc_id"), "doc_id", "left_anti"
        )
    delta = tokenizer_piece_frequencies(new_docs, pieces=pieces)
    merged = (
        delta
        if census is None
        else census.select(*CENSUS_COLUMNS).unionByName(delta)
    )
    out = merged.groupBy("piece").agg(
        F.sum("n_occurrences").cast("long").alias("n_occurrences"),
        F.sum("n_docs").cast("long").alias("n_docs"),
    )
    return out, new_docs.select("doc_id")


def start_incremental_census(
    doc_stream: DataFrame,
    sink_dir: str,
    checkpoint_dir: str,
    trigger_seconds: int | None = None,
    pieces: tuple[str, ...] = VOCAB_GREEDY_PIECES,
) -> StreamingQuery:
    """Streaming census query: document stream → live piece census."""

    def process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        census = read_archive(spark, f"{sink_dir}/census")
        seen = read_archive(spark, f"{sink_dir}/seen")
        seen_other = (
            seen.where(F.col("ingest_batch") != batch_id)
            if seen is not None
            else None
        )
        already_merged = census is not None and (
            census.agg(F.max("merged_through")).first()[0] >= batch_id
        )
        out, new_ids = census_increment(
            batch, census, seen_other, pieces=pieces
        )
        if not already_merged:
            # materialize before overwriting — the merge reads the
            # files the write replaces (the rollup_stream cut; census
            # is vocab-bounded, so this is a constant-size checkpoint)
            out = out.withColumn(
                "merged_through", F.lit(batch_id).cast("long")
            ).localCheckpoint(eager=True)
            out.write.mode("overwrite").parquet(f"{sink_dir}/census")
        (
            new_ids.withColumn(
                "ingest_batch", F.lit(batch_id).cast("long")
            )
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch")
            .parquet(f"{sink_dir}/seen")
        )

    return (
        doc_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**_trigger_kwargs(trigger_seconds))
        .start()
    )
