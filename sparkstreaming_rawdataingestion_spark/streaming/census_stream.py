"""Incremental vocab-usage census — the streaming twin of
``operators/text.py::tokenizer_piece_frequencies``.

A tokenizer team watching a continuously-ingested corpus wants the
piece census (per emitted piece: corpus occurrence count + document
frequency) kept current without rescanning the corpus per refresh.
Each micro-batch of documents is encoded ONCE by the SAME shared
greedy kernel the batch query uses (``tokenizer_piece_frequencies`` —
one matching implementation, every consumer moves together), and its
per-piece deltas are summed into a materialized census table.

State layout (the archive-as-state design, curation_stream.py, with
the additive-state hardening the round-10 review demanded — additive
counts, unlike the rollup stream's absolute totals, cannot be
recomputed after a lost write, so nothing here ever deletes the only
copy):

- ``<dir>/census`` — (piece, n_occurrences, n_docs, merged_seq,
  merged_key), partitioned by ``merged_key`` and written ONLY with
  dynamic partition overwrite: each merge lands a NEW full-census
  version in its own partition and never touches prior versions — a
  crash mid-write can tear at most the version being written, never
  the accumulated state. Reads take the max-``merged_seq`` version
  EXCLUDING the current merge key, so a retry ignores its own
  possibly-torn previous attempt and deterministically recomputes the
  same version over it (idempotence by recompute — no high-water-mark
  skip, hence no dependence on batch-id ORDER). Superseded versions
  are pruned best-effort (the two newest are kept); correctness never
  depends on pruning.
- ``<dir>/seen`` — (doc_id) partitioned by ``ingest_key``; the replay
  absorber. The census is additive, so at-least-once delivery needs
  an explicit dedup: a redelivered document anti-joins its archived
  doc_id and contributes nothing. Keys are RUN-SCOPED
  (sha(checkpoint_dir) + batch_id), so a fresh-checkpoint replay
  writes fresh partitions and every prior run's ids stay intact —
  absorption is content-addressed and does not care how a replay
  re-chunks or re-orders the source (the review's order-dependence
  finding). The anti-join excludes only the CURRENT key's partition,
  so a retry whose seen write landed but whose census write did not
  still computes the full delta.

Guarantee: final census equals the batch query over everything
delivered, regardless of batch boundaries (pure addition commutes) —
test-pinned via chunked arrival, full-replay, order-shuffled replay,
same-key retry and empty-first-batch runs. foreachBatch is sequential
across triggers, so the read-merge-write cycle is race-free.
"""

from __future__ import annotations

import hashlib

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
    without version columns, newly-seen doc ids). ``seen_other`` must
    hold every previously-absorbed doc_id EXCEPT ids a failed attempt
    of THIS merge key may have written (module docstring). Pure
    function over DataFrames — the IO wrapper adds versioning."""
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


def read_census(spark: SparkSession, sink_dir: str) -> DataFrame | None:
    """The CURRENT census: the max-merged_seq version, or None before
    the first merge (or when every version is empty). This is the
    consumer-facing read — dashboards and tests go through it."""
    latest, _ = _latest_version(spark, sink_dir, exclude_key=None)
    return latest


def _latest_version(
    spark: SparkSession, sink_dir: str, exclude_key: str | None
) -> tuple[DataFrame | None, int]:
    """(latest census version not written under ``exclude_key``, its
    merged_seq) — (None, 0) when no usable version exists. Excluding
    the current merge key is what makes a retry recompute over its own
    possibly-torn previous attempt instead of trusting it."""
    all_versions = read_archive(spark, f"{sink_dir}/census")
    if all_versions is None:
        return None, 0
    if exclude_key is not None:
        all_versions = all_versions.where(
            F.col("merged_key") != exclude_key
        )
    row = all_versions.agg(F.max("merged_seq")).first()
    if row is None or row[0] is None:
        # zero usable rows — behaves exactly like a missing table (the
        # review's empty-census crash: max() is NULL, never compare it)
        return None, 0
    seq = int(row[0])
    return all_versions.where(F.col("merged_seq") == seq), seq


def merge_batch(
    batch_docs: DataFrame,
    sink_dir: str,
    merge_key: str,
    pieces: tuple[str, ...] = VOCAB_GREEDY_PIECES,
) -> None:
    """One census merge under ``merge_key`` — idempotent: re-invoking
    with the same key (a foreachBatch retry, whatever the prior
    attempt managed to write) recomputes and overwrites the same
    version and re-lands the same seen partition."""
    spark = batch_docs.sparkSession
    prev, prev_seq = _latest_version(spark, sink_dir, exclude_key=merge_key)
    seen = read_archive(spark, f"{sink_dir}/seen")
    seen_other = (
        seen.where(F.col("ingest_key") != merge_key)
        if seen is not None
        else None
    )
    out, new_ids = census_increment(
        batch_docs, prev, seen_other, pieces=pieces
    )
    # localCheckpoint before writing: the merge reads files under the
    # same root it writes (the rollup_stream cut; census is
    # vocab-bounded, so this is a constant-size checkpoint)
    out = (
        out.withColumn("merged_seq", F.lit(prev_seq + 1).cast("long"))
        .withColumn("merged_key", F.lit(merge_key))
        .localCheckpoint(eager=True)
    )
    # a zero-row census (nothing counted yet — e.g. an opening batch of
    # empty texts) is NOT written: a row-less parquet version has no
    # readable schema and would wedge every later read; skipping keeps
    # the table absent-or-readable, and the seen write below still
    # absorbs the batch's doc ids
    if not out.isEmpty():
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("merged_key")
            .parquet(f"{sink_dir}/census")
        )
    (
        new_ids.withColumn("ingest_key", F.lit(merge_key))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("ingest_key")
        .parquet(f"{sink_dir}/seen")
    )
    _prune_superseded(spark, f"{sink_dir}/census", prev_seq)


def _prune_superseded(
    spark: SparkSession, census_dir: str, prev_seq: int
) -> None:
    """Best-effort retention: drop version partitions older than the
    previous one (keep current + previous). Correctness never depends
    on this — a failed prune just leaves extra tiny versions."""
    try:
        versions = spark.read.parquet(census_dir)
        stale = {
            r["merged_key"]
            for r in versions.select("merged_key", "merged_seq")
            .distinct()
            .collect()
            if r["merged_seq"] < prev_seq
        }
        if not stale:
            return
        jvm = spark._jvm
        path = jvm.org.apache.hadoop.fs.Path(census_dir)
        fs = path.getFileSystem(
            spark.sparkContext._jsc.hadoopConfiguration()
        )
        for st in fs.listStatus(path):
            name = st.getPath().getName()
            if (
                name.startswith("merged_key=")
                and name.split("=", 1)[1] in stale
            ):
                fs.delete(st.getPath(), True)
    except Exception:
        pass  # retention only; never fail the batch over cleanup


def start_incremental_census(
    doc_stream: DataFrame,
    sink_dir: str,
    checkpoint_dir: str,
    trigger_seconds: int | None = None,
    pieces: tuple[str, ...] = VOCAB_GREEDY_PIECES,
) -> StreamingQuery:
    """Streaming census query: document stream → live piece census.
    Merge keys are run-scoped (checkpoint identity + batch id), so
    batch ids from a fresh-checkpoint replay can never collide with —
    or overwrite — another run's state."""
    run = hashlib.sha256(checkpoint_dir.encode()).hexdigest()[:12]

    def process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        merge_batch(batch, sink_dir, f"{run}-{batch_id}", pieces=pieces)

    return (
        doc_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**_trigger_kwargs(trigger_seconds))
        .start()
    )
