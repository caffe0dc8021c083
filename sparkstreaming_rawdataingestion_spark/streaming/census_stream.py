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
the additive-state hardening two review rounds demanded — additive
counts, unlike the rollup stream's absolute totals, cannot be
recomputed after a lost write, so nothing here ever deletes the only
copy and nothing trusts an uncommitted one):

- ``<dir>/census`` — (piece, n_occurrences, n_docs, merged_seq,
  merged_key), partitioned by ``merged_key`` and written ONLY with
  dynamic partition overwrite: each merge lands a NEW full-census
  version in its own partition and never touches prior versions — a
  crash mid-write can tear at most the version being written, never
  the accumulated state.
- ``<dir>/census_marks/<seq>-<key>`` — zero-byte COMMIT MARKERS,
  created only after a version's parquet write returns. Readers trust
  exclusively marked versions, so a torn partition (job killed mid
  file-commit) is invisible to dashboards and to later merges alike;
  pruning removes a stale version's mark BEFORE its partition, so a
  crash between the two deletes leaves an unmarked (invisible)
  partition, never a marked ghost.
- reads take the max-seq MARKED version EXCLUDING the current merge
  key, so a retry — same-run or after a restart from the same
  checkpoint — recomputes over its own previous attempt instead of
  trusting it (idempotence by recompute; no high-water mark, hence no
  dependence on batch-id order).
- ``<dir>/seen`` — (doc_id) partitioned by ``ingest_key`` and
  ``id_bucket`` (``pmod(xxhash64(doc_id), SEEN_BUCKETS)`` — the
  cdc_stream bucket-layout pattern); the replay absorber. The census
  is additive, so at-least-once delivery needs an explicit dedup: a
  redelivered document anti-joins its archived doc_id and contributes
  nothing. Keys are scoped by the STREAMING QUERY IDENTITY — the UUID
  Spark persists in ``<checkpoint>/metadata`` — which is stable
  across restarts from the same checkpoint (a cross-restart retry of
  batch N still excludes its own partial writes) and REGENERATED when
  the checkpoint is wiped (the second review's empirical repro: a
  path hash collides on the standard rm-rf-and-reuse replay, double
  counting and destroying absorption records; the query id cannot).
  The anti-join excludes the CURRENT key's partitions and PRUNES to
  the id buckets the batch actually touches (a bounded ≤ SEEN_BUCKETS
  driver list, layout metadata not data): the index still grows with
  corpus rows, but a micro-batch's anti-join scan is bounded by the
  touched buckets' share of it — at 100 TB the per-batch read is
  |seen| x |touched buckets| / SEEN_BUCKETS, not |seen|.

Residual window, stated honestly: the census write and the seen write
cannot be one atomic commit without a transactional table format
(Delta/Iceberg in production — not in this environment). If a merge
commits its census version but dies before its seen write, the
SUPPORTED recovery — restarting from the same checkpoint — repairs it
exactly (same key: the retry recomputes the version and re-lands the
seen partition). Only abandoning that checkpoint mid-tear and
replaying fresh can double-count that single batch (its docs are in a
committed version but in no seen partition). Every other replay shape
— re-chunked, re-ordered, wiped-and-reused path, full redelivery — is
absorbed content-addressed.

Guarantee: final census equals the batch query over everything
delivered, regardless of batch boundaries (pure addition commutes) —
test-pinned via chunked arrival, full-replay, wiped-checkpoint
re-chunked replay, same-key retry, torn-version invisibility and
empty-first-batch runs. foreachBatch is sequential across triggers,
so the read-merge-write cycle is race-free.
"""

from __future__ import annotations

import hashlib
import json

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.text import (
    VOCAB_GREEDY_PIECES,
    tokenizer_piece_frequencies,
)
from .curation_stream import read_archive
from .ingest_stream import _trigger_kwargs

CENSUS_COLUMNS = ("piece", "n_occurrences", "n_docs")

#: hash-bucket partition count for the seen index's directory layout
#: (cdc_stream.N_BUCKETS discipline: a layout constant — raise it so a
#: bucket's id set fits an executor at the target corpus size)
SEEN_BUCKETS = 64
SEEN_MARKER = "seen_buckets"  # .seen_buckets.N marker (bucket_layout)


def _seen_bucket(col):
    return F.pmod(F.xxhash64(col), F.lit(SEEN_BUCKETS)).cast("int")


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


# ---------------------------------------------------------------------------
# filesystem helpers (Hadoop FS — works for local paths and lake URIs)
# ---------------------------------------------------------------------------


def _fs(spark: SparkSession, any_path: str):
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(any_path)
    return path.getFileSystem(
        spark.sparkContext._jsc.hadoopConfiguration()
    ), jvm


def _list_marks(spark: SparkSession, sink_dir: str) -> list[tuple[int, str]]:
    """[(seq, key)] of committed census versions (empty if none)."""
    fs, jvm = _fs(spark, sink_dir)
    marks_path = jvm.org.apache.hadoop.fs.Path(f"{sink_dir}/census_marks")
    if not fs.exists(marks_path):
        return []
    out = []
    for st in fs.listStatus(marks_path):
        name = st.getPath().getName()
        seq, _, key = name.partition("-")
        if seq.isdigit() and key:
            out.append((int(seq), key))
    return out


def _mark_committed(
    spark: SparkSession, sink_dir: str, seq: int, key: str
) -> None:
    fs, jvm = _fs(spark, sink_dir)
    p = jvm.org.apache.hadoop.fs.Path(
        f"{sink_dir}/census_marks/{seq}-{key}"
    )
    fs.create(p, True).close()


def read_census(spark: SparkSession, sink_dir: str) -> DataFrame | None:
    """The CURRENT census: the max-seq COMMITTED version, or None
    before the first committed merge. This is the consumer-facing
    read — dashboards and tests go through it."""
    latest, _ = _latest_version(spark, sink_dir, exclude_key=None)
    return latest


def _latest_version(
    spark: SparkSession, sink_dir: str, exclude_key: str | None
) -> tuple[DataFrame | None, int]:
    """(latest MARKED census version not written under ``exclude_key``,
    its merged_seq) — (None, 0) when no committed version exists.
    Excluding the current merge key is what makes a retry recompute
    over its own possibly-torn previous attempt; trusting only marked
    versions is what makes everyone else's torn writes invisible."""
    marks = [
        (seq, key)
        for seq, key in _list_marks(spark, sink_dir)
        if exclude_key is None or key != exclude_key
    ]
    if not marks:
        return None, 0
    seq, key = max(marks)
    table = read_archive(spark, f"{sink_dir}/census")
    if table is None:
        return None, 0
    if "merged_key" not in table.columns or "merged_seq" not in table.columns:
        raise ValueError(
            "census table layout mismatch: expected versioned columns "
            "(merged_seq, merged_key) — this directory was written by "
            "an incompatible census layout; point the stream at a "
            "fresh state dir or migrate the old table"
        )
    return (
        table.where(
            (F.col("merged_seq") == seq) & (F.col("merged_key") == key)
        ),
        seq,
    )


def merge_batch(
    batch_docs: DataFrame,
    sink_dir: str,
    merge_key: str,
    pieces: tuple[str, ...] = VOCAB_GREEDY_PIECES,
) -> None:
    """One census merge under ``merge_key`` — idempotent: re-invoking
    with the same key (a foreachBatch retry, same run or after a
    same-checkpoint restart, whatever the prior attempt managed to
    write) recomputes and overwrites the same version, re-marks it and
    re-lands the same seen partition."""
    # one batch scan for the whole merge: the touched-bucket collect
    # below and census_increment's encode both read this frame — an
    # unpersisted source would be re-evaluated per consumer (r11
    # advice). Released in the finally below, after every write.
    batch_docs = batch_docs.persist()
    try:
        _merge_batch_inner(batch_docs, sink_dir, merge_key, pieces)
    finally:
        batch_docs.unpersist()


def _merge_batch_inner(
    batch_docs: DataFrame,
    sink_dir: str,
    merge_key: str,
    pieces: tuple[str, ...],
) -> None:
    from .bucket_layout import check_bucket_marker

    spark = batch_docs.sparkSession
    prev, prev_seq = _latest_version(spark, sink_dir, exclude_key=merge_key)
    # bucket-count guard (r13, the print-archive discipline applied
    # here too): an id written at xxhash64 % 64 is not in the
    # partition a % 128 reader prunes to — a SEEN_BUCKETS change over
    # an existing seen table would silently re-admit absorbed ids.
    seen_marked = check_bucket_marker(
        spark,
        f"{sink_dir}/seen",
        SEEN_MARKER,
        SEEN_BUCKETS,
        "tools/migrate_seen_buckets.py",
        bucket_col="id_bucket",
        recompute=lambda df: F.pmod(
            F.xxhash64(F.col("doc_id")), F.lit(SEEN_BUCKETS)
        ).cast("int"),
    )
    seen = read_archive(spark, f"{sink_dir}/seen")
    if seen is not None and not {"ingest_key", "id_bucket"} <= set(
        seen.columns
    ):
        raise ValueError(
            "seen table layout mismatch: expected (ingest_key, "
            "id_bucket) partition columns — this directory was written "
            "by an incompatible census layout; point the stream at a "
            "fresh state dir or migrate the old table"
        )
    seen_other = None
    if seen is not None:
        # touched-bucket list: bounded by SEEN_BUCKETS (layout
        # metadata, not data — the cdc_stream discipline). Ids outside
        # the batch's buckets cannot match the anti-join, so pruning
        # the seen scan to touched buckets is exact; the isin filter
        # lands on the partition column and prunes the file listing.
        buckets = [
            r.b
            for r in batch_docs.select(
                _seen_bucket(F.col("doc_id")).alias("b")
            )
            .distinct()
            .collect()
        ]
        seen_other = seen.where(
            (F.col("ingest_key") != merge_key)
            & F.col("id_bucket").isin(buckets)
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
        _mark_committed(spark, sink_dir, prev_seq + 1, merge_key)
    (
        new_ids.withColumn("ingest_key", F.lit(merge_key))
        .withColumn("id_bucket", _seen_bucket(F.col("doc_id")))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("ingest_key", "id_bucket")
        .parquet(f"{sink_dir}/seen")
    )
    if not seen_marked:
        from .bucket_layout import write_bucket_marker

        write_bucket_marker(
            spark, f"{sink_dir}/seen", SEEN_MARKER, SEEN_BUCKETS
        )
    _prune_superseded(spark, sink_dir, prev_seq)


def _prune_superseded(
    spark: SparkSession, sink_dir: str, prev_seq: int
) -> None:
    """Best-effort retention: drop version partitions older than the
    previous one (keep current + previous). Marks go BEFORE partitions
    so a crash mid-prune leaves an unmarked (invisible) partition,
    never a marked ghost. Correctness never depends on pruning — a
    failed prune just leaves extra tiny versions."""
    try:
        stale = [
            (seq, key)
            for seq, key in _list_marks(spark, sink_dir)
            if seq < prev_seq
        ]
        if not stale:
            return
        fs, jvm = _fs(spark, sink_dir)
        for seq, key in stale:
            fs.delete(
                jvm.org.apache.hadoop.fs.Path(
                    f"{sink_dir}/census_marks/{seq}-{key}"
                ),
                False,
            )
            fs.delete(
                jvm.org.apache.hadoop.fs.Path(
                    f"{sink_dir}/census/merged_key={key}"
                ),
                True,
            )
    except Exception:
        pass  # retention only; never fail the batch over cleanup


def _query_identity(spark: SparkSession, checkpoint_dir: str) -> str:
    """The streaming query's persisted UUID (``<checkpoint>/metadata``)
    — stable across restarts from the same checkpoint, regenerated
    when the checkpoint is wiped: exactly the run-identity the seen
    index needs (a checkpoint-PATH hash collides on wipe-and-reuse).
    Falls back to the path hash only if the metadata file is somehow
    unreadable at batch time (it is written before the first batch)."""
    try:
        fs, jvm = _fs(spark, checkpoint_dir)
        p = jvm.org.apache.hadoop.fs.Path(f"{checkpoint_dir}/metadata")
        stream = fs.open(p)
        try:
            raw = bytes(
                stream.readAllBytes()
            )  # java InputStream.readAllBytes
        finally:
            stream.close()
        ident = json.loads(raw.decode("utf-8"))["id"]
        return ident.replace("-", "")[:16]
    except Exception:
        return hashlib.sha256(checkpoint_dir.encode()).hexdigest()[:12]


def start_incremental_census(
    doc_stream: DataFrame,
    sink_dir: str,
    checkpoint_dir: str,
    trigger_seconds: int | None = None,
    pieces: tuple[str, ...] = VOCAB_GREEDY_PIECES,
) -> StreamingQuery:
    """Streaming census query: document stream → live piece census.
    Merge keys are (query identity, batch id) — see _query_identity —
    so batch ids from any replay can never collide with another run's
    state, while same-checkpoint restarts keep their keys."""
    ident: dict[str, str] = {}

    def process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        if "run" not in ident:
            ident["run"] = _query_identity(
                batch.sparkSession, checkpoint_dir
            )
        merge_batch(
            batch, sink_dir, f"{ident['run']}.{batch_id}", pieces=pieces
        )

    return (
        doc_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**_trigger_kwargs(trigger_seconds))
        .start()
    )
