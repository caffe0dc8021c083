"""Incremental (streaming) document curation — the micro-batch form of
``operators/pipeline.py``: each arriving batch of documents is language-
filtered, quality-filtered, exact-deduped and near-dup-checked against
BOTH itself and the accumulated curated archive, then appended.

Why foreachBatch and not a stateful operator: the dedup "state" here is
the curated corpus itself (content hashes + shingle index), which at
100 TB lives in the table, not in the state store. Reading the archive's
lightweight columns per micro-batch (sha + shingles, never full text)
and joining the small batch against them is the standard incremental-
curation shape; a RocksDB state store would just duplicate the table.
Archive reads prune to the two index columns (parquet column pruning),
and the batch side of every join is micro-batch-sized → broadcastable.

The archive always wins near-dup resolution (a new doc similar to an
archived one is dropped regardless of ids), while within a batch the
greedy keep-lowest-doc_id rule of the batch pipeline applies — so
streaming the corpus in doc_id order reproduces batch-pipeline survivor
semantics stage by stage.

Guarantee: at-least-once delivery absorbed idempotently — replaying a
processed batch appends nothing, because every replayed text is caught
by the exact-sha anti-join (the content-addressed analog of the
reference's Cassandra PK upsert, RawDataIngestion.java:152).

Layout adjudication (round 11): the census stream's seen index gained
hash-bucket partitioning so its per-batch anti-join prunes to touched
buckets (census_stream.SEEN_BUCKETS). The curated archive deliberately
stays FLAT: bucketing it by sha prefix would prune only the exact-sha
leg, while the dominant per-batch read — the shingle index feeding the
near-dup join — needs EVERY archived row regardless of layout (shingle
buckets are keyed by shingle, not by document sha, so no document-
keyed partition scheme prunes them). The archive's per-batch cost is
already bounded by column pruning to the two index columns; a sha
bucket column would add layout complexity for a leg that is not the
bottleneck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.dedup import JACCARD_THRESHOLD, _shingles, count_verified_pairs
from ..operators.pipeline import QUALITY_MIN, _exact_kept, score_documents
from .ingest_stream import _trigger_kwargs

# What the curated archive stores per document. ``shingles`` is the
# near-dup index (persisted so later batches never re-tokenize the
# archive); ``text_sha256`` is the exact-dup index.
ARCHIVE_COLUMNS = (
    "doc_id", "text", "predicted_lang", "quality_score", "text_sha256", "shingles",
)


def read_archive(spark: SparkSession, sink_dir: str) -> DataFrame | None:
    """Load the curated archive, or None if it doesn't exist yet.

    Only the missing-path case (first batch) maps to None — any other read
    failure re-raises. Swallowing transient errors here would silently skip
    the exact-sha and near-dup anti-joins and let a replayed batch append
    duplicates, breaking the idempotency guarantee."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(sink_dir)
    except AnalysisException as ex:
        cls = ""
        try:
            getter = getattr(ex, "getCondition", None) or ex.getErrorClass
            cls = getter() or ""
        except Exception:
            pass
        if "PATH_NOT_FOUND" in cls or "PATH_NOT_FOUND" in str(ex):
            return None
        raise


def curate_increment(
    batch: DataFrame,
    archive: DataFrame | None,
    classifier_gate: bool = False,
) -> DataFrame:
    """Curate one micro-batch of documents against the archive; returns
    the rows to append (ARCHIVE_COLUMNS).

    ``classifier_gate=True`` inserts the model-based quality stage
    between the heuristic filters and exact dedup — the batch
    pipeline's `_stages(classifier_gate=True)` ordering. The classifier
    is per-document and its weight table broadcasts (a frozen model),
    so the stage is trivially incremental: no cross-batch state, the
    same keep decision in every replay — streaming parity with
    ``pipeline_curation_classified`` holds stage for stage."""
    kept = score_documents(batch).where(
        (F.col("predicted_lang") == "en")
        & (F.col("quality_score") >= QUALITY_MIN)
    )
    if classifier_gate:
        from ..operators.text import quality_classifier_score
        from ..session import stage

        # score the heuristic SURVIVORS of this micro-batch only (the
        # batch pipeline's production ordering: model inference runs on
        # the reduced set). Staged: the scored frame feeds BOTH the
        # classifier leg and the semi-join probe side — without it the
        # regex/heuristic scoring subtree executes twice per trigger.
        # start_incremental_curation releases the stage after each
        # batch's append.
        kept = stage(kept)
        keep_ids = (
            quality_classifier_score(kept.select("doc_id", "text"))
            .where(F.col("keep"))
            .select("doc_id")
        )
        kept = kept.join(keep_ids, "doc_id", "left_semi")
    kept = _exact_kept(kept).drop("n_copies")
    kept = kept.withColumn("text_sha256", F.sha2("text", 256)).withColumn(
        "shingles", _shingles()
    )
    if archive is not None:
        # cross-batch exact dedup: content-addressed anti-join (32-byte keys)
        kept = kept.join(
            archive.select("text_sha256"), "text_sha256", "left_anti"
        )
    # within-batch near-dup (greedy keep-lowest-doc_id, as in the batch
    # pipeline) via the count-based inverted-index verifier
    batch_losers = (
        count_verified_pairs(kept.select("doc_id", "shingles"))
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    kept = kept.join(batch_losers, "doc_id", "left_anti")
    if archive is not None:
        # cross-batch near-dup: batch shingles vs the archive's persisted
        # shingle index; the archive always wins
        arch = archive.select(
            F.col("doc_id").alias("arch_id"), F.col("shingles").alias("arch_sh")
        )
        inv_new = kept.select("doc_id", F.explode("shingles").alias("shingle"))
        inv_arch = arch.select("arch_id", F.explode("arch_sh").alias("shingle"))
        shared = (
            inv_new.join(inv_arch, "shingle")
            .groupBy("doc_id", "arch_id")
            .agg(F.count("*").alias("shared"))
        )
        sz_new = kept.select("doc_id", F.size("shingles").alias("n_new"))
        sz_arch = arch.select("arch_id", F.size("arch_sh").alias("n_arch"))
        j = F.col("shared") * F.lit(1.0) / (
            F.col("n_new") + F.col("n_arch") - F.col("shared")
        )
        arch_losers = (
            shared.join(F.broadcast(sz_new), "doc_id")
            .join(sz_arch, "arch_id")
            .where(j >= JACCARD_THRESHOLD)
            .select("doc_id")
            .distinct()
        )
        kept = kept.join(arch_losers, "doc_id", "left_anti")
    return kept.select(*ARCHIVE_COLUMNS)


def start_incremental_curation(
    docs_stream: DataFrame,
    sink_dir: str,
    checkpoint_dir: str,
    trigger_seconds: int | None = None,
    classifier_gate: bool = False,
) -> StreamingQuery:
    """Streaming curation query: documents stream → curated archive.

    foreachBatch is sequential across triggers, so the read-archive /
    append-survivors cycle is race-free within one query."""

    def process(batch: DataFrame, _batch_id: int) -> None:
        from ..session import release_staged

        spark = batch.sparkSession
        out = curate_increment(
            batch, read_archive(spark, sink_dir), classifier_gate
        )
        out.write.mode("append").parquet(sink_dir)
        # drop the per-batch staged scoring frame (classifier_gate) so
        # a long-running stream never accumulates persisted batches
        release_staged()

    return (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**_trigger_kwargs(trigger_seconds))
        .start()
    )
