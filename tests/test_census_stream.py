"""Incremental streaming vocab census — archive semantics the batch
oracle can't cover: cross-batch additivity, replay absorption via the
run-scoped seen index, retry idempotence by recompute, and the
empty-state / order-shuffled-replay regressions from the round-10
review.
"""

from __future__ import annotations

import pytest

from sparkstreaming_rawdataingestion_spark.streaming import (
    census_stream as cs,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def chunked_docs(spark, tmp_path):
    """The documents corpus split into 3 doc_id-ordered chunks, one
    parquet file each (the file stream feeds them as separate
    micro-batches)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    src = tmp_path / "incoming"
    rows = docs.orderBy("doc_id").collect()
    n = len(rows)
    bounds = [0, n // 3, 2 * n // 3, n + 1]
    for i in range(3):
        chunk = rows[bounds[i]:bounds[i + 1]]
        spark.createDataFrame(chunk, docs.schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
    return docs, str(src)


def _run_stream(spark, src, schema, sink, ckpt):
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = cs.start_incremental_census(stream, sink, ckpt)
    q.awaitTermination(120)
    q.stop()


def _census(spark, sink):
    latest = cs.read_census(spark, sink)
    assert latest is not None
    return {
        r.piece: (r.n_occurrences, r.n_docs) for r in latest.collect()
    }


def test_streamed_census_equals_the_batch_query(spark, chunked_docs, tmp_path):
    """Addition commutes: the 3-batch streamed census must equal
    tokenizer_piece_frequencies over the whole corpus in one shot."""
    from sparkstreaming_rawdataingestion_spark.operators.text import (
        q_tokenizer_piece_frequencies,
    )

    docs, src = chunked_docs
    sink, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
    _run_stream(spark, src, docs.schema, sink, ckpt)

    batch = {
        r.piece: (r.n_occurrences, r.n_docs)
        for r in q_tokenizer_piece_frequencies(spark, SF).collect()
    }
    assert _census(spark, sink) == batch


def test_census_full_replay_changes_nothing(spark, chunked_docs, tmp_path):
    """At-least-once worst case: a full replay with a fresh checkpoint
    must be absorbed by the seen index — every count unchanged."""
    docs, src = chunked_docs
    sink = str(tmp_path / "state")
    _run_stream(spark, src, docs.schema, sink, str(tmp_path / "c1"))
    first = _census(spark, sink)
    _run_stream(spark, src, docs.schema, sink, str(tmp_path / "c2"))
    assert _census(spark, sink) == first


def test_same_batch_duplicate_delivery_counts_once(spark):
    """A duplicate delivery of the same doc inside one micro-batch
    must contribute once (the pre-encode doc_id dedup)."""
    docs = spark.createDataFrame(
        [(1, "spark spark"), (1, "spark spark")],
        "doc_id long, text string",
    )
    out, new_ids = cs.census_increment(docs, None, None)
    got = {
        r.piece: (r.n_occurrences, r.n_docs) for r in out.collect()
    }
    assert got == {"spark": (2, 1)}
    assert [r.doc_id for r in new_ids.collect()] == [1]


def test_retry_with_own_seen_partition_still_counts_the_batch(spark):
    """The failed-attempt shape: a retry reads a seen index that
    already holds ITS OWN ids (written by the failed attempt) — the
    caller excludes the current key's partition, so census_increment
    must be fed only the OTHER partitions and count the docs fully."""
    docs = spark.createDataFrame(
        [(7, "row row key")], "doc_id long, text string"
    )
    other = spark.createDataFrame([(3,)], "doc_id long")
    out, _ = cs.census_increment(docs, None, other)
    got = {r.piece: (r.n_occurrences, r.n_docs) for r in out.collect()}
    assert got == {"row": (2, 1), "key": (1, 1)}


def test_empty_first_batch_does_not_wedge_the_stream(spark, tmp_path):
    """Round-10 review regression: a first batch of only empty /
    whitespace-only texts writes a zero-row census version; the next
    merge must treat it like a missing table (max(merged_seq) over
    zero rows is NULL) instead of raising, and count the real batch."""
    sink = str(tmp_path / "state")
    empty = spark.createDataFrame(
        [(1, " "), (2, "")], "doc_id long, text string"
    )
    vocab = ("spark", "rocks")
    cs.merge_batch(empty, sink, "r-0", pieces=vocab)
    real = spark.createDataFrame(
        [(3, "spark rocks")], "doc_id long, text string"
    )
    cs.merge_batch(real, sink, "r-1", pieces=vocab)
    assert _census(spark, sink) == {
        "spark": (1, 1),
        "rocks": (1, 1),
    }


def test_same_key_retry_is_idempotent_by_recompute(spark, tmp_path):
    """A foreachBatch retry re-invokes the merge with the SAME key
    after ANY partial outcome — including full success. Recompute must
    land the identical version, never double-merge."""
    sink = str(tmp_path / "state")
    a = spark.createDataFrame([(1, "low low")], "doc_id long, text string")
    b = spark.createDataFrame([(2, "low")], "doc_id long, text string")
    cs.merge_batch(a, sink, "r-0", pieces=("low",))
    cs.merge_batch(b, sink, "r-1", pieces=("low",))
    first = _census(spark, sink)
    # retry after full success
    cs.merge_batch(b, sink, "r-1", pieces=("low",))
    assert _census(spark, sink) == first
    assert first == {"low": (3, 2)}


def test_order_shuffled_fresh_replay_is_absorbed(spark, tmp_path):
    """Round-10 review regression: a fresh-checkpoint replay that
    re-chunks AND re-orders the corpus must still be fully absorbed —
    run-scoped keys mean no replay partition can overwrite another
    run's seen ids, so absorption is content-addressed, not
    order-dependent."""
    sink = str(tmp_path / "state")
    d1 = spark.createDataFrame([(1, "alpha")], "doc_id long, text string")
    d2 = spark.createDataFrame([(2, "beta")], "doc_id long, text string")
    vocab = ("alpha", "beta")
    # run 1: [d1, d2]
    cs.merge_batch(d1, sink, "runA-0", pieces=vocab)
    cs.merge_batch(d2, sink, "runA-1", pieces=vocab)
    first = _census(spark, sink)
    # run 2 (fresh checkpoint): same corpus, REVERSED chunk order —
    # batch ids restart, so d2 lands on batch 0 and d1 on batch 1
    cs.merge_batch(d2, sink, "runB-0", pieces=vocab)
    cs.merge_batch(d1, sink, "runB-1", pieces=vocab)
    assert _census(spark, sink) == first
    assert first == {"alpha": (1, 1), "beta": (1, 1)}


def test_wiped_checkpoint_rechunked_replay_is_absorbed(
    spark, chunked_docs, tmp_path
):
    """The third review's empirical repro, fixed: rm -rf the checkpoint
    and replay the same corpus from a DIFFERENTLY-CHUNKED source over
    the same checkpoint path. The query identity (persisted UUID, not
    a path hash) regenerates, so no replay key can collide with run
    1's seen partitions — every count unchanged."""
    import shutil

    docs, src = chunked_docs
    sink, ckpt = str(tmp_path / "state"), str(tmp_path / "ck")
    _run_stream(spark, src, docs.schema, sink, ckpt)
    first = _census(spark, sink)

    shutil.rmtree(ckpt)
    src2 = str(tmp_path / "incoming2")  # same rows, 2 files not 3
    rows = docs.orderBy("doc_id").collect()
    half = len(rows) // 2
    for chunk in (rows[:half], rows[half:]):
        spark.createDataFrame(chunk, docs.schema).coalesce(1).write.mode(
            "append"
        ).parquet(src2)
    _run_stream(spark, src2, docs.schema, sink, ckpt)
    assert _census(spark, sink) == first


def test_torn_version_is_invisible_until_its_retry_repairs_it(
    spark, tmp_path
):
    """Commit-marker semantics: a version whose mark is missing (the
    torn-write shape) must be invisible — reads fall back to the last
    committed version — and the same-key retry must recompute, re-mark
    and repair it."""
    import os

    sink = str(tmp_path / "state")
    vocab = ("alpha", "beta")
    d1 = spark.createDataFrame([(1, "alpha")], "doc_id long, text string")
    d2 = spark.createDataFrame([(2, "beta")], "doc_id long, text string")
    cs.merge_batch(d1, sink, "k-1", pieces=vocab)
    cs.merge_batch(d2, sink, "k-2", pieces=vocab)
    assert _census(spark, sink) == {"alpha": (1, 1), "beta": (1, 1)}

    # simulate the torn commit: version 2 exists but is unmarked
    os.remove(f"{sink}/census_marks/2-k-2")
    assert _census(spark, sink) == {"alpha": (1, 1)}

    # the supported recovery: retry under the same key repairs exactly
    cs.merge_batch(d2, sink, "k-2", pieces=vocab)
    assert _census(spark, sink) == {"alpha": (1, 1), "beta": (1, 1)}


def test_seen_index_is_bucket_partitioned_and_pruning_is_exact(
    spark, tmp_path
):
    """Round-11 layout: the seen index is partitioned by (ingest_key,
    id_bucket) with bucket = pmod(xxhash64(doc_id), SEEN_BUCKETS), and
    the touched-bucket pruned anti-join absorbs a cross-key redelivery
    exactly like the unpruned scan would — redelivered ids contribute
    nothing, fresh ids count once. Also pins that a later merge under
    a different key leaves every earlier key's bucket files untouched
    (dynamic overwrite lands only under the writing key)."""
    import os

    from pyspark.sql import functions as F

    sink = str(tmp_path / "census_state")
    b1 = spark.createDataFrame(
        [(i, "alpha") for i in range(10)], "doc_id long, text string"
    )
    cs.merge_batch(b1, sink, "key-one")

    # layout: ingest_key / id_bucket directory nesting, correct buckets
    key_dir = f"{sink}/seen/ingest_key=key-one"
    buckets_on_disk = sorted(
        int(d.split("=")[1])
        for d in os.listdir(key_dir)
        if d.startswith("id_bucket=")
    )
    expected = sorted(
        r.b
        for r in b1.select(
            F.pmod(F.xxhash64("doc_id"), F.lit(cs.SEEN_BUCKETS))
            .cast("int")
            .alias("b")
        )
        .distinct()
        .collect()
    )
    assert buckets_on_disk == expected

    snapshot = {}
    for root, _dirs, files in os.walk(key_dir):
        for f in files:
            p = os.path.join(root, f)
            snapshot[p] = (os.path.getmtime(p), os.path.getsize(p))

    # second merge under a NEW key: 5 redelivered ids + 5 fresh ones
    b2 = spark.createDataFrame(
        [(i, "alpha") for i in range(5, 15)], "doc_id long, text string"
    )
    cs.merge_batch(b2, sink, "key-two")

    got = {
        r.piece: (r.n_occurrences, r.n_docs)
        for r in cs.read_census(spark, sink).collect()
    }
    # docs 0..14 counted once each, replays absorbed; the frozen vocab
    # has no 'alpha' piece, so the encoder emits its chars (a l p h a)
    assert got == {
        "a": (30, 15),
        "l": (15, 15),
        "p": (15, 15),
        "h": (15, 15),
    }

    after = {}
    for root, _dirs, files in os.walk(key_dir):
        for f in files:
            p = os.path.join(root, f)
            after[p] = (os.path.getmtime(p), os.path.getsize(p))
    assert after == snapshot  # key-one's bucket files byte-untouched


def test_seen_bucket_migration_round_trip(spark, tmp_path, monkeypatch):
    """migrate_seen_buckets rewrites the seen index to a new bucket
    count with data equivalence: after migration (64 -> 128), a
    session on the old constant refuses loudly (bucket_layout guard),
    while a 128-bucket session absorbs a full replay exactly as
    before (the round-13 print-archive discipline, generalized)."""
    import os
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "tools")
    )
    import migrate_seen_buckets as mig

    def docs(ids):
        return spark.createDataFrame(
            [(i, "low low") for i in ids], "doc_id long, text string"
        )

    sink = str(tmp_path / "census")
    cs.merge_batch(docs([0, 1, 2]), sink, "r-0", pieces=("low",))
    cs.merge_batch(docs([3, 4]), sink, "r-1", pieces=("low",))
    before = _census(spark, sink)
    seen_dir = f"{sink}/seen"
    before_ids = sorted(
        r.doc_id for r in spark.read.parquet(seen_dir).collect()
    )

    mig.migrate(spark, seen_dir, 128)

    # old-constant session refuses the next merge
    with pytest.raises(ValueError, match="migrate_seen_buckets"):
        cs.merge_batch(docs([5]), sink, "r-2", pieces=("low",))

    # new-constant session: same ids on disk, replay fully absorbed
    monkeypatch.setattr(cs, "SEEN_BUCKETS", 128)
    after_ids = sorted(
        r.doc_id for r in spark.read.parquet(seen_dir).collect()
    )
    assert after_ids == before_ids
    cs.merge_batch(docs([0, 1, 2]), sink, "rB-0", pieces=("low",))
    cs.merge_batch(docs([3, 4]), sink, "rB-1", pieces=("low",))
    assert _census(spark, sink) == before
    # the partition layout really is 128-bucketed for new writes
    cs.merge_batch(docs([5]), sink, "r-3", pieces=("low",))
    import glob as _glob

    dirs = _glob.glob(f"{seen_dir}/ingest_key=*/id_bucket=*")
    assert dirs and all(
        int(d.rsplit("=", 1)[1]) < 128 for d in dirs
    )
