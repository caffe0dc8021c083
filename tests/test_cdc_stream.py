"""CDC-apply stream: MERGE maintenance of a keyed table from a change
stream — parity with a sequential reference application, replay
idempotency, and partition-pruned maintenance writes."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sparkstreaming_rawdataingestion_spark.streaming import cdc_stream

CHANGE_SCHEMA = (
    "o_orderkey long, action string, c_custkey long, "
    "new_price double, seq long"
)


def _seed(spark, path):
    base = spark.createDataFrame(
        [(k, 100 + k, float(10 * k)) for k in range(1, 21)],
        "o_orderkey long, o_custkey long, totalprice double",
    )
    cdc_stream.seed_base_table(base, path)
    return base


def _reference_apply(base_rows, changes):
    """Sequential reference: apply changes in seq order, key by key."""
    state = {k: (c, p, 0) for k, c, p in base_rows}
    for key, action, ck, price, seq in sorted(changes, key=lambda c: c[4]):
        cur = state.get(key)
        if cur is not None and seq <= cur[2]:
            continue
        if action == "D":
            state.pop(key, None)
        else:
            state[key] = (ck, price, seq)
    return {k: (c, p) for k, (c, p, _) in state.items()}


def _run_stream(spark, src, path, ckpt):
    stream = spark.readStream.schema(CHANGE_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = cdc_stream.start_cdc_apply_stream(stream, path, ckpt)
    q.awaitTermination()


def _table(spark, path):
    return {
        r.o_orderkey: (r.o_custkey, r.totalprice)
        for r in spark.read.parquet(path).collect()
    }


CHANGES_B1 = [
    (1, "U", 101, 111.0, 1),   # update
    (2, "D", 102, 0.0, 2),     # delete
    (50, "I", 500, 555.0, 3),  # insert new key
    (3, "U", 103, 900.0, 4),
    (3, "U", 103, 333.0, 5),   # same-key later change supersedes in-batch
]
CHANGES_B2 = [
    (50, "U", 500, 556.0, 6),   # update the key inserted in batch 1
    (2, "I", 102, 222.0, 7),    # re-insert a deleted key
    (4, "D", 104, 0.0, 8),
    (1, "U", 101, 0.5, 0),      # STALE (seq 0 < applied seq 1) → no-op
]


def test_cdc_stream_matches_sequential_reference(spark, tmp_path):
    path = str(tmp_path / "base")
    src = str(tmp_path / "changes")
    base = _seed(spark, path)

    for i, batch in enumerate([CHANGES_B1, CHANGES_B2]):
        spark.createDataFrame(batch, CHANGE_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    _run_stream(spark, src, path, str(tmp_path / "ckpt"))

    want = _reference_apply(
        [(r.o_orderkey, r.o_custkey, r.totalprice) for r in base.collect()],
        CHANGES_B1 + CHANGES_B2,
    )
    assert _table(spark, path) == want
    # spot-check the interesting keys
    got = _table(spark, path)
    assert got[3] == (103, 333.0)      # in-batch supersede
    assert got[50] == (500, 556.0)     # insert then cross-batch update
    assert got[2] == (102, 222.0)      # delete then re-insert
    assert 4 not in got                # deleted
    assert got[1] == (101, 111.0)      # stale change ignored


def test_cdc_replay_is_idempotent(spark, tmp_path):
    """Re-running the whole changelog against the already-maintained
    table (fresh checkpoint = full at-least-once replay) changes
    nothing: the seq guard rejects every already-applied change."""
    path = str(tmp_path / "base")
    src = str(tmp_path / "changes")
    _seed(spark, path)
    for batch in [CHANGES_B1, CHANGES_B2]:
        spark.createDataFrame(batch, CHANGE_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    _run_stream(spark, src, path, str(tmp_path / "ck1"))
    first = _table(spark, path)
    _run_stream(spark, src, path, str(tmp_path / "ck2"))  # full replay
    assert _table(spark, path) == first


def test_cdc_touches_only_changed_buckets(spark, tmp_path):
    """Maintenance writes are partition-pruned: bucket directories with
    no changed keys keep byte-identical files."""
    path = str(tmp_path / "base")
    src = str(tmp_path / "changes")
    _seed(spark, path)

    def bucket_files():
        out = {}
        for d in os.listdir(path):
            if d.startswith("bucket="):
                full = os.path.join(path, d)
                out[d] = sorted(
                    (f, os.path.getmtime(os.path.join(full, f)))
                    for f in os.listdir(full)
                    if f.endswith(".parquet")
                )
        return out

    before = bucket_files()
    one_change = [(1, "U", 101, 42.0, 99)]
    spark.createDataFrame(one_change, CHANGE_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _run_stream(spark, src, path, str(tmp_path / "ckpt"))
    after = bucket_files()

    changed_bucket = (
        spark.createDataFrame([(1,)], "k long")
        .select(
            F.pmod(F.xxhash64("k"), F.lit(cdc_stream.N_BUCKETS)).cast("int")
        )
        .first()[0]
    )
    for d in before:
        if d != f"bucket={changed_bucket}":
            assert after[d] == before[d], f"untouched {d} was rewritten"
    assert after[f"bucket={changed_bucket}"] != before[
        f"bucket={changed_bucket}"
    ]


def test_cdc_restart_resumes_from_checkpoint(spark, tmp_path):
    """Stop after batch 1, append batch 2, restart with the SAME
    checkpoint: only the new files are processed and the final table
    equals the straight-through run (exactly-once across restarts)."""
    path = str(tmp_path / "base")
    src = str(tmp_path / "changes")
    ckpt = str(tmp_path / "ckpt")
    base = _seed(spark, path)

    spark.createDataFrame(CHANGES_B1, CHANGE_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _run_stream(spark, src, path, ckpt)
    mid = _table(spark, path)
    assert mid[3] == (103, 333.0)  # batch-1 effect visible at the cut

    spark.createDataFrame(CHANGES_B2, CHANGE_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _run_stream(spark, src, path, ckpt)  # SAME checkpoint → resume

    want = _reference_apply(
        [(r.o_orderkey, r.o_custkey, r.totalprice) for r in base.collect()],
        CHANGES_B1 + CHANGES_B2,
    )
    assert _table(spark, path) == want
