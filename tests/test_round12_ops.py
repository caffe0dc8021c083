"""Round-12 operator tests.

The batched non-interacting BPE merge loop must be OUTPUT-IDENTICAL to
the sequential K=1 pair-delta loop (the round-11 trainer, kept as the
equality anchor) — pinned on the hand-computed Sennrich fixture, on
adversarial corner corpora built to hit every branch of the batch
scheduler (interaction break, collision break, tie trim, table-
exhausted full batch), and on the registry corpus. The scheduler
itself is additionally unit-tested driver-side with hand-derived
expectations (no engine involved).
"""

import pytest

from tests.test_round10_ops import SENNRICH_MERGES, _sennrich_docs


def _rows(df):
    return sorted(
        (r.step, r.lhs, r.rhs, r.merged, r.pair_count)
        for r in df.collect()
    )


# ---------------------------------------------------------------------------
# _bpe_batch_schedule — pure-Python unit expectations (no engine)
# ---------------------------------------------------------------------------


def test_batch_schedule_interaction_break_and_strict_trim():
    """Rows hand-built (in legal argmax sort order: c DESC, lhs, rhs)
    so the walk breaks on a shared token: ('x','b') shares 'b' with
    rule 1, breaking at c_q=5; the chosen ('e','f') at count 5 ties
    c_q and must be trimmed (a created pair could tie 5 and win a
    lexicographic tie-break)."""
    from sparkstreaming_rawdataingestion_spark.operators.text import (
        _bpe_batch_schedule,
    )

    rows = [
        ("a", "b", 9),
        ("c", "d", 7),
        ("e", "f", 5),
        ("x", "b", 5),  # shares 'b' with rule 1 -> break, c_q = 5
        ("g", "h", 4),
    ]
    got = _bpe_batch_schedule(rows, {"a", "b", "c", "d", "e", "f", "g",
                                     "h", "x"}, 10, 64)
    assert got == [("a", "b", 9), ("c", "d", 7)]


def test_batch_schedule_merged_string_interaction():
    """A candidate whose lhs equals an earlier rule's MERGED string
    must break the prefix (its count can change this round)."""
    from sparkstreaming_rawdataingestion_spark.operators.text import (
        _bpe_batch_schedule,
    )

    rows = [("a", "b", 9), ("ab", "c", 7), ("d", "e", 6)]
    got = _bpe_batch_schedule(rows, {"a", "b", "c", "d", "e"}, 10, 64)
    assert got == [("a", "b", 9)]


def test_batch_schedule_collision_singleton():
    """Top row whose merged string already exists as a token: exact
    only as a K=1 singleton (the delta maintenance is string-keyed)."""
    from sparkstreaming_rawdataingestion_spark.operators.text import (
        _bpe_batch_schedule,
    )

    rows = [("a", "b", 9), ("c", "d", 7)]
    got = _bpe_batch_schedule(rows, {"a", "b", "ab", "c", "d"}, 10, 64)
    assert got == [("a", "b", 9)]


def test_batch_schedule_collision_cut_mid_prefix():
    """Collision met AFTER a clean prefix: cut before it, trim at its
    count."""
    from sparkstreaming_rawdataingestion_spark.operators.text import (
        _bpe_batch_schedule,
    )

    rows = [("a", "b", 9), ("c", "d", 7), ("e", "f", 7)]
    # 'cd' already a token -> break at count 7; ('a','b') survives trim
    got = _bpe_batch_schedule(rows, {"a", "b", "c", "d", "e", "f", "cd"},
                              10, 64)
    assert got == [("a", "b", 9)]


def test_batch_schedule_exhausted_table_batches_everything():
    """Fewer rows than top_m and no interaction anywhere: the whole
    table is one exact batch (no hidden rows can have been skipped, so
    no created pair can exist — any (x, lhs_j) pair would itself have
    interacted)."""
    from sparkstreaming_rawdataingestion_spark.operators.text import (
        _bpe_batch_schedule,
    )

    rows = [("a", "b", 3), ("c", "d", 3), ("e", "f", 1)]
    got = _bpe_batch_schedule(rows, set("abcdef"), 10, 64)
    assert got == rows


def test_batch_schedule_full_page_trims_at_last_row():
    """Exactly top_m rows collected: unseen rows below may tie the last
    row's count, so the trim bound is the last row's count even with
    no interaction in the page."""
    from sparkstreaming_rawdataingestion_spark.operators.text import (
        _bpe_batch_schedule,
    )

    rows = [("a", "b", 5), ("c", "d", 3), ("e", "f", 3)]
    got = _bpe_batch_schedule(rows, set("abcdef"), 10, top_m=3)
    assert got == [("a", "b", 5)]


def test_batch_schedule_remaining_cap_and_k1_fallback():
    from sparkstreaming_rawdataingestion_spark.operators.text import (
        _bpe_batch_schedule,
    )

    rows = [("a", "b", 5), ("c", "d", 4), ("e", "f", 3)]
    assert _bpe_batch_schedule(rows, set("abcdef"), 2, 64) == rows[:2]
    # all-tie page: trim empties -> K=1 fallback on the argmax row
    ties = [("a", "b", 5), ("b", "x", 5), ("c", "d", 5)]
    assert _bpe_batch_schedule(ties, set("abcdx"), 10, 64) == [ties[0]]


def test_batch_schedule_self_pair_is_singleton_or_cut():
    """l == r rules batch-unsafely (a run [t,t,t] folds to [tt,t],
    creating (tt,t) at up to the rule's OWN count — the created-pair
    bound cannot trace to a skipped pair): exact as a singleton,
    otherwise the prefix cuts before them with the strict trim."""
    from sparkstreaming_rawdataingestion_spark.operators.text import (
        _bpe_batch_schedule,
    )

    rows = [("a", "a", 9), ("c", "d", 7)]
    assert _bpe_batch_schedule(rows, set("acd"), 10, 64) == [rows[0]]
    rows2 = [("c", "d", 9), ("a", "a", 7), ("e", "f", 6)]
    assert _bpe_batch_schedule(rows2, set("acdef"), 10, 64) == [rows2[0]]


# ---------------------------------------------------------------------------
# batched trainer == sequential K=1 trainer (engine equality pins)
# ---------------------------------------------------------------------------


def test_bpe_batched_equals_k1_on_sennrich(spark):
    """The batched loop must emit the IDENTICAL merge table — same
    pairs, same tie-breaks, same counts — on the fixture whose 12
    merges are hand-derived."""
    from sparkstreaming_rawdataingestion_spark import session
    from sparkstreaming_rawdataingestion_spark.operators.text import (
        _bpe_train_from_pieces,
        _bpe_word_pieces,
        bpe_train_merges,
    )

    d = _sennrich_docs(spark)
    got_batched = _rows(bpe_train_merges(d))
    got_k1 = _rows(
        _bpe_train_from_pieces(
            spark, session.stage(_bpe_word_pieces(d)), 12
        )
    )
    assert got_batched == SENNRICH_MERGES
    assert got_k1 == SENNRICH_MERGES


def test_bpe_batched_equals_k1_on_registry_corpus(spark, sf_dir):
    """Same identity on real corpus text — the scale-shaped input
    where a batching bug (missed interaction, stale trim bound, wrong
    fold composition) would actually surface; asserts batching FIRED
    (fewer rounds than merges) so the test cannot silently degrade to
    comparing the K=1 loop with itself."""
    from sparkstreaming_rawdataingestion_spark import catalog, session
    from sparkstreaming_rawdataingestion_spark.operators.text import (
        _bpe_train_from_pieces,
        _bpe_word_pieces,
        bpe_train_merges,
    )

    d = catalog.load_table(spark, sf_dir, "documents")
    log = []
    got_batched = _rows(bpe_train_merges(d, n_merges=24, _round_log=log))
    got_k1 = _rows(
        _bpe_train_from_pieces(
            spark, session.stage(_bpe_word_pieces(d)), 24
        )
    )
    assert got_batched == got_k1
    assert len(got_batched) == 24
    assert sum(k for k, _ in log) == 24
    assert len(log) < 24, "no round batched more than one merge"


def test_bpe_batched_overlapping_pair_runs(spark):
    """'aaaa'/'aaa' corpus through the BATCHED production entry: the
    left-to-right non-overlap rule must survive the batch fold."""
    from sparkstreaming_rawdataingestion_spark.operators.text import (
        bpe_train_merges,
    )

    docs = spark.createDataFrame(
        [(0, "aaaa"), (1, "aaaa"), (2, "aaaa"), (3, "aaa"), (4, "aaa")],
        "doc_id long, text string",
    )
    got = _rows(bpe_train_merges(docs, n_merges=2))
    assert got == [(1, "a", "a", "aa", 13), (2, "aa", "aa", "aaaa", 3)]


def test_bpe_batched_multi_rule_fold_fires(spark):
    """A corpus hand-built so ONE round batches two non-interacting
    rules — exercising the map-lookup fold and the multi-rule
    predicate — and the result equals the K=1 schedule. Counts: (a,b)
    appears 6x, (c,d) 4x, (e,f) 2x; disjoint tokens, distinct counts,
    table exhausted under top_m -> one batch of three."""
    from sparkstreaming_rawdataingestion_spark import session
    from sparkstreaming_rawdataingestion_spark.operators.text import (
        _bpe_train_from_pieces,
        _bpe_train_from_pieces_batched,
        _bpe_word_pieces,
    )

    docs = spark.createDataFrame(
        [
            (0, "ab ab ab cd cd ef"),
            (1, "ab ab ab cd cd ef"),
        ],
        "doc_id long, text string",
    )
    log = []
    got_batched = _rows(
        _bpe_train_from_pieces_batched(
            spark,
            session.stage(_bpe_word_pieces(docs)),
            3,
            _round_log=log,
        )
    )
    got_k1 = _rows(
        _bpe_train_from_pieces(
            spark, session.stage(_bpe_word_pieces(docs)), 3
        )
    )
    assert got_batched == got_k1
    assert got_batched == [
        (1, "a", "b", "ab", 6),
        (2, "c", "d", "cd", 4),
        (3, "e", "f", "ef", 2),
    ]
    assert log and log[0][0] == 3, "the three rules must land in ONE round"


def test_bpe_batched_collision_corpus(spark):
    """Merged-string collision across rounds: after (a,b) -> 'ab', the
    later pair ('a','bc') vs ('ab','c') family forces the collision /
    merged-token interaction branches; batched must equal K=1."""
    from sparkstreaming_rawdataingestion_spark import session
    from sparkstreaming_rawdataingestion_spark.operators.text import (
        _bpe_train_from_pieces,
        _bpe_train_from_pieces_batched,
        _bpe_word_pieces,
    )

    docs = spark.createDataFrame(
        [
            (0, "abc abc abc abc"),
            (1, "ab ab ab"),
            (2, "bc bc"),
            (3, "abcabc abcabc"),
        ],
        "doc_id long, text string",
    )
    got_batched = _rows(
        _bpe_train_from_pieces_batched(
            spark, session.stage(_bpe_word_pieces(docs)), 8
        )
    )
    got_k1 = _rows(
        _bpe_train_from_pieces(
            spark, session.stage(_bpe_word_pieces(docs)), 8
        )
    )
    assert got_batched == got_k1
