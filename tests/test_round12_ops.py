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

    from sparkstreaming_rawdataingestion_spark.operators.text import (
        _bpe_train_from_pieces_batched,
    )

    d = catalog.load_table(spark, sf_dir, "documents")
    # the user-facing entry now rides the HYBRID switch (driver-local
    # below the word bound) — pin it against the K=1 loop...
    got_hybrid = _rows(bpe_train_merges(d, n_merges=24))
    got_k1 = _rows(
        _bpe_train_from_pieces(
            spark, session.stage(_bpe_word_pieces(d)), 24
        )
    )
    assert got_hybrid == got_k1
    assert len(got_hybrid) == 24
    # ...and force the DISTRIBUTED batched loop (the overflow regime)
    # on the same corpus: identical output, batching fired
    log = []
    got_dist = _rows(
        _bpe_train_from_pieces_batched(
            spark,
            session.stage(_bpe_word_pieces(d)),
            24,
            local_max_words=0,
            _round_log=log,
        )
    )
    assert got_dist == got_k1
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
            local_max_words=0,
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
            spark,
            session.stage(_bpe_word_pieces(docs)),
            8,
            local_max_words=0,
        )
    )
    got_k1 = _rows(
        _bpe_train_from_pieces(
            spark, session.stage(_bpe_word_pieces(docs)), 8
        )
    )
    assert got_batched == got_k1


# ---------------------------------------------------------------------------
# multimodal_audio_asym_containment — hand fixture + pure-Python replay
# ---------------------------------------------------------------------------


def _asym_amps():
    """Hand corpus amplitudes: a zigzag with real variation (a monotone
    ramp would print all-ones at EVERY offset and hide misalignment).
    original = 97 frames; excerpt = frames 5..84 at x2 (offset 5 — NOT
    a hop multiple); control = the original reversed."""
    orig = [((j * 37 + 11) % 23) + 1 for j in range(97)]
    excerpt = [2 * a for a in orig[5:85]]
    control = list(reversed(orig))
    return orig, excerpt, control


def _asym_media(spark):
    from sparkstreaming_rawdataingestion_spark.operators import (
        media_codecs,
    )

    def clip(amps):
        samples = []
        for a in amps:
            samples.extend([a] * 8)
        return media_codecs.wav_encode(samples)

    orig, excerpt, control = _asym_amps()
    rows = [
        (0, "audio/wav", clip(orig)),
        (1, "audio/wav", clip(excerpt)),
        (2, "audio/wav", clip(control)),
    ]
    return spark.createDataFrame(
        rows, "media_id long, mime string, payload binary"
    )


def _print64(energies):
    """Pure-Python print: 64 delta-sign bits over a 65-frame window,
    packed into 4 x 16-bit bands — independent replay of the kernel,
    no Spark/DuckDB involved."""
    bits = [
        1 if energies[k + 1] > energies[k] else 0 for k in range(64)
    ]
    return tuple(
        sum(bits[16 * b + i] << i for i in range(16)) for b in range(4)
    )


def test_asym_probe_alignment_hand_fixture(spark):
    """The misaligned excerpt must find its original at offset 5 with
    hamming 0 — BY CONSTRUCTION: probe window 11 covers excerpt frames
    11..75 = original frames 16..80 = archive window 1, and the x2
    rescale preserves every delta sign. The full expected row set is
    derived by a pure-Python replay of prints + band algebra."""
    from sparkstreaming_rawdataingestion_spark.operators.multimodal import (
        audio_probe_alignment,
        audio_windowed_fingerprint_bands,
    )

    orig, excerpt, control = _asym_amps()
    e = {
        0: [8 * a for a in orig],
        1: [8 * a for a in excerpt],
        2: [8 * a for a in control],
    }
    # archive prints (hop 16) for every clip; probe prints (hop 1)
    arch = {
        (m, w): _print64(e[m][16 * w : 16 * w + 65])
        for m in e
        for w in range((len(e[m]) - 65) // 16 + 1)
    }
    prob = {
        (m, p): _print64(e[m][p : p + 65])
        for m in e
        for p in range(len(e[m]) - 65 + 1)
    }
    # the aligned pin, checkable by eye: excerpt probe 11 == orig arch 1
    assert prob[(1, 11)] == arch[(0, 1)]
    # expected vote table from the replayed pair algebra
    from collections import defaultdict

    votes = defaultdict(lambda: defaultdict(list))
    for (mq, p), pp in prob.items():
        for (mr, w), ap in arch.items():
            if mq == mr:
                continue
            if not any(a == b for a, b in zip(pp, ap)):
                continue  # no band match -> not a candidate
            ham = sum(bin(a ^ b).count("1") for a, b in zip(pp, ap))
            if ham <= 3:
                votes[(mq, mr)][16 * w - p].append(ham)
    expected = {}
    for pair, offs in votes.items():
        best = sorted(
            ((-len(h), o) for o, h in offs.items())
        )[0]
        o = best[1]
        expected[pair] = (o, len(offs[o]), min(offs[o]))

    media = _asym_media(spark)
    got = {
        (r.media_q, r.media_r): (
            r.offset_frames,
            r.n_aligned,
            r.min_hamming,
        )
        for r in audio_probe_alignment(
            audio_windowed_fingerprint_bands(media, hop_frames=1),
            audio_windowed_fingerprint_bands(media),
        ).collect()
        if r.media_q != r.media_r
    }
    # engine runs every clip on both sides; the replay above too
    assert got == expected
    assert expected[(1, 0)] == (5, 1, 0)  # the construction offset


def test_hop_aligned_matcher_blind_to_misaligned_excerpt(spark):
    """The round-11 symmetric hop-16 matcher finds NO pair between the
    original and its offset-5 excerpt — the exact gap the asymmetric
    probe closes (deterministic fixture: the zigzag prints at shifted
    offsets diverge far beyond the hamming bar)."""
    from sparkstreaming_rawdataingestion_spark.operators.multimodal import (
        audio_window_match_pairs,
        audio_windowed_fingerprint_bands,
    )

    media = _asym_media(spark)
    pairs = audio_window_match_pairs(
        audio_windowed_fingerprint_bands(media)
    ).collect()
    assert pairs == []


def test_asym_registry_fixture_offsets(spark, sf_dir):
    """Registry-scale pin: every excerpt (odd media_id) reports its own
    original (media_id - 1) at offset_frames = _afpa_off(f) with
    hamming 0 — the closed-form construction, checked per family."""
    from sparkstreaming_rawdataingestion_spark.operators.multimodal import (
        _afpa_off,
        q_multimodal_audio_asym_containment,
    )

    rows = q_multimodal_audio_asym_containment(spark, sf_dir).collect()
    true_rows = {
        r.media_q: r for r in rows if r.media_r == r.media_q - 1
    }
    n_docs = max(r.media_q for r in rows) + 1
    assert len(true_rows) >= n_docs // 2 - 1  # every excerpt present
    for mq, r in true_rows.items():
        f = mq // 2
        assert r.offset_frames == _afpa_off(f)
        assert r.min_hamming == 0


def test_bpe_deep_k1_round_count_survives(spark):
    """Depth-wall regression (round 12): a tie-heavy corpus (every pair
    count equal) forces pure K=1 rounds; without the periodic EAGER
    checkpoint the accumulated task-closure graph dies with a
    StackOverflowError at ~122 rounds. 160 rounds must complete."""
    from sparkstreaming_rawdataingestion_spark import session
    from sparkstreaming_rawdataingestion_spark.operators.text import (
        _bpe_train_from_pieces_batched,
        _bpe_word_pieces,
    )

    docs = spark.createDataFrame(
        [
            (i, " ".join([chr(0x4E00 + 2 * i) + chr(0x4E01 + 2 * i)] * 5))
            for i in range(200)
        ],
        "doc_id long, text string",
    )
    log = []
    out = _bpe_train_from_pieces_batched(
        spark,
        session.stage(_bpe_word_pieces(docs)),
        160,
        local_max_words=0,  # the depth wall is a DISTRIBUTED-loop trap
        _round_log=log,
    )
    assert out.count() == 160
    # full all-tie pages force K=1 (137 rounds) until only 63 pairs
    # remain — an under-full page with no interactions legally batches
    # the tail (exhausted-table rule), capped at the 23 merges left
    assert len(log) == 138
    assert sum(k for k, _ in log) == 160
    assert len(log) > 122  # past the measured no-eager crash point


# ---------------------------------------------------------------------------
# sketch_hll_portable — pure-Python replay + mergeability + accuracy
# ---------------------------------------------------------------------------


def test_portable_hll_matches_pure_python_replay(spark, sf_dir):
    """Independent arbitrary-precision replay of the WHOLE mechanism —
    lowbias hash, bucket/rank split, register max, exact integer
    harmonic sum, one final double division, linear-counting branch —
    in plain Python over the collected keys; the engine must agree to
    the rounded digit."""
    import math

    from sparkstreaming_rawdataingestion_spark import catalog
    from sparkstreaming_rawdataingestion_spark.operators.stats import (
        HLLP_ALPHA,
        HLLP_M,
        HLLP_WBITS,
        _HLLP_FOLD,
        _HLLP_MUL,
        _HLLP_NUM,
        _HLLP_ROUNDS,
        q_sketch_hll_portable,
    )

    def mix(x):
        h = x % (1 << 32)
        for _ in range(_HLLP_ROUNDS):
            h = (h ^ (h >> _HLLP_FOLD)) * _HLLP_MUL % (1 << 32)
        return h ^ (h >> _HLLP_FOLD)

    rows = (
        catalog.load_table(spark, sf_dir, "orders")
        .select("o_orderstatus", "o_custkey")
        .collect()
    )
    regs: dict = {}
    exact: dict = {}
    for r in rows:
        h = mix(r.o_custkey)
        bucket, w = h >> HLLP_WBITS, h % (1 << HLLP_WBITS)
        rank = HLLP_WBITS + 1 - (w.bit_length() if w else 0)
        key = (r.o_orderstatus, bucket)
        regs[key] = max(regs.get(key, 0), rank)
        exact.setdefault(r.o_orderstatus, set()).add(r.o_custkey)
    expected = {}
    for status, keys in exact.items():
        ms = [regs.get((status, b), 0) for b in range(HLLP_M)]
        denom = sum(1 << (HLLP_WBITS + 1 - m) for m in ms)
        zeros = sum(1 for m in ms if m == 0)
        raw = HLLP_ALPHA * (_HLLP_NUM / denom)
        if raw <= 2.5 * HLLP_M and zeros > 0:
            raw = float(HLLP_M) * math.log(float(HLLP_M) / zeros)
        expected[status] = (round(raw, 4), len(keys))

    got = {
        r.o_orderstatus: (
            r.approx_customers,
            r.exact_customers,
            r.n_regs_union_eq_direct,
        )
        for r in q_sketch_hll_portable(spark, sf_dir).collect()
    }
    assert {k: (v[0], v[1]) for k, v in got.items()} == expected
    # union = max mergeability: every register agrees between the
    # per-day max-merge path and the direct path
    assert all(v[2] == HLLP_M for v in got.values())


def test_portable_hll_estimate_accuracy(spark, sf_dir):
    """m=64 gives ~13% typical error; the deterministic fixture lands
    well inside 20% on every status group."""
    from sparkstreaming_rawdataingestion_spark.operators.stats import (
        q_sketch_hll_portable,
    )

    for r in q_sketch_hll_portable(spark, sf_dir).collect():
        err = abs(r.approx_customers - r.exact_customers) / r.exact_customers
        assert err < 0.2, (r.o_orderstatus, r.approx_customers,
                           r.exact_customers)


def test_portable_hll_linear_counting_branch_cross_engine(spark, tmp_path):
    """The small-range linear-counting branch (raw <= 2.5m, zero
    registers present) never fires on the registry fixtures — exercise
    it directly on a tiny corpus against a live DuckDB replay of the
    oracle, so the one transcendental (ln) is certified cross-engine
    too (r12 review)."""
    import duckdb

    from sparkstreaming_rawdataingestion_spark.operators.stats import (
        _HLLP_ORACLE,
        q_sketch_hll_portable,
    )

    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, i % 5 + 1, "T", "2024-01-0%d" % (i % 3 + 1)) for i in range(40)],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_orderdate string",
    ).selectExpr(
        "o_orderkey", "o_custkey", "o_orderstatus",
        "CAST(o_orderdate AS TIMESTAMP) AS o_orderdate",
    ).coalesce(1).write.parquet(f"{sf}/orders.parquet")

    got = {
        r.o_orderstatus: (
            r.approx_customers,
            r.n_regs_union_eq_direct,
            r.exact_customers,
        )
        for r in q_sketch_hll_portable(spark, sf).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{sf}/orders.parquet/*.parquet')"
    )
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(_HLLP_ORACLE).fetchall()
    }
    assert got == want
    # 5 distinct keys, 64 registers: the branch MUST have fired
    # (raw <= 160 and zeros > 0), and linear counting at V=59 zeros is
    # near-exact
    approx = got["T"][0]
    assert abs(approx - 5) < 1.0


# ---------------------------------------------------------------------------
# sketch_countmin_portable — pure-Python replay + guarantees
# ---------------------------------------------------------------------------


def test_portable_countmin_matches_pure_python_replay(spark, sf_dir):
    """Independent replay of the whole mechanism — salted lowbias
    hashes, d x w counters, per-day partial merge, min-over-rows point
    estimates, exact top-K selection — in plain Python over the
    collected keys; the engine must agree exactly (everything is an
    integer, so there is not even a rounding convention to share)."""
    from collections import Counter

    from sparkstreaming_rawdataingestion_spark import catalog
    from sparkstreaming_rawdataingestion_spark.operators.stats import (
        CMP_D,
        CMP_TOPK,
        CMP_W,
        _CMP_SALT,
        _HLLP_FOLD,
        _HLLP_MUL,
        _HLLP_ROUNDS,
        q_sketch_countmin_portable,
    )

    def mix(x):
        h = x % (1 << 32)
        for _ in range(_HLLP_ROUNDS):
            h = (h ^ (h >> _HLLP_FOLD)) * _HLLP_MUL % (1 << 32)
        return h ^ (h >> _HLLP_FOLD)

    keys = [
        r.l_partkey
        for r in catalog.load_table(spark, sf_dir, "lineitem")
        .select("l_partkey")
        .collect()
    ]
    counters: Counter = Counter()
    for k in keys:
        for r in range(CMP_D):
            counters[(r, mix(k + r * _CMP_SALT) % CMP_W)] += 1
    exact = Counter(keys)
    topk = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:CMP_TOPK]
    expected = {
        k: (
            c,
            min(
                counters[(r, mix(k + r * _CMP_SALT) % CMP_W)]
                for r in range(CMP_D)
            ),
        )
        for k, c in topk
    }
    got = {
        r.l_partkey: (
            r.exact_count,
            r.cm_estimate,
            r.overestimate,
            r.n_counters,
            r.n_counters_merge_eq_direct,
        )
        for r in q_sketch_countmin_portable(spark, sf_dir).collect()
    }
    assert {k: (v[0], v[1]) for k, v in got.items()} == expected
    for k, (c, cm, over, n, eq) in got.items():
        assert cm >= c and over == cm - c  # the count-min guarantee
        assert n == eq == len(counters)  # counter additivity (merge)


def test_portable_countmin_cross_engine_tiny_corpus(spark, tmp_path):
    """Run the DuckDB oracle text itself (_CMP_ORACLE) against the
    engine on a tiny skewed corpus, so engine/oracle parity is pinned
    in-repo and the oracle SQL cannot drift between driver rows (r12
    advice: the replay test above certifies the Spark side only)."""
    import duckdb

    from sparkstreaming_rawdataingestion_spark.operators.stats import (
        _CMP_ORACLE,
        q_sketch_countmin_portable,
    )

    sf = str(tmp_path)
    # 7 distinct keys with distinct counts (no top-K ties), 3 days;
    # the >2^31 key pins the r13 salted-position precedence fix
    rows = [
        (k, "2024-02-0%d" % (i % 3 + 1))
        for k in list(range(1, 7)) + [3_000_000_000]
        for i in range((k % 100) * 3 + (24 if k > 7 else 0))
    ]
    spark.createDataFrame(
        rows, "l_partkey long, l_shipdate string"
    ).selectExpr(
        "l_partkey", "CAST(l_shipdate AS TIMESTAMP) AS l_shipdate"
    ).coalesce(1).write.parquet(f"{sf}/lineitem.parquet")

    got = {
        r.l_partkey: (
            r.exact_count,
            r.cm_estimate,
            r.overestimate,
            r.n_counters,
            r.n_counters_merge_eq_direct,
        )
        for r in q_sketch_countmin_portable(spark, sf).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{sf}/lineitem.parquet/*.parquet')"
    )
    want = {
        r[0]: (r[1], r[2], r[3], r[4], r[5])
        for r in con.execute(_CMP_ORACLE).fetchall()
    }
    assert got == want
    assert len(got) == 7 and all(v[1] >= v[0] for v in got.values())


def test_bpe_hybrid_local_switch_and_equality(spark):
    """The hybrid switch: below the word bound the trainer runs
    driver-local and must emit the bit-identical table to the
    distributed batched loop (forced with local_max_words=0) — pinned
    on the hand-derived Sennrich merges; one round-log entry covering
    every merge marks the local path."""
    from sparkstreaming_rawdataingestion_spark import session
    from sparkstreaming_rawdataingestion_spark.operators.text import (
        _bpe_train_from_pieces_batched,
        _bpe_word_pieces,
    )

    d = _sennrich_docs(spark)
    log_local = []
    got_local = _rows(
        _bpe_train_from_pieces_batched(
            spark,
            session.stage(_bpe_word_pieces(d)),
            12,
            _round_log=log_local,
        )
    )
    got_dist = _rows(
        _bpe_train_from_pieces_batched(
            spark,
            session.stage(_bpe_word_pieces(d)),
            12,
            local_max_words=0,
        )
    )
    assert got_local == got_dist == SENNRICH_MERGES
    assert log_local == [(12, log_local[0][1])]  # one local round


def test_bpe_local_trainer_pure_function_corners():
    """Driver-side unit corners for the local twin (no engine):
    overlap runs, tie-breaks, exhaustion."""
    from sparkstreaming_rawdataingestion_spark.operators.text import (
        _bpe_apply_merge_local,
        _bpe_train_local,
    )

    assert _bpe_apply_merge_local(list("aaaa"), "a", "a") == ["aa", "aa"]
    assert _bpe_apply_merge_local(list("aaa"), "a", "a") == ["aa", "a"]
    # tie at count 2: ('a','b') beats ('b','a') lexicographically
    merges = _bpe_train_local(
        [(1, list("abab")), (1, list("ba"))], 1
    )
    assert merges == [(1, "a", "b", "ab", 2)]
    # exhaustion: single-piece words stop the loop early
    assert _bpe_train_local([(3, ["x"])], 5) == []
