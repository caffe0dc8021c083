"""Round-11 operator tests.

The BPE trainer's incremental pair-delta rewrite must be OUTPUT-
identical to the round-10 full-recount loop (kept as the reference
path) — pinned here on the hand-computed Sennrich fixture and on the
sf0.001 registry corpus; the JVM greedy-encoder alternative must match
the Arrow fold on every count column.
"""

import pytest

from tests.test_round10_ops import SENNRICH_MERGES, _sennrich_docs


def _rows(df):
    return sorted(
        (r.step, r.lhs, r.rhs, r.merged, r.pair_count)
        for r in df.collect()
    )


def test_bpe_delta_equals_recount_on_sennrich(spark):
    """The delta loop and the recount loop must emit the IDENTICAL
    merge table — same pairs, same tie-breaks, same counts — on the
    fixture whose 12 merges are hand-derived."""
    from sparkstreaming_rawdataingestion_spark import session
    from sparkstreaming_rawdataingestion_spark.operators.text import (
        _bpe_train_from_pieces_recount,
        _bpe_word_pieces,
        bpe_train_merges,
    )

    d = _sennrich_docs(spark)
    got_delta = _rows(bpe_train_merges(d))
    got_recount = _rows(
        _bpe_train_from_pieces_recount(
            spark, session.stage(_bpe_word_pieces(d)), 12
        )
    )
    assert got_delta == SENNRICH_MERGES
    assert got_recount == SENNRICH_MERGES


def test_bpe_delta_equals_recount_on_registry_corpus(spark, sf_dir):
    """Same identity on real corpus text (sf0.001 documents) — the
    scale-shaped input where a delta-maintenance bug (stale count,
    missed affected word, wrong sign) would actually surface."""
    from sparkstreaming_rawdataingestion_spark import catalog, session
    from sparkstreaming_rawdataingestion_spark.operators.text import (
        _bpe_train_from_pieces_recount,
        _bpe_word_pieces,
        bpe_train_merges,
    )

    d = catalog.load_table(spark, sf_dir, "documents")
    got_delta = _rows(bpe_train_merges(d))
    got_recount = _rows(
        _bpe_train_from_pieces_recount(
            spark, session.stage(_bpe_word_pieces(d)), 12
        )
    )
    assert got_delta == got_recount
    assert len(got_delta) == 12


def test_bpe_delta_overlapping_pair_runs(spark):
    """'aaaa'/'aaa' corpus: the delta path must preserve the left-to-
    right non-overlap rule when the merged pair overlaps itself —
    the case where a naive delta (counting (a,a) occurrences instead
    of replaying the fold on affected words) diverges."""
    from sparkstreaming_rawdataingestion_spark.operators.text import (
        bpe_train_merges,
    )

    docs = spark.createDataFrame(
        [(0, "aaaa"), (1, "aaaa"), (2, "aaaa"), (3, "aaa"), (4, "aaa")],
        "doc_id long, text string",
    )
    got = _rows(bpe_train_merges(docs, n_merges=2))
    assert got == [(1, "a", "a", "aa", 13), (2, "aa", "aa", "aaaa", 3)]


def test_jvm_greedy_encoder_matches_arrow_fold(spark, sf_dir):
    """tokenizer_greedy_subword_jvm (pure Catalyst nested-aggregate
    fold) must produce the identical (doc_id, n_words, n_tokens,
    n_unk) table as the Arrow mapInPandas fold on the registry corpus
    under the frozen vocab."""
    from sparkstreaming_rawdataingestion_spark import catalog
    from sparkstreaming_rawdataingestion_spark.operators.text import (
        tokenizer_greedy_subword,
        tokenizer_greedy_subword_jvm,
    )

    d = catalog.load_table(spark, sf_dir, "documents")
    arrow = {
        r.doc_id: (r.n_words, r.n_tokens, r.n_unk)
        for r in tokenizer_greedy_subword(d).collect()
    }
    jvm = {
        r.doc_id: (r.n_words, r.n_tokens, r.n_unk)
        for r in tokenizer_greedy_subword_jvm(d).collect()
    }
    assert jvm == arrow and len(arrow) > 0


def test_jvm_greedy_encoder_unk_and_empty_words(spark):
    """UNK chars advance one char each; empty/None text is one empty
    word with zero tokens — the Arrow fold's edge semantics, replayed
    by the JVM fold."""
    from sparkstreaming_rawdataingestion_spark.operators.text import (
        tokenizer_greedy_subword,
        tokenizer_greedy_subword_jvm,
    )

    docs = spark.createDataFrame(
        [(0, "the qqq"), (1, ""), (2, None), (3, "a  b")],
        "doc_id long, text string",
    )
    pieces = ("the", "a", "b", "q")
    arrow = {
        r.doc_id: (r.n_words, r.n_tokens, r.n_unk)
        for r in tokenizer_greedy_subword(docs, pieces=pieces).collect()
    }
    jvm = {
        r.doc_id: (r.n_words, r.n_tokens, r.n_unk)
        for r in tokenizer_greedy_subword_jvm(docs, pieces=pieces).collect()
    }
    assert jvm == arrow


# ---------------------------------------------------------------------------
# multimodal_audio_window_matches — hand-computed closed-form fixtures
# ---------------------------------------------------------------------------
# Ramp clips make every delta bit derivable by eye: frames of 8 equal
# positive samples, so frame energy = 8*amp, and a strictly increasing
# amp sequence gives the all-ones print (every band 65535). The hand
# corpus below pins containment, hop alignment, scale invariance and
# the near-dup hamming path without either engine in the loop.
#
#   id 0: 81-frame ramp amp_j = 2(j+1)      -> 2 windows, both all-ones
#   id 1: 65-frame ramp (head excerpt)      -> 1 window, all-ones
#   id 2: id 1 scaled x3                    -> identical print (invariance)
#   id 3: id 1 with a dip at frame 10       -> exactly bit 9 flips
#   id 4: 65-frame DECREASING ramp          -> all-zero print, matches nobody
#
# Expected clip pairs (media_a < media_b, max hamming 3):
#   (0,1) n=2 min=0   (0,2) n=2 min=0   (0,3) n=2 min=1
#   (1,2) n=1 min=0   (1,3) n=1 min=1   (2,3) n=1 min=1
HAND_AFPW_EXPECTED = {
    (0, 1): (2, 0),
    (0, 2): (2, 0),
    (0, 3): (2, 1),
    (1, 2): (1, 0),
    (1, 3): (1, 1),
    (2, 3): (1, 1),
}


def _hand_afpw_media(spark):
    from sparkstreaming_rawdataingestion_spark.operators import media_codecs

    def clip(amps):
        samples = []
        for a in amps:
            samples.extend([a] * 8)
        return media_codecs.wav_encode(samples)

    ramp81 = [2 * (j + 1) for j in range(81)]
    ramp65 = ramp81[:65]
    dipped = list(ramp65)
    dipped[10] = 2 * 10 - 1  # < amp_9 = 20, still < amp_11 = 24
    rows = [
        (0, "audio/wav", clip(ramp81)),
        (1, "audio/wav", clip(ramp65)),
        (2, "audio/wav", clip([3 * a for a in ramp65])),
        (3, "audio/wav", clip(dipped)),
        (4, "audio/wav", clip(list(reversed(ramp65)))),
    ]
    return spark.createDataFrame(
        rows, "media_id long, mime string, payload binary"
    )


def test_audio_window_matches_hand_fixture(spark):
    from sparkstreaming_rawdataingestion_spark.operators.multimodal import (
        audio_window_match_pairs,
        audio_windowed_fingerprint_bands,
    )

    wbands = audio_windowed_fingerprint_bands(_hand_afpw_media(spark))
    got = {
        (r.media_a, r.media_b): (r.n_window_matches, r.min_hamming)
        for r in audio_window_match_pairs(wbands).collect()
    }
    assert got == HAND_AFPW_EXPECTED


def test_audio_windowed_prints_hand_values(spark):
    """The prints themselves: both of clip 0's windows and clip 1/2's
    single window are all-ones (every band 65535); clip 4's is all
    zeros; clip 3 flips exactly bit 9 in band 0 (65535 - 512)."""
    from sparkstreaming_rawdataingestion_spark.operators.multimodal import (
        audio_windowed_fingerprint_bands,
    )

    rows = audio_windowed_fingerprint_bands(_hand_afpw_media(spark)).collect()
    by_key = {
        (r.media_id, r.win): (r.band0, r.band1, r.band2, r.band3)
        for r in rows
    }
    ones = (65535, 65535, 65535, 65535)
    assert by_key[(0, 0)] == ones and by_key[(0, 1)] == ones
    assert by_key[(1, 0)] == ones and by_key[(2, 0)] == ones
    assert by_key[(3, 0)] == (65535 - 512, 65535, 65535, 65535)
    assert by_key[(4, 0)] == (0, 0, 0, 0)
    assert len(by_key) == 6  # 2 + 1 + 1 + 1 + 1 windows


def test_audio_windowed_rejects_bad_shapes(spark):
    """Clips shorter than one window or off the frame grid raise —
    resampling is codec territory, stated precondition."""
    import pytest as _pytest

    from sparkstreaming_rawdataingestion_spark.operators import media_codecs
    from sparkstreaming_rawdataingestion_spark.operators.multimodal import (
        audio_windowed_fingerprint_bands,
    )

    short = media_codecs.wav_encode([5] * (64 * 8))  # one frame short
    media = spark.createDataFrame(
        [(0, "audio/wav", short)],
        "media_id long, mime string, payload binary",
    )
    with _pytest.raises(Exception, match="windowed audio fingerprint"):
        audio_windowed_fingerprint_bands(media).collect()


# ---------------------------------------------------------------------------
# similarity_pq_portable_topk — independent pure-Python replay
# ---------------------------------------------------------------------------


def test_portable_pq_matches_pure_python_replay(spark, sf_dir):
    """Closed-form fixture for the PQ twin: the ENTIRE pipeline —
    quantization, integer codebooks (via _pqp_centroid, the Python
    twin of the oracle formula), nearest-code assignment with
    tie-breaks, ADC lookup sums, ranking — is replayed in plain Python
    over the sf0.001 embeddings with arbitrary-precision ints, no
    Spark and no DuckDB in the expected path. A formula bug shared by
    engine and oracle (the round-6 Wilson lesson) cannot hide from
    this third implementation."""
    import math

    import pyarrow.parquet as pq

    from sparkstreaming_rawdataingestion_spark.operators.similarity import (
        EMB_DIM,
        N_QUERIES,
        PQ_K,
        PQ_M,
        PQ_SUBDIM,
        PQP_SCALE,
        TOP_K,
        _pqp_centroid,
        q_similarity_pq_portable_topk,
    )

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pydict()
    vecs = {
        vid: [math.floor(float(x) * PQP_SCALE + 0.5) for x in emb]
        for vid, emb in zip(tbl["vec_id"], tbl["embedding"])
    }
    assert all(len(v) == EMB_DIM for v in vecs.values())

    def assign(v):
        out = []
        for m in range(PQ_M):
            best = None
            for code in range(PQ_K):
                d = sum(
                    (v[m * PQ_SUBDIM + i - 1] - _pqp_centroid(m, code, i))
                    ** 2
                    for i in range(1, PQ_SUBDIM + 1)
                )
                if best is None or (d, code) < best:
                    best = (d, code)
            out.append(best[1])
        return out

    codes = {vid: assign(v) for vid, v in vecs.items()}
    expected = {}
    for q in range(N_QUERIES):
        qv = vecs[q]
        qn2 = sum(x * x for x in qv)
        scored = []
        for vid, vcodes in codes.items():
            if vid == q:
                continue
            sdot = r2 = 0
            for m, code in enumerate(vcodes):
                cs = [
                    _pqp_centroid(m, code, i)
                    for i in range(1, PQ_SUBDIM + 1)
                ]
                sdot += sum(
                    qv[m * PQ_SUBDIM + i] * cs[i]
                    for i in range(PQ_SUBDIM)
                )
                r2 += sum(c * c for c in cs)
            denom = math.sqrt(float(qn2)) * math.sqrt(float(r2))
            adc = float(sdot) / denom if denom != 0 else None
            scored.append((adc, vid))
        scored.sort(key=lambda t: (-(t[0] if t[0] is not None else -2), t[1]))
        for rk, (adc, vid) in enumerate(scored[:TOP_K], 1):
            expected[(q, vid)] = (rk, adc)

    got = {
        (r.query_id, r.neighbor_id): (r.rk, r.adc_cos)
        for r in q_similarity_pq_portable_topk(spark, sf_dir).collect()
    }
    assert set(got) == set(expected)
    for key, (rk, adc) in expected.items():
        grk, gadc = got[key]
        assert grk == rk, (key, grk, rk)
        assert abs(gadc - adc) < 1e-6, (key, gadc, adc)


def test_audio_window_alignment_hand_fixture(spark):
    """Alignment offsets on the ramp corpus, derived by eye: clip 1
    (head excerpt) sits at offset 0 inside clip 0; clips 0's two
    all-ones windows both match clip 1's single window, so offsets 0
    and 1 tie at n=1 and the smaller wins. Same for clips 2 and 3
    (offset 0, near-dup hamming 1 for clip 3). Clip pairs among
    1/2/3 (all single-window) align at offset 0."""
    from sparkstreaming_rawdataingestion_spark.operators.multimodal import (
        audio_window_alignment,
        audio_windowed_fingerprint_bands,
    )

    wbands = audio_windowed_fingerprint_bands(_hand_afpw_media(spark))
    got = {
        (r.media_a, r.media_b): (r.offset_windows, r.n_aligned, r.min_hamming)
        for r in audio_window_alignment(wbands).collect()
    }
    assert got == {
        (0, 1): (0, 1, 0),
        (0, 2): (0, 1, 0),
        (0, 3): (0, 1, 1),
        (1, 2): (0, 1, 0),
        (1, 3): (0, 1, 1),
        (2, 3): (0, 1, 1),
    }


def test_audio_window_clusters_unite_original_excerpts_and_near_dups(spark):
    """The ramp corpus by eye: clips 0-3 are one family through the
    containment-aware pair graph (original, two excerpts, near-dup) —
    canonical 0; clip 4 matches nobody and is its own canonical. The
    fixed-length fingerprint graph could not even CONNECT 0 with 1-3
    (different clip lengths never hash equal), which is the point of
    re-basing canonical selection on window matches."""
    from sparkstreaming_rawdataingestion_spark.operators.dedup import (
        connected_components,
    )
    from sparkstreaming_rawdataingestion_spark.operators.multimodal import (
        audio_window_match_pairs,
        audio_windowed_fingerprint_bands,
    )
    from pyspark.sql import functions as F

    wbands = audio_windowed_fingerprint_bands(_hand_afpw_media(spark))
    pairs = audio_window_match_pairs(wbands).select(
        F.col("media_a").alias("doc_a"), F.col("media_b").alias("doc_b")
    )
    got = {
        r.node: r.label for r in connected_components(pairs).collect()
    }
    # clip 4 pairs with nobody → no row (the round-10 ladder semantic:
    # clusters label CLUSTERED clips; unpaired clips need no keeper
    # decision)
    assert got == {0: 0, 1: 0, 2: 0, 3: 0}
