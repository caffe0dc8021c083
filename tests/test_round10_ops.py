"""Round-10 operator fixtures — closed-form, hand-computed answers.

Oracle parity cannot catch a formula bug shared by engine and oracle
(the round-6 Wilson lesson), so every new operator here gets a fixture
whose expected output is derived by hand before either engine runs.
"""

import pytest


# ---------------------------------------------------------------------------
# tokenizer_bpe_train
# ---------------------------------------------------------------------------

# The classic BPE example (Sennrich et al. 2016): corpus word counts
# low×5, lower×2, newest×6, widest×3. All 12 merges hand-computed from
# the pair-count tables (argmax count, lexicographic (lhs, rhs)
# tie-break); at N=12 the corpus exhausts to whole words:
#   step 1: (e,s)=9 ties (s,t)=9 → 'es' (lexicographic)
#   step 2: (es,t)=9 → 'est'
#   step 3: (l,o)=7 ties (o,w)=7 → 'lo'
#   step 4: (lo,w)=7 → 'low'
#   step 5: (e,w)=6 ties (n,e),(w,est) → 'ew'
#   step 6: (ew,est)=6 ties (n,ew) → 'ewest'
#   step 7: (n,ewest)=6 → 'newest'
#   step 8: (d,est)=3 ties (i,d),(w,i) → 'dest'
#   step 9: (i,dest)=3 ties (w,i) → 'idest'
#   step 10: (w,idest)=3 → 'widest'
#   step 11: (e,r)=2 ties (low,e) → 'er'
#   step 12: (low,er)=2 → 'lower'
SENNRICH_MERGES = [
    (1, "e", "s", "es", 9),
    (2, "es", "t", "est", 9),
    (3, "l", "o", "lo", 7),
    (4, "lo", "w", "low", 7),
    (5, "e", "w", "ew", 6),
    (6, "ew", "est", "ewest", 6),
    (7, "n", "ewest", "newest", 6),
    (8, "d", "est", "dest", 3),
    (9, "i", "dest", "idest", 3),
    (10, "w", "idest", "widest", 3),
    (11, "e", "r", "er", 2),
    (12, "low", "er", "lower", 2),
]


def _sennrich_docs(spark):
    rows, i = [], 0
    for w, n in [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]:
        for _ in range(n):
            rows.append((i, w))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bpe_trainer_matches_hand_computed_sennrich_merges(spark):
    from sparkstreaming_rawdataingestion_spark.operators.text import (
        bpe_train_merges,
    )

    got = [
        (r.step, r.lhs, r.rhs, r.merged, r.pair_count)
        for r in sorted(
            bpe_train_merges(_sennrich_docs(spark)).collect(),
            key=lambda r: r.step,
        )
    ]
    assert got == SENNRICH_MERGES


def test_bpe_trainer_oracle_replays_the_same_merges():
    """The chained-CTE oracle (sentinel-delimited string replace) must
    reproduce the hand table too — certifying the replay, not just the
    engine."""
    import duckdb

    from sparkstreaming_rawdataingestion_spark.operators.text import (
        _BPE_TRAIN_ORACLE,
    )

    con = duckdb.connect()
    vals, i = [], 0
    for w, n in [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]:
        for _ in range(n):
            vals.append(f"({i}, '{w}')")
            i += 1
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(vals)
        + ") t(doc_id, text)"
    )
    got = con.execute(_BPE_TRAIN_ORACLE + " ORDER BY step").fetchall()
    assert [tuple(r) for r in got] == SENNRICH_MERGES


def test_bpe_merge_application_is_left_to_right_non_overlapping(spark):
    """'aaaa' under merge (a,a) must become (aa)(aa) — and 'aaa' must
    become (aa)(a), never a(aa): the left-to-right non-overlap rule
    both the Spark fold and the oracle's sentinel replace implement.
    Corpus: 'aaaa'×3 + 'aaa'×2 → step-1 pair counts (a,a) = 3·3+2·2
    = 13, merge 'aa'; step-2 counts: aaaa→[aa,aa] gives (aa,aa)=3,
    aaa→[aa,a] gives (aa,a)=2 → argmax (aa,aa) → 'aaaa' with count 3
    (a(aa) folding would instead leave no (aa,aa) pair at all)."""
    from sparkstreaming_rawdataingestion_spark.operators.text import (
        bpe_train_merges,
    )

    docs = spark.createDataFrame(
        [(0, "aaaa"), (1, "aaaa"), (2, "aaaa"), (3, "aaa"), (4, "aaa")],
        "doc_id long, text string",
    )
    got = [
        (r.step, r.lhs, r.rhs, r.merged, r.pair_count)
        for r in sorted(
            bpe_train_merges(docs, n_merges=2).collect(),
            key=lambda r: r.step,
        )
    ]
    assert got == [(1, "a", "a", "aa", 13), (2, "aa", "aa", "aaaa", 3)]


def test_bpe_trainer_stops_when_the_corpus_exhausts(spark):
    """A corpus of repeated single-char words has no adjacent pairs
    after 0 merges — the trainer returns an empty merge table instead
    of erroring (the registry corpora never hit this)."""
    from sparkstreaming_rawdataingestion_spark.operators.text import (
        bpe_train_merges,
    )

    docs = spark.createDataFrame(
        [(0, "a b"), (1, "a")], "doc_id long, text string"
    )
    assert bpe_train_merges(docs, n_merges=3).count() == 0


# ---------------------------------------------------------------------------
# tokenizer_bpe_roundtrip — the train → encode composition
# ---------------------------------------------------------------------------


def test_bpe_roundtrip_collapses_fixture_words_to_single_tokens(spark):
    """After the 12 Sennrich merges every corpus word IS a vocab piece,
    so the greedy encoder (make_greedy_encoder under alphabet+merges)
    emits exactly 1 token per word and 0 UNKs — the composition test
    from the round-9 brief, run through the registry query itself."""
    import os

    from sparkstreaming_rawdataingestion_spark.operators.text import (
        q_tokenizer_bpe_roundtrip,
    )

    # the registry callable reads documents from a dir: write the
    # fixture corpus as a one-table sf dir
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        _sennrich_docs(spark).write.parquet(
            os.path.join(td, "documents.parquet")
        )
        got = {
            r.doc_id: (r.n_words, r.n_tokens, r.n_unk)
            for r in q_tokenizer_bpe_roundtrip(spark, td).collect()
        }
    assert got == {i: (1, 1, 0) for i in range(16)}


def test_bpe_learned_vocab_composes_with_the_greedy_encoder():
    """Direct make_greedy_encoder composition on the learned pieces:
    'lowest' (NOT a corpus word) must encode as low+est under the
    Sennrich vocab — the learned merges generalize through the greedy
    longest-match rule."""
    from sparkstreaming_rawdataingestion_spark.operators.text import (
        make_greedy_encoder,
    )

    learned = tuple("deilnorstw") + tuple(m[3] for m in SENNRICH_MERGES)
    enc, _ = make_greedy_encoder(learned)
    assert enc("lowest") == ("low", "est")
    assert enc("newest") == ("newest",)
    # 'ow' is NOT a Sennrich merge, so 'widow' falls back to chars
    assert enc("widow") == ("w", "i", "d", "o", "w")


# ---------------------------------------------------------------------------
# multimodal_audio_fingerprint_pairs
# ---------------------------------------------------------------------------


def _wav_media(spark, clips):
    """Encode {media_id: [frame amps]} as real WAV rows (8 alternating
    ±amp samples per frame)."""
    from sparkstreaming_rawdataingestion_spark.operators import (
        media_codecs,
    )

    rows = []
    for mid, amps in clips.items():
        samples = []
        for amp in amps:
            samples.extend(amp if t % 2 == 0 else -amp for t in range(8))
        rows.append((mid, "audio/wav", media_codecs.wav_encode(samples)))
    return spark.createDataFrame(
        rows, "media_id long, mime string, payload binary"
    )


def test_audio_fingerprint_hand_computed_bands_and_pairs(spark):
    """Hand-built 65-frame clips:

    - media 0: amplitude envelope alternating 10/20 → delta bits
      alternate 1,0 from bit 0 → every 16-bit band = 0x5555 = 21845.
    - media 1: the ×3 amplitude-scaled copy → identical bands
      (delta-sign invariance) → pair (0,1) hamming 0.
    - media 2: copy of 0 with frame 0 bumped to 100 (energy 800 > the
      160 of frame 1) → ONLY bit 0 flips → band0 = 21844, bands 1-3
      unchanged → pairs (0,2) and (1,2) at hamming 1.
    - media 3: monotone rising envelope → all bits 1 → every band =
      0xFFFF: no band agrees with 0/1/2, so the pigeonhole join never
      even pairs it (distinct tone stays distinct).
    """
    from sparkstreaming_rawdataingestion_spark.operators.multimodal import (
        audio_fingerprint_bands,
        dhash_band_pairs,
    )

    alt = [10 if k % 2 == 0 else 20 for k in range(65)]
    clips = {
        0: alt,
        1: [3 * a for a in alt],
        2: [100] + alt[1:],
        3: [10 + k for k in range(65)],
    }
    bands = audio_fingerprint_bands(_wav_media(spark, clips))
    got_bands = {
        r.media_id: (r.band0, r.band1, r.band2, r.band3)
        for r in bands.collect()
    }
    assert got_bands[0] == (21845, 21845, 21845, 21845)
    assert got_bands[1] == got_bands[0]
    assert got_bands[2] == (21844, 21845, 21845, 21845)
    assert got_bands[3] == (65535, 65535, 65535, 65535)

    got_pairs = {
        (r.media_a, r.media_b, r.hamming)
        for r in dhash_band_pairs(bands).collect()
    }
    assert got_pairs == {(0, 1, 0), (0, 2, 1), (1, 2, 1)}


def test_audio_fingerprint_is_amplitude_scale_invariant(spark):
    """Any uniform positive scaling of an arbitrary envelope leaves the
    fingerprint bit-identical (every strict energy comparison scales on
    both sides)."""
    from sparkstreaming_rawdataingestion_spark.operators.multimodal import (
        audio_fingerprint_bands,
    )

    env = [((k * k * 37) % 991) + 1 for k in range(65)]
    clips = {0: env, 1: [7 * a for a in env]}
    got = {
        r.media_id: (r.band0, r.band1, r.band2, r.band3)
        for r in audio_fingerprint_bands(_wav_media(spark, clips)).collect()
    }
    assert got[0] == got[1]


def test_audio_fingerprint_rejects_wrong_shape_clips(spark):
    """The documented contract: clips that are not mono 520-sample PCM
    raise (quarantine-routable), never silently mis-fingerprint."""
    import pytest as _pytest

    from sparkstreaming_rawdataingestion_spark.operators.multimodal import (
        audio_fingerprint_bands,
    )

    short = _wav_media(spark, {0: [10, 20, 30]})  # 24 samples, not 520
    with _pytest.raises(Exception, match="520 samples"):
        audio_fingerprint_bands(short).collect()


# ---------------------------------------------------------------------------
# pipeline_training_build_semantic — stage conservation
# ---------------------------------------------------------------------------


def test_semantic_build_drops_exactly_the_non_canonical_survivors(spark):
    """Stage conservation against an INDEPENDENT Python replay: collect
    the within-cluster cosine pairs among curation survivors (the live
    kernel), union-find them in pure Python, and assert the semantic
    manifest's keep decisions equal the plain mix algebra applied to
    (survivors − non-component-min members) — i.e. the semantic stage
    removes exactly the union-find losers and nothing else."""
    import math

    from pyspark.sql import functions as F

    from sparkstreaming_rawdataingestion_spark import catalog
    from sparkstreaming_rawdataingestion_spark.operators import pipeline
    from sparkstreaming_rawdataingestion_spark.operators.dedup import (
        semantic_cluster_pairs,
    )
    from sparkstreaming_rawdataingestion_spark.operators.mining import _MMH2

    # sf0.01: the smallest corpus whose survivor set contains a real
    # semantic family (sf0.001's survivors have no qualifying pair)
    sf_dir = "/root/testdata/sf0.01"
    survivors = {
        r.doc_id
        for r in pipeline._stages(spark, sf_dir)["near_dedup"]
        .select("doc_id")
        .collect()
    }
    emb = catalog.load_table(spark, sf_dir, "embeddings")
    surv_df = spark.createDataFrame(
        [(d,) for d in survivors], "vec_id long"
    )
    pairs = [
        (r.vec_a, r.vec_b)
        for r in semantic_cluster_pairs(emb, restrict_to=surv_df).collect()
    ]
    # pure-Python union-find replay
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp: dict = {}
    for n in parent:
        comp.setdefault(find(n), set()).add(n)
    dropped = {n for members in comp.values() for n in members} - {
        min(members) for members in comp.values()
    }
    sem_survivors = survivors - dropped
    assert dropped, "fixture corpus produced no semantic families"

    # replay the mix decision over the PRUNED set (rates move with it)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    src_of = {r.doc_id: r.source for r in docs}
    n_s: dict = {}
    for d in sem_survivors:
        n_s[src_of[d]] = n_s.get(src_of[d], 0) + 1
    w = {s: round(math.sqrt(n), 9) for s, n in n_s.items()}
    sum_w = sum(w.values())
    rate = {
        s: min(1.0, (pipeline._BUILD_TARGET * w[s] / sum_w) / n_s[s])
        for s in n_s
    }
    expect = {
        d
        for d in sem_survivors
        if ((d % 4294967296) * _MMH2 % 4294967296 + 0.5) / 4294967296.0
        < rate[src_of[d]]
    }
    got = {
        r.doc_id
        for r in pipeline.q_pipeline_training_build_semantic(
            spark, sf_dir
        ).collect()
    }
    assert got == expect


def test_semantic_stage_keeps_one_member_even_when_global_canonical_lost(
    spark, tmp_path
):
    """THE survivor-restriction property (why restrict_to exists): a
    semantic family {8, 9, 10} whose corpus-global canonical (8) dies
    at the quality stage must still keep its surviving min (9) — a
    corpus-global prune list would kill 9 and 10 both, leaving the
    family unrepresented. Docs 0-7 are centroid-seed embeddings whose
    texts fail quality (seeds must not enter the survivor pair join);
    11 sits near another centroid and pairs with nothing."""
    import os

    from sparkstreaming_rawdataingestion_spark.operators import pipeline

    def good_text(i):
        toks = ["the"] + [f"w{i}x{j}" for j in range(24)]
        return " ".join(toks)

    docs = [(i, "junk", "s0") for i in range(9)]  # 0-8 fail quality
    docs += [(i, good_text(i), "s0") for i in (9, 10, 11)]
    emb = []
    for i in range(8):  # orthogonal-ish centroid seeds
        v = [0.0] * 8
        v[i] = 1.0
        emb.append((i, v))
    emb += [
        (8, [0.99, 0.01, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
        (9, [0.98, 0.02, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
        (10, [0.97, 0.03, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
        (11, [0.01, 0.99, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        docs, "doc_id long, text string, source string"
    ).write.parquet(os.path.join(sf, "documents.parquet"))
    spark.createDataFrame(
        emb, "vec_id long, embedding array<float>"
    ).write.parquet(os.path.join(sf, "embeddings.parquet"))

    got = {
        r.doc_id
        for r in pipeline.q_pipeline_training_build_semantic(
            spark, sf
        ).collect()
    }
    # tiny corpus → every rate saturates at 1.0: the manifest IS the
    # semantically pruned survivor set
    assert got == {9, 11}


def test_audio_canonical_selection_hand_fixture(spark):
    """The audio ladder's last rung on the hand-built clips: {0, its
    ×3 copy 1, its one-frame perturbation 2} form one family with rep
    0 (the only canonical); the distinct tone 3 is its own singleton
    family — connected components over the fingerprint pairs, exactly
    the image ladder's shape."""
    from pyspark.sql import functions as F

    from sparkstreaming_rawdataingestion_spark.operators.dedup import (
        connected_components,
    )
    from sparkstreaming_rawdataingestion_spark.operators.multimodal import (
        audio_fingerprint_bands,
        dhash_band_pairs,
    )

    alt = [10 if k % 2 == 0 else 20 for k in range(65)]
    clips = {
        0: alt,
        1: [3 * a for a in alt],
        2: [100] + alt[1:],
        3: [10 + k for k in range(65)],
    }
    bands = audio_fingerprint_bands(_wav_media(spark, clips))
    pairs = dhash_band_pairs(bands).select(
        F.col("media_a").alias("doc_a"), F.col("media_b").alias("doc_b")
    )
    labels = {
        r.node: r.label for r in connected_components(pairs).collect()
    }
    # clip 3 pairs with nothing → absent from the pair graph entirely
    assert labels == {0: 0, 1: 0, 2: 0}


# ---------------------------------------------------------------------------
# tokenizer_compression_report
# ---------------------------------------------------------------------------


def test_compression_report_hand_computed_on_the_sennrich_corpus(
    spark, tmp_path
):
    """Hand arithmetic over the Sennrich fixture with sources: after
    the 12 merges every word is 1 token, so per source chars_per_token
    = total chars / docs. srcA = the 5 low (3 chars) + 2 lower (5) →
    25 chars / 7 tokens; srcB = 6 newest + 3 widest (6 chars each) →
    54 chars / 9 tokens = exactly 6.0."""
    import os

    from sparkstreaming_rawdataingestion_spark.operators.text import (
        q_tokenizer_compression_report,
    )

    rows, i = [], 0
    for w, n, src in [
        ("low", 5, "srcA"),
        ("lower", 2, "srcA"),
        ("newest", 6, "srcB"),
        ("widest", 3, "srcB"),
    ]:
        for _ in range(n):
            rows.append((i, w, src, len(w)))
            i += 1
    spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long"
    ).write.parquet(os.path.join(str(tmp_path), "documents.parquet"))

    got = {
        r.source: (r.n_docs, r.n_tokens, r.n_chars, r.chars_per_token)
        for r in q_tokenizer_compression_report(
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {
        "srcA": (7, 7, 25, round(25 / 7, 6)),
        "srcB": (9, 9, 54, 6.0),
    }
