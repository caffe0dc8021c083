"""Round-13 operators: sub-frame (mid-frame) audio containment via
overlapping analysis frames + the exact-scale energy invariant, and the
portable integer-exact quantile-normalization twin."""

from __future__ import annotations

import pytest

# ---------------------------------------------------------------------------
# multimodal_audio_subframe_containment
# ---------------------------------------------------------------------------


def _subframe_samples():
    """Hand corpus SAMPLE streams: a QUADRATIC-mix original (per-frame
    constant |amplitude|, alternating sign — a linear zigzag's deltas
    are too regular: blends of {+14, -9} never flip a sign and the
    frame-grid matcher tracks the excerpt anyway), an excerpt of it
    starting at SAMPLE 43 — 5 frames + 3 samples: mid-frame,
    unrepresentable by any whole-frame offset — rescaled x2, and a
    reversed control. Excerpt length 784 samples puts TWO
    archive-aligned probe windows in range (u = 85 and 213)."""
    amps = [
        (((j * j * 7 + j * 31 + 13) % 65521) % 997) + 1
        for j in range(113)
    ]
    orig = [
        amps[t // 8] * (1 if t % 2 == 0 else -1) for t in range(113 * 8)
    ]
    s0 = 43
    excerpt = [2 * v for v in orig[s0 : s0 + 784]]
    rev = list(reversed(amps))
    control = [
        rev[t // 8] * (1 if t % 2 == 0 else -1) for t in range(113 * 8)
    ]
    return orig, excerpt, control, s0


def _subframe_media(spark):
    from sparkstreaming_rawdataingestion_spark.operators import (
        media_codecs,
    )

    orig, excerpt, control, _ = _subframe_samples()
    rows = [
        (0, "audio/wav", media_codecs.wav_encode(orig)),
        (1, "audio/wav", media_codecs.wav_encode(excerpt)),
        (2, "audio/wav", media_codecs.wav_encode(control)),
    ]
    return spark.createDataFrame(
        rows, "media_id long, mime string, payload binary"
    )


def _sub_prints(samples, hop, fs=8):
    """Pure-Python replay of the sub-frame print stage: |sample| prefix
    sums → 65-frame windows (frame size ``fs``) at ``hop`` SAMPLES →
    (bands, e_head, e_sum) per window start. Independent of Spark and
    DuckDB; ONE replay for the native and decimated rungs."""
    a = [abs(v) for v in samples]
    pref = [0]
    for v in a:
        pref.append(pref[-1] + v)
    out = {}
    for u in range(0, len(samples) - 65 * fs + 1, hop):
        fe = [
            pref[u + fs * (k + 1)] - pref[u + fs * k] for k in range(65)
        ]
        bits = [1 if fe[k + 1] > fe[k] else 0 for k in range(64)]
        bands = tuple(
            sum(bits[16 * b + i] << i for i in range(16))
            for b in range(4)
        )
        out[u] = (bands, fe[0], sum(fe))
    return out


def _expected_subframe_votes(probe, archive):
    """Replay the pair algebra: band-match candidates, hamming <= 3,
    exact-scale cross-multiplication, then the (n_exact DESC,
    n_aligned DESC, min_hamming, offset) vote."""
    from collections import defaultdict

    votes: dict = defaultdict(lambda: defaultdict(list))
    for (mq, uq), (pb, ph, ps) in probe.items():
        for (mr, ur), (ab, ah, asum) in archive.items():
            if mq == mr:
                continue
            if not any(x == y for x, y in zip(pb, ab)):
                continue
            ham = sum(bin(x ^ y).count("1") for x, y in zip(pb, ab))
            if ham > 3:
                continue
            exact = 1 if ph * asum == ps * ah else 0
            votes[(mq, mr)][ur - uq].append((ham, exact))
    expected = {}
    for pair, offs in votes.items():
        ranked = sorted(
            (
                -sum(e for _, e in hs),
                -len(hs),
                min(h for h, _ in hs),
                o,
            )
            for o, hs in offs.items()
        )
        ne, na, mh, o = ranked[0]
        expected[pair] = (o, -na, -ne, mh)
    return expected


def test_subframe_alignment_hand_fixture(spark):
    """The mid-frame excerpt must find its original at SAMPLE offset
    43 with n_exact = 2 and hamming 0 — BY CONSTRUCTION: probe windows
    85 and 213 start at original samples 128 and 256 (archive windows
    1 and 2), and the x2 rescale preserves every delta sign AND the
    exact energy proportion. The full expected row set is derived by
    a pure-Python replay of prints + pair algebra."""
    from sparkstreaming_rawdataingestion_spark.operators.multimodal import (
        audio_subframe_alignment,
        audio_subframe_fingerprint_bands,
    )

    orig, excerpt, control, s0 = _subframe_samples()
    probe = {
        (1, u): v for u, v in _sub_prints(excerpt, 1).items()
    }
    archive = {
        (m, u): v
        for m, s in ((0, orig), (2, control))
        for u, v in _sub_prints(s, 128).items()
    }
    # the aligned pins, checkable by eye
    assert probe[(1, 128 - s0)][0] == archive[(0, 128)][0]
    assert probe[(1, 256 - s0)][0] == archive[(0, 256)][0]
    expected = _expected_subframe_votes(probe, archive)

    media = _subframe_media(spark)
    got = {
        (r.media_q, r.media_r): (
            r.offset_samples,
            r.n_aligned,
            r.n_exact,
            r.min_hamming,
        )
        for r in audio_subframe_alignment(
            audio_subframe_fingerprint_bands(
                media.where("media_id = 1")
            ),
            audio_subframe_fingerprint_bands(
                media.where("media_id != 1"), sample_hop=128
            ),
        ).collect()
    }
    assert got == expected
    assert expected[(1, 0)] == (s0, 2, 2, 0)  # the construction offset


def test_framegrid_matcher_blind_to_subframe_excerpt(spark):
    """The round-12 frame-grid asymmetric matcher cannot represent a
    mid-frame offset (it votes in whole frames): on the sample-43
    quadratic fixture it reports NO (excerpt, original) pair AT ALL —
    every frame-grid probe window blends two original frames and the
    blended prints fall outside the hamming bar (verified by the
    pure-Python replay when choosing the envelope)."""
    from sparkstreaming_rawdataingestion_spark.operators.multimodal import (
        audio_probe_alignment,
        audio_windowed_fingerprint_bands,
    )

    media = _subframe_media(spark)
    rows = audio_probe_alignment(
        audio_windowed_fingerprint_bands(
            media.where("media_id = 1"), hop_frames=1
        ),
        audio_windowed_fingerprint_bands(media.where("media_id != 1")),
    ).collect()
    assert all((r.media_q, r.media_r) != (1, 0) for r in rows)


def test_subframe_registry_fixture_offsets(spark, sf_dir):
    """Registry-scale pin: every excerpt (odd media_id) reports its own
    original (media_id - 1) at offset_samples = _afps_off_samples(f)
    with n_aligned = n_exact = 2 and hamming 0 — the closed-form
    construction, checked per family."""
    from sparkstreaming_rawdataingestion_spark.operators.multimodal import (
        _afps_off_samples,
        q_multimodal_audio_subframe_containment,
    )

    rows = q_multimodal_audio_subframe_containment(spark, sf_dir).collect()
    true_rows = {
        r.media_q: r for r in rows if r.media_r == r.media_q - 1
    }
    n_docs = max(r.media_q for r in rows) + 1
    assert len(true_rows) >= n_docs // 2 - 1
    for mq, r in true_rows.items():
        f = mq // 2
        assert r.offset_samples == _afps_off_samples(f)
        assert r.n_aligned == 2
        assert r.n_exact == 2
        assert r.min_hamming == 0


def test_subframe_fingerprint_rejects_bad_clips(spark):
    """Mono and >= one whole 520-sample window are contract; stereo or
    short clips raise the stage's OWN message instead of
    fingerprinting garbage (matching on the message — a bare
    exception check would pass on any unrelated failure and the guard
    could be deleted unnoticed; r13 review)."""
    import io
    import struct
    import wave

    from sparkstreaming_rawdataingestion_spark.operators import (
        media_codecs,
    )
    from sparkstreaming_rawdataingestion_spark.operators.multimodal import (
        audio_subframe_fingerprint_bands,
    )

    short = spark.createDataFrame(
        [(0, "audio/wav", media_codecs.wav_encode([5] * 100))],
        "media_id long, mime string, payload binary",
    )
    # PySpark surfaces the worker ValueError as PythonException; the
    # MESSAGE is the pin (Exception alone would pass on any failure)
    with pytest.raises(
        Exception, match="sub-frame audio fingerprint expects mono"
    ):
        audio_subframe_fingerprint_bands(short).collect()

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:  # 2-channel clip, long enough
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(struct.pack("<1200h", *([7] * 1200)))
    stereo = spark.createDataFrame(
        [(1, "audio/wav", buf.getvalue())],
        "media_id long, mime string, payload binary",
    )
    with pytest.raises(
        Exception, match="sub-frame audio fingerprint expects mono"
    ):
        audio_subframe_fingerprint_bands(stereo).collect()


# ---------------------------------------------------------------------------
# quantile_normalize_portable
# ---------------------------------------------------------------------------

QNP_DOCS = (
    # (doc_id, source, n_chars) — duplicate scores within and across
    # sources, one singleton source (the n_src == 1 guard), counts
    # chosen so grid interpolation hits nonzero remainders
    [(i, "a", c) for i, c in enumerate([10, 20, 20, 30, 50, 80, 80])]
    + [(100 + i, "b", c) for i, c in enumerate([10, 15, 30, 30, 90])]
    + [(200, "c", 40)]
)


def _qnp_expected():
    """Independent pure-Python replay of the portable mechanism —
    value histogram, integer grid, per-source ranks, integer
    interpolation, micros floor division — no Spark, no DuckDB."""
    from collections import Counter, defaultdict

    D = 100
    scores = sorted(c for _, _, c in QNP_DOCS)
    n = len(scores)
    hist = Counter(scores)
    n_cells = len(hist)
    # g_num[i] over denominator D
    g_num = []
    for i in range(D + 1):
        pos = i * (n - 1)
        t = 0 if n == 1 else min(pos // D, n - 2)
        rem = pos - t * D
        g_num.append(scores[t] * (D - rem) + scores[t + 1] * rem)
    by_src = defaultdict(list)
    for doc_id, src, c in QNP_DOCS:
        by_src[src].append((c, doc_id))
    out = {}
    for src, items in by_src.items():
        items.sort()
        n_src = len(items)
        dsrc = 1 if n_src == 1 else n_src - 1
        for rk0, (c, doc_id) in enumerate(items):
            idxn = rk0 * D
            lo = 0 if n_src == 1 else min(idxn // dsrc, D - 1)
            rem2 = idxn - lo * dsrc
            num = g_num[lo] * (dsrc - rem2) + g_num[lo + 1] * rem2
            micros = num * 1_000_000 // (dsrc * D)
            out[doc_id] = (src, c, micros, n_cells, n_cells)
    return out


def _qnp_write_docs(spark, tmp_path):
    sf = str(tmp_path)
    spark.createDataFrame(
        QNP_DOCS, "doc_id long, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    return sf


def test_qnp_hand_fixture(spark, tmp_path):
    """Engine output must equal the pure-Python replay exactly — every
    value is an integer, so there is no rounding convention to share
    (the count-min precedent)."""
    from sparkstreaming_rawdataingestion_spark.operators.signals import (
        q_quantile_normalize_portable,
    )

    sf = _qnp_write_docs(spark, tmp_path)
    got = {
        r.doc_id: (
            r.source,
            r.score,
            r.norm_micros,
            r.n_cells,
            r.n_cells_merge_eq_direct,
        )
        for r in q_quantile_normalize_portable(spark, sf).collect()
    }
    assert got == _qnp_expected()
    # endpoints: per-source min -> global min, max -> global max
    scores = sorted(c for _, _, c in QNP_DOCS)
    assert got[0][2] == scores[0] * 1_000_000  # min of source a
    assert got[6][2] == scores[-1] * 1_000_000  # max of source a
    # singleton source maps to pr = 0 -> the global minimum
    assert got[200][2] == scores[0] * 1_000_000


def test_qnp_cross_engine_tiny_corpus(spark, tmp_path):
    """Run the DuckDB oracle text itself on the hand corpus against
    the engine, pinning the oracle SQL in-repo (the r12-advice recipe
    applied to the new twin from day one)."""
    import duckdb

    from sparkstreaming_rawdataingestion_spark.operators.signals import (
        _QNP_ORACLE,
        q_quantile_normalize_portable,
    )

    sf = _qnp_write_docs(spark, tmp_path)
    got = sorted(
        tuple(r)
        for r in q_quantile_normalize_portable(spark, sf).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    want = sorted(tuple(r) for r in con.execute(_QNP_ORACLE).fetchall())
    assert got == want


def test_qnp_tracks_exact_kernel(spark, sf_dir):
    """The twin's fixed-point output must track the EXACT kernel
    (quantile_normalize_sources) within grid resolution: the grid has
    101 breakpoints over the global distribution, so for every
    document |norm_micros/1e6 - exact norm_score| is bounded by the
    largest score gap spanned by one grid interval (computed from the
    data, not assumed)."""
    from sparkstreaming_rawdataingestion_spark.operators.signals import (
        q_quantile_normalize_portable,
        q_quantile_normalize_sources,
    )

    exact = {
        r.doc_id: r.norm_score
        for r in q_quantile_normalize_sources(spark, sf_dir).collect()
    }
    twin = {
        r.doc_id: r.norm_micros / 1_000_000
        for r in q_quantile_normalize_portable(spark, sf_dir).collect()
    }
    scores = sorted(exact.values())
    n = len(scores)
    per_grid = max(1, (n - 1) // 100)
    worst_gap = max(
        scores[min(i + per_grid + 1, n - 1)] - scores[i]
        for i in range(0, n - 1)
    )
    assert set(twin) == set(exact)
    for doc_id, v in twin.items():
        assert abs(v - exact[doc_id]) <= worst_gap + 1e-9, doc_id


# ---------------------------------------------------------------------------
# BPE tie-splitting batch schedule (round-12 verdict Next #4)
# ---------------------------------------------------------------------------


def test_batch_schedule_tie_split_keeps_safe_prefix():
    """A count-tie whose interacting row only touches a LATE rule: the
    strict trim used to reject the whole tie level (K=1); the
    tie-splitting rule keeps every member up to and including the
    first dangerous rule (creations can only preempt members AFTER
    their creating rule)."""
    from sparkstreaming_rawdataingestion_spark.operators.text import (
        _bpe_batch_schedule,
    )

    rows = [
        ("a", "b", 5),
        ("c", "d", 5),
        ("e", "f", 5),
        ("g", "h", 5),
        ("x", "g", 5),  # interacts rule 3 only -> danger index 3
    ]
    got = _bpe_batch_schedule(rows, set("abcdefghx"), 10, 64)
    assert got == rows[:4]


def test_batch_schedule_tie_split_cuts_after_danger():
    """Members after the first dangerous rule are dropped: the
    interacting tie row touches rule 0, so only rule 0 survives the
    tie (a pair created by rule 0 could tie the count and win a
    lexicographic tie against any later member)."""
    from sparkstreaming_rawdataingestion_spark.operators.text import (
        _bpe_batch_schedule,
    )

    rows = [
        ("a", "b", 5),
        ("c", "d", 5),
        ("e", "f", 5),
        ("x", "a", 5),  # interacts rule 0 -> danger index 0
    ]
    got = _bpe_batch_schedule(rows, set("abcdefx"), 10, 64)
    assert got == [("a", "b", 5)]


def test_batch_schedule_tie_split_full_page_conservative():
    """A FULL page still tied at its tail: unseen pairs can tie c_q and
    interact with anything, so every rule is dangerous — only a
    leading tie member survives (plus all strictly-above-tie rows)."""
    from sparkstreaming_rawdataingestion_spark.operators.text import (
        _bpe_batch_schedule,
    )

    rows = [("a", "b", 7), ("c", "d", 5), ("e", "f", 5)]
    got = _bpe_batch_schedule(rows, set("abcdef"), 10, top_m=3)
    # ("c","d",5) drops: an unseen pair could interact with rule 0 at
    # count 5, and a pair rule 0 creates could then tie ("c","d")
    assert got == [("a", "b", 7)]
    # first row itself in the tie: it survives alone
    rows2 = [("a", "b", 5), ("c", "d", 5), ("e", "f", 5)]
    got2 = _bpe_batch_schedule(rows2, set("abcdef"), 10, top_m=3)
    assert got2 == [("a", "b", 5)]


def test_batch_schedule_tie_split_mixed_levels():
    """Above-tie members always survive; the tie level splits at its
    own danger point; sub-c_q in-list rows never create danger (their
    creations are bounded strictly below the tie)."""
    from sparkstreaming_rawdataingestion_spark.operators.text import (
        _bpe_batch_schedule,
    )

    rows = [
        ("a", "b", 9),
        ("c", "d", 5),
        ("e", "f", 5),
        ("x", "e", 5),  # interacts rule 2 -> danger index 2
        ("y", "a", 4),  # BELOW the tie: harmless for the tie split
    ]
    got = _bpe_batch_schedule(rows, set("abcdefxy"), 10, 64)
    assert got == rows[:3]


def test_bpe_tie_split_equality_on_shared_token_ties(spark):
    """Bit-identity pin on a corpus built to hit the tie-splitting
    path: many equal-count pairs, some sharing tokens — the batched
    trainer with tie splitting must emit the SAME merge table as the
    sequential K=1 loop (and as the driver-local trainer)."""
    from sparkstreaming_rawdataingestion_spark.operators.text import (
        _bpe_train_from_pieces,
        _bpe_train_from_pieces_batched,
        _bpe_word_pieces,
    )
    from sparkstreaming_rawdataingestion_spark import session

    words = []
    # 12 disjoint-tie words at count 4 each, plus token-sharing ties:
    # chains like 'pq', 'qr', 'rs' collide on shared tokens at equal
    # counts, plus a self-pair run and a collision setup
    for i in range(12):
        words += [chr(0x4E00 + 2 * i) + chr(0x4E01 + 2 * i)] * 4
    words += ["pq"] * 4 + ["qr"] * 4 + ["rs"] * 4 + ["zz"] * 4
    docs = spark.createDataFrame(
        [(0, " ".join(words)), (1, " ".join(reversed(words)))],
        "doc_id long, text string",
    )
    session.release_staged()
    pieces = session.stage(_bpe_word_pieces(docs))
    seq = sorted(
        (r.step, r.lhs, r.rhs, r.merged, r.pair_count)
        for r in _bpe_train_from_pieces(spark, pieces, 20).collect()
    )
    log: list = []
    bat = sorted(
        (r.step, r.lhs, r.rhs, r.merged, r.pair_count)
        for r in _bpe_train_from_pieces_batched(
            spark, pieces, 20, local_max_words=0, _round_log=log
        ).collect()
    )
    assert bat == seq
    # the tie split must beat one-merge-per-round on this corpus
    assert len(log) < len(seq)


# ---------------------------------------------------------------------------
# similarity_ivf_portable_topk — pure-Python replay of the mechanism
# ---------------------------------------------------------------------------


def test_portable_ivf_matches_pure_python_replay(spark, sf_dir):
    """Independent replay of the whole inverted-file mechanism —
    integer quantization, lowest-id seed centroids, exact-BIGINT
    squared-L2 assignment with lowest-cluster ties, nprobe list
    selection, within-list re-rank, and the per-row exact-top-k flag —
    in plain Python over the collected embeddings; the engine must
    agree exactly (everything is an integer)."""
    import math

    from sparkstreaming_rawdataingestion_spark import catalog
    from sparkstreaming_rawdataingestion_spark.operators.similarity import (
        IVF_CLUSTERS,
        IVF_NPROBE,
        IVFP_SCALE,
        N_QUERIES,
        TOP_K,
        q_similarity_ivf_portable_topk,
    )

    rows = (
        catalog.load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    codes = {
        r.vec_id: [math.floor(float(x) * IVFP_SCALE + 0.5) for x in r.embedding]
        for r in rows
    }
    nrm = {v: sum(x * x for x in c) for v, c in codes.items()}

    def d2(a, b):
        return nrm[a] + nrm[b] - 2 * sum(
            x * y for x, y in zip(codes[a], codes[b])
        )

    cent = sorted(codes)[:IVF_CLUSTERS]  # cluster_id = index + 1

    def cdist(v, j):
        cc = codes[cent[j]]
        cn = nrm[cent[j]]
        return nrm[v] + cn - 2 * sum(x * y for x, y in zip(codes[v], cc))

    assign = {
        v: min(range(IVF_CLUSTERS), key=lambda j: (cdist(v, j), j)) + 1
        for v in codes
    }
    expected = {}
    for qv in [v for v in codes if v < N_QUERIES]:
        probed = [
            j + 1
            for j in sorted(
                range(IVF_CLUSTERS), key=lambda j: (cdist(qv, j), j)
            )[:IVF_NPROBE]
        ]
        cand = [
            v for v in codes if v != qv and assign[v] in probed
        ]
        ranked = sorted(cand, key=lambda v: (d2(qv, v), v))[:TOP_K]
        exact = set(
            sorted(
                (v for v in codes if v != qv),
                key=lambda v: (d2(qv, v), v),
            )[:TOP_K]
        )
        for rk, v in enumerate(ranked, 1):
            expected[(qv, v)] = (rk, d2(qv, v), 1 if v in exact else 0)

    got = {
        (r.query_id, r.neighbor_id): (r.rk, r.dist2, r.in_exact_topk)
        for r in q_similarity_ivf_portable_topk(spark, sf_dir).collect()
    }
    assert got == expected
    assert len(got) == N_QUERIES * TOP_K


# ---------------------------------------------------------------------------
# sketch_bloom_portable — pure-Python replay + guarantees
# ---------------------------------------------------------------------------


def _blm_mix(x):
    from sparkstreaming_rawdataingestion_spark.operators.stats import (
        _HLLP_FOLD,
        _HLLP_MUL,
        _HLLP_ROUNDS,
    )

    h = x % (1 << 32)
    for _ in range(_HLLP_ROUNDS):
        h = (h ^ (h >> _HLLP_FOLD)) * _HLLP_MUL % (1 << 32)
    return h ^ (h >> _HLLP_FOLD)


def test_portable_bloom_matches_pure_python_replay(spark, sf_dir):
    """Independent replay of the whole mechanism — salted lowbias
    hashes, 63-bit words, bit_or build, monthly partial merge,
    all-k-bits membership, the zero-false-negative guarantee and the
    fixed-point FPR — in plain Python over the collected keys; the
    engine must agree exactly."""
    from sparkstreaming_rawdataingestion_spark import catalog
    from sparkstreaming_rawdataingestion_spark.operators.stats import (
        _BLM_SALT,
        BLM_BITS,
        BLM_K,
        BLM_WBITS,
        q_sketch_bloom_portable,
    )

    rows = (
        catalog.load_table(spark, sf_dir, "orders")
        .selectExpr(
            "o_custkey AS k",
            "year(CAST(o_orderdate AS DATE)) AS y",
            "month(CAST(o_orderdate AS DATE)) AS mo",
        )
        .collect()
    )
    build = sorted({r.k for r in rows if r.y == 1995})
    probe = sorted({r.k for r in rows if r.y == 1996})
    months = sorted({(r.mo, r.k) for r in rows if r.y == 1995})

    def positions(k):
        return [
            _blm_mix(k + r * _BLM_SALT) % BLM_BITS for r in range(BLM_K)
        ]

    words: dict = {}
    for k in build:
        for idx in positions(k):
            w, b = divmod(idx, BLM_WBITS)
            words[w] = words.get(w, 0) | (1 << b)
    monthly: dict = {}
    for mo, k in months:
        for idx in positions(k):
            w, b = divmod(idx, BLM_WBITS)
            monthly[w] = monthly.get(w, 0) | (1 << b)
    bset = set(build)
    n_true = n_tm = n_fp = 0
    for k in probe:
        member = all(
            words.get(idx // BLM_WBITS, 0) >> (idx % BLM_WBITS) & 1
            for idx in positions(k)
        )
        if k in bset:
            n_true += 1
            n_tm += int(member)
        else:
            n_fp += int(member)
    expected = (
        len(probe),
        n_true,
        n_tm,
        n_fp,
        n_fp * 1_000_000 // max(len(probe) - n_true, 1),
        len(words),
        sum(1 for w, v in words.items() if monthly.get(w) == v),
    )
    got = [tuple(r) for r in q_sketch_bloom_portable(spark, sf_dir).collect()]
    assert got == [expected]
    # the Bloom guarantee and OR-mergeability, stated directly
    assert n_tm == n_true
    assert expected[6] == expected[5]


def test_portable_bloom_cross_engine_tiny_corpus(spark, tmp_path):
    """Run the DuckDB oracle text itself against the engine on a tiny
    two-year corpus, pinning the oracle SQL in-repo until the entry's
    first driver row (the count-min precedent), and exercising a
    corpus with REAL false positives expected zero (sparse filter)."""
    import duckdb

    from sparkstreaming_rawdataingestion_spark.operators.stats import (
        _BLM_ORACLE,
        q_sketch_bloom_portable,
    )

    sf = str(tmp_path)
    # the >2^31 keys pin the r13 precedence fix: "k + r*SALT % M"
    # bound the modulus to the salt product only, diverging from the
    # engine once the salted sum crossed 2^32 (~1.85e9 at r=3)
    big = [3_000_000_000 + 7 * i for i in range(6)]
    rows = (
        [(k, "1995-0%d-15" % (k % 9 + 1)) for k in range(1, 30)]
        + [(k, "1995-02-15") for k in big[:3]]
        + [(k, "1996-03-15") for k in range(20, 60)]
        + [(k, "1996-03-15") for k in big]
    )
    spark.createDataFrame(
        rows, "o_custkey long, o_orderdate string"
    ).selectExpr(
        "o_custkey", "CAST(o_orderdate AS TIMESTAMP) AS o_orderdate"
    ).coalesce(1).write.parquet(f"{sf}/orders.parquet")

    got = [tuple(r) for r in q_sketch_bloom_portable(spark, sf).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{sf}/orders.parquet/*.parquet')"
    )
    want = [tuple(r) for r in con.execute(_BLM_ORACLE).fetchall()]
    assert got == want
    (n_probed, n_true, n_tm, n_fp, fpr, n_w, n_eq) = got[0]
    assert (n_probed, n_true, n_tm) == (46, 13, 13)
    assert n_eq == n_w
    # 32 keys x 4 hashes in 64512 bits: expected FPR ~ (1-e^-.002)^4
    assert n_fp == 0 and fpr == 0


# ---------------------------------------------------------------------------
# multimodal_audio_decimated_containment
# ---------------------------------------------------------------------------


def test_decimated_registry_fixture_offsets(spark, sf_dir):
    """Registry-scale pin: every 2x-decimated excerpt reports its own
    original at the true offset FLOORED TO THE DECIMATION GRID
    (S - (S mod 2) — a decimated copy carries no sub-grid position
    information) with n_aligned = n_exact = 2 and hamming 0."""
    from sparkstreaming_rawdataingestion_spark.operators.multimodal import (
        AFPD_RATE,
        _afps_off_samples,
        q_multimodal_audio_decimated_containment,
    )

    rows = q_multimodal_audio_decimated_containment(
        spark, sf_dir
    ).collect()
    true_rows = {
        r.media_q: r for r in rows if r.media_r == r.media_q - 1
    }
    n_docs = max(r.media_q for r in rows) + 1
    assert len(true_rows) >= n_docs // 2 - 1
    for mq, r in true_rows.items():
        S = _afps_off_samples(mq // 2)
        assert r.offset_samples == S - (S % AFPD_RATE)
        assert r.n_aligned == 2
        assert r.n_exact == 2
        assert r.min_hamming == 0


def test_decimated_hand_fixture_replay(spark):
    """Pure-Python replay of the decimated pipeline on the hand
    corpus: decimate the sample-43 excerpt 2x, fingerprint with
    4-sample analysis frames at sample hop 1, run the pair algebra
    with the rate-2 offset mapping — the engine must agree exactly,
    and the true pair lands at offset 42 (43 floored to the even
    grid) with n_exact = 2, hamming 0."""
    from sparkstreaming_rawdataingestion_spark.operators import (
        media_codecs,
    )
    from sparkstreaming_rawdataingestion_spark.operators.multimodal import (
        audio_subframe_alignment,
        audio_subframe_fingerprint_bands,
    )

    orig, excerpt, control, s0 = _subframe_samples()
    dec = excerpt[::2]  # 392 samples

    probe = {(1, u): v for u, v in _sub_prints(dec, 1, fs=4).items()}
    archive = {
        (m, u): v
        for m, smp in ((0, orig), (2, control))
        for u, v in _sub_prints(smp, 128).items()
    }
    from collections import defaultdict

    votes: dict = defaultdict(lambda: defaultdict(list))
    for (mq, uq), (pb, ph, ps) in probe.items():
        for (mr, ur), (ab, ah, asum) in archive.items():
            if mq == mr or not any(x == y for x, y in zip(pb, ab)):
                continue
            ham = sum(bin(x ^ y).count("1") for x, y in zip(pb, ab))
            if ham > 3:
                continue
            exact = 1 if ph * asum == ps * ah else 0
            votes[(mq, mr)][ur - 2 * uq].append((ham, exact))
    expected = {}
    for pair, offs in votes.items():
        ne, na, mh, o = sorted(
            (
                -sum(e for _, e in hs),
                -len(hs),
                min(h for h, _ in hs),
                o,
            )
            for o, hs in offs.items()
        )[0]
        expected[pair] = (o, -na, -ne, mh)

    media = spark.createDataFrame(
        [
            (0, "audio/wav", media_codecs.wav_encode(orig)),
            (1, "audio/wav", media_codecs.wav_encode(dec)),
            (2, "audio/wav", media_codecs.wav_encode(control)),
        ],
        "media_id long, mime string, payload binary",
    )
    got = {
        (r.media_q, r.media_r): (
            r.offset_samples,
            r.n_aligned,
            r.n_exact,
            r.min_hamming,
        )
        for r in audio_subframe_alignment(
            audio_subframe_fingerprint_bands(
                media.where("media_id = 1"), frame_size=4
            ),
            audio_subframe_fingerprint_bands(
                media.where("media_id != 1"), sample_hop=128
            ),
            probe_rate=2,
        ).collect()
    }
    assert got == expected
    assert expected[(1, 0)] == (s0 - s0 % 2, 2, 2, 0)  # 42: grid floor
