"""Round-9 operator fixtures — closed-form, hand-computed answers.

Oracle parity cannot catch a formula bug shared by engine and oracle
(the round-6 Wilson lesson), so every new operator here gets a fixture
whose expected output is derived by hand before either engine runs.
"""

import pytest


# ---------------------------------------------------------------------------
# decontamination_semantic_pairs
# ---------------------------------------------------------------------------


def test_semantic_decon_flags_within_cluster_paraphrase_only(spark):
    """Hand-built 2-D geometry, k=2 seeds [1,0] / [0,1] (assignment
    boundary = the line y=x), eval = vec_id % 3 == 0, threshold 0.9:

    - eval 0 [1,0] pairs with train 2 [0.97,0.03] (cos .9995) and
      train 4 [0.95,0.05] (cos .9986) — both cluster 0.
    - eval 3 [1.2,1.1] and train 5 [1.1,1.2] are a paraphrase-shaped
      near-dup (cos .9959) SPLIT by the cluster boundary (3 → cluster
      0, 5 → cluster 1): the documented SemDeDup approximation — the
      pair must NOT be flagged.
    - eval/eval (0,3) and train/train (2,4) closeness never pairs.
    - eval 6 [-1,0] (cluster 1) has no positive-cosine train partner.
    """
    from sparkstreaming_rawdataingestion_spark.operators.dedup import (
        semantic_decon_pairs,
    )

    vecs = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [0.97, 0.03]),
        (3, [1.2, 1.1]),
        (4, [0.95, 0.05]),
        (5, [1.1, 1.2]),
        (6, [-1.0, 0.0]),
    ]
    e = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    got = {
        (r.eval_id, r.train_id, r.cluster_id)
        for r in semantic_decon_pairs(
            e, k=2, eval_mod=3, threshold=0.9
        ).collect()
    }
    assert got == {(0, 2, 0), (0, 4, 0)}

    # sanity: the missed pair really is a near-dup by brute force
    import math

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        return dot / (
            math.hypot(*a) * math.hypot(*b)
        )

    assert cos([1.2, 1.1], [1.1, 1.2]) > 0.99


# ---------------------------------------------------------------------------
# tokenizer_greedy_subword
# ---------------------------------------------------------------------------


def test_greedy_tokenizer_hand_tokenized_fixture(spark):
    """Hand-applied WordPiece rule over a tiny custom vocab:

    - 'table' → tab+le (2): LONGEST match wins over 't'/'ta' prefixes.
    - 'tables' → tab+le+s (3): leftover char falls back to a single.
    - 'dup' → d+u+p (3): no multi-char piece covers it.
    - 'x9y' → x + UNK('9') + y (3 tokens, 1 unk): the char fallback
      only covers letters, digits are out-of-alphabet.
    - '' (empty word from a double space) → 0 tokens.
    """
    from sparkstreaming_rawdataingestion_spark.operators.text import (
        tokenizer_greedy_subword,
    )

    pieces = tuple("abcdefghijklmnopqrstuvwxyz") + ("t", "ta", "tab", "le")
    docs = spark.createDataFrame(
        [(1, "table tables"), (2, "dup  x9y")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_words, r.n_tokens, r.n_unk)
        for r in tokenizer_greedy_subword(docs, pieces=pieces).collect()
    }
    # doc 2: 'dup', '', 'x9y' → 3 words, 3+0+3 tokens, 1 unk
    assert got == {1: (2, 5, 0), 2: (3, 6, 1)}


def test_greedy_tokenizer_longest_match_beats_first_match(spark):
    """With both 'st' and 'stream' in the vocab the encoder must take
    'stream' (1 token), not 'st'+... — the property separating greedy
    LONGEST-match from any shorter-first scan."""
    from sparkstreaming_rawdataingestion_spark.operators.text import (
        tokenizer_greedy_subword,
    )

    pieces = tuple("abcdefghijklmnopqrstuvwxyz") + ("st", "stream")
    docs = spark.createDataFrame([(1, "stream")], "doc_id long, text string")
    row = tokenizer_greedy_subword(docs, pieces=pieces).collect()[0]
    assert (row.n_words, row.n_tokens, row.n_unk) == (1, 1, 0)


def test_greedy_tokenizer_null_text_is_empty(spark):
    from sparkstreaming_rawdataingestion_spark.operators.text import (
        tokenizer_greedy_subword,
    )

    docs = spark.createDataFrame([(1, None)], "doc_id long, text string")
    row = tokenizer_greedy_subword(docs).collect()[0]
    # ''.split(' ') == [''] — one empty word, zero tokens
    assert (row.n_words, row.n_tokens, row.n_unk) == (1, 0, 0)


# ---------------------------------------------------------------------------
# multimodal_image_dhash_pairs
# ---------------------------------------------------------------------------


def _png_media(spark, rows_by_id):
    from sparkstreaming_rawdataingestion_spark.operators import media_codecs

    data = [
        (mid, "image/png", media_codecs.png_encode(rows, color_type=0))
        for mid, rows in rows_by_id.items()
    ]
    return spark.createDataFrame(
        data, "media_id long, mime string, payload binary"
    )


def test_dhash_bands_closed_form_monotone_images(spark):
    """Hand-derived hashes: an image strictly increasing in x has every
    gradient bit 1 (all four bands 0xFFFF); strictly decreasing has
    every bit 0 (all bands 0). Block means of px = 10*i are 20c + 5 —
    monotone survives the 2x2 downsample by construction."""
    from sparkstreaming_rawdataingestion_spark.operators.multimodal import (
        image_dhash_bands,
    )

    inc = [bytes(10 * i for i in range(18)) for _ in range(16)]
    dec = [bytes(170 - 10 * i for i in range(18)) for _ in range(16)]
    media = _png_media(spark, {1: inc, 2: dec})
    got = {
        r.media_id: (r.band0, r.band1, r.band2, r.band3)
        for r in image_dhash_bands(media).collect()
    }
    assert got == {
        1: (0xFFFF, 0xFFFF, 0xFFFF, 0xFFFF),
        2: (0, 0, 0, 0),
    }


def test_dhash_pairs_brightness_copy_matches_distinct_does_not(spark):
    """The perceptual contract: a +20-gray uniform brightness copy
    hashes identically (gradients unchanged → hamming 0, flagged); a
    structurally different image (opposite gradient) is 64 bits away
    (not flagged)."""
    from sparkstreaming_rawdataingestion_spark.operators.multimodal import (
        image_dhash_pairs,
    )

    inc = [bytes(10 * i for i in range(18)) for _ in range(16)]
    bright = [bytes(10 * i + 20 for i in range(18)) for _ in range(16)]
    dec = [bytes(170 - 10 * i for i in range(18)) for _ in range(16)]
    media = _png_media(spark, {1: inc, 2: bright, 3: dec})
    got = {
        (r.media_a, r.media_b, r.hamming)
        for r in image_dhash_pairs(media).collect()
    }
    assert got == {(1, 2, 0)}


def test_dhash_rejects_non_grid_dims_and_color(spark):
    """The hash stage's contract is explicit: grayscale with dims an
    exact grid multiple — anything else must raise, not silently
    mis-hash (resampling is codec territory)."""
    from sparkstreaming_rawdataingestion_spark.operators import media_codecs
    from sparkstreaming_rawdataingestion_spark.operators.multimodal import (
        image_dhash_bands,
    )

    bad = [bytes(range(17)) for _ in range(16)]  # 17 % 9 != 0
    media = spark.createDataFrame(
        [(1, "image/png", media_codecs.png_encode(bad, color_type=0))],
        "media_id long, mime string, payload binary",
    )
    with pytest.raises(Exception, match="dHash expects"):
        image_dhash_bands(media).collect()


def test_dhash_fixture_variant3_perturbs_at_most_one_bit(spark):
    """The synthesized corpus's variant-3 corner block moves exactly
    one grid cell, so its hamming to the family scene is 0 or 1 —
    never enough to unmatch (bar is 3)."""
    from sparkstreaming_rawdataingestion_spark.operators.multimodal import (
        q_multimodal_image_dhash_pairs,
    )

    sf = "/root/testdata/sf0.001"
    df = q_multimodal_image_dhash_pairs(spark, sf)
    rows = df.collect()
    # every family of 4 yields all 6 pairs
    from sparkstreaming_rawdataingestion_spark import catalog

    n_docs = catalog.load_table(spark, sf, "documents").count()
    assert len(rows) == (n_docs // 4) * 6
    assert all(r.hamming <= 1 for r in rows)
    assert all(
        r.media_a // 4 == r.media_b // 4 for r in rows
    )  # no cross-family pair survives


# ---------------------------------------------------------------------------
# empty-segment census exclusion (round-9 review finding)
# ---------------------------------------------------------------------------


def test_missing_text_docs_do_not_fabricate_shared_lines(spark):
    """Two NULL-text docs in different sources must NOT register as
    sharing content: the empty reassembly placeholder stays out of the
    line-df census and the overlap presence sets. The NULL-text doc
    still gets its reassembly row (kept, not boilerplate), and real
    duplicated lines still count."""
    from sparkstreaming_rawdataingestion_spark.operators.dedup import (
        line_level_dedup,
        source_overlap_matrix,
    )

    docs = spark.createDataFrame(
        [
            (1, None, "s1"),
            (2, None, "s2"),
            (3, "x y", "s1"),
            (4, "x y", "s2"),
        ],
        "doc_id long, text string, source string",
    )
    # line dedup: the real duplicated line 'x y' drops (df=2); the two
    # empty placeholders are kept and never flag each other
    got = {
        r.doc_id: (r.clean_text, r.n_kept, r.n_dropped)
        for r in line_level_dedup(docs, line_words=2).collect()
    }
    assert got == {
        1: ("", 1, 0),
        2: ("", 1, 0),
        3: ("", 0, 1),
        4: ("", 0, 1),
    }
    # overlap: exactly one (s1, s2) row, from the REAL shared segment —
    # shared count 1, not 2
    rows = source_overlap_matrix(docs, line_words=2).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.source_a, r.source_b, r.shared_segments) == ("s1", "s2", 1)
    assert (r.n_segments_a, r.n_segments_b) == (1, 1)


# ---------------------------------------------------------------------------
# tokens_budget_subword
# ---------------------------------------------------------------------------


def test_subword_budget_hand_computed_admission(spark):
    """Hand-applied greedy budget in subword units (vocab: letters +
    'tab'/'le', so 'table'=2 tokens, 'go'=2, 'a'=1):

    source s1, budget 5, quality order by n_chars desc then doc_id:
      doc 2 (q=9): 'table table' = 4 tokens, cum 4, admitted (0 < 5)
      doc 1 (q=5): 'table a'     = 3 tokens, cum 7, admitted (4 < 5 —
                   the greedy overshoot rule)
      doc 3 (q=1): 'a'           = 1 token,  cum 8, REJECTED (7 >= 5)
    source s2: doc 4 alone, always admitted."""
    from sparkstreaming_rawdataingestion_spark.operators.layout import (
        subword_budget_allocation,
    )

    pieces = tuple("abcdefghijklmnopqrstuvwxyz") + ("tab", "le")
    docs = spark.createDataFrame(
        [
            (1, "table a", "s1", 5),
            (2, "table table", "s1", 9),
            (3, "a", "s1", 1),
            (4, "go go", "s2", 2),
        ],
        "doc_id long, text string, source string, n_chars int",
    )
    got = {
        r.doc_id: (r.source, r.n_tokens, r.cum_tokens)
        for r in subword_budget_allocation(
            docs, budget=5, pieces=pieces
        ).collect()
    }
    assert got == {
        2: ("s1", 4, 4),
        1: ("s1", 3, 7),
        4: ("s2", 4, 4),
    }


# ---------------------------------------------------------------------------
# decontamination_semantic_multiprobe
# ---------------------------------------------------------------------------


def test_multiprobe_catches_the_boundary_paraphrase(spark):
    """The exact probe's fixture documents a MISS: eval 3 [1.2,1.1] and
    train 5 [1.1,1.2] at cosine .9959 straddle the y=x cluster
    boundary. With probes=2 the eval member also probes its
    second-nearest centroid (cluster 1, train 5's home), so the pair
    IS flagged — and everything the exact probe found stays found
    (strict superset)."""
    from sparkstreaming_rawdataingestion_spark.operators.dedup import (
        semantic_decon_multiprobe,
        semantic_decon_pairs,
    )

    vecs = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [0.97, 0.03]),
        (3, [1.2, 1.1]),
        (4, [0.95, 0.05]),
        (5, [1.1, 1.2]),
        (6, [-1.0, 0.0]),
    ]
    e = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    exact = {
        (r.eval_id, r.train_id)
        for r in semantic_decon_pairs(
            e, k=2, eval_mod=3, threshold=0.9
        ).collect()
    }
    multi = {
        (r.eval_id, r.train_id)
        for r in semantic_decon_multiprobe(
            e, k=2, eval_mod=3, threshold=0.9, probes=2
        ).collect()
    }
    assert exact == {(0, 2), (0, 4)}
    assert multi == {(0, 2), (0, 4), (3, 5)}  # the boundary pair, caught
    assert exact < multi


# ---------------------------------------------------------------------------
# multimodal_image_dedup_clusters
# ---------------------------------------------------------------------------


def test_image_dedup_clusters_fixture_families(spark):
    """Closed form on the synthesized corpus: families are exactly
    {4f..4f+3}, so every clustered image's representative is its
    family's v=0 member and exactly one member per family is
    canonical."""
    from sparkstreaming_rawdataingestion_spark.operators.multimodal import (
        q_multimodal_image_dedup_clusters,
    )

    rows = q_multimodal_image_dedup_clusters(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    assert all(r.cluster_rep == (r.media_id // 4) * 4 for r in rows)
    assert all(r.is_canonical == (r.media_id % 4 == 0) for r in rows)
    canon = sum(1 for r in rows if r.is_canonical)
    assert canon == len(rows) // 4


# ---------------------------------------------------------------------------
# tokenizer_piece_frequencies
# ---------------------------------------------------------------------------


def test_piece_frequencies_hand_counted(spark):
    """Hand-applied census over the tiny vocab (letters + tab/le):
    doc 1 'table table a' → tab:2, le:2, a:1; doc 2 'table x9y' →
    tab:1, le:1, x:1, 9:1(UNK char), y:1. Census: tab (3 occ, 2 docs),
    le (3, 2), a (1, 1), x/9/y (1, 1)."""
    from sparkstreaming_rawdataingestion_spark.operators.text import (
        tokenizer_piece_frequencies,
    )

    pieces = tuple("abcdefghijklmnopqrstuvwxyz") + ("tab", "le")
    docs = spark.createDataFrame(
        [(1, "table table a"), (2, "table x9y")],
        "doc_id long, text string",
    )
    got = {
        r.piece: (r.n_occurrences, r.n_docs)
        for r in tokenizer_piece_frequencies(docs, pieces=pieces).collect()
    }
    assert got == {
        "tab": (3, 2),
        "le": (3, 2),
        "a": (1, 1),
        "x": (1, 1),
        "9": (1, 1),
        "y": (1, 1),
    }


# ---------------------------------------------------------------------------
# dedup_semantic_canonical
# ---------------------------------------------------------------------------


def test_semantic_canonical_is_consistent_with_pairs(spark, sf_dir):
    """Structural invariants against the pair generator it consumes:
    every clustered vec appears in >=1 pair, every cluster_rep is the
    min vec_id reachable in its component, exactly one canonical row
    per rep, and canonical rows are their own rep."""
    from sparkstreaming_rawdataingestion_spark.operators.dedup import (
        q_dedup_semantic_canonical,
        q_dedup_semantic_clusters,
    )

    labels = {
        r.vec_id: (r.cluster_rep, r.is_canonical)
        for r in q_dedup_semantic_canonical(spark, sf_dir).collect()
    }
    pairs = [
        (r.vec_a, r.vec_b)
        for r in q_dedup_semantic_clusters(spark, sf_dir).collect()
    ]
    in_pairs = {v for p in pairs for v in p}
    assert set(labels) == in_pairs
    # both endpoints of every pair share a representative
    for a, b in pairs:
        assert labels[a][0] == labels[b][0]
    # rep is the component min and is canonical exactly once
    reps = {rep for rep, _ in labels.values()}
    for rep in reps:
        members = [v for v, (r, _) in labels.items() if r == rep]
        assert rep == min(members)
    canon = [v for v, (r, c) in labels.items() if c]
    assert sorted(canon) == sorted(reps)


def test_semantic_canonical_known_families(spark):
    """Closed-form families (the decon geometry, k=2 seeds [1,0]/[0,1],
    threshold 0.9): cluster-0 clique {0, 2, 4} → rep 0; cluster-1 pair
    {1, 5} → rep 1; vec 6 [-1,0] pairs with nothing and is absent.
    An over-merging components regression (e.g. global-min labeling)
    would collapse the two reps and fail here — the structural test
    above cannot see that."""
    from sparkstreaming_rawdataingestion_spark.operators.dedup import (
        connected_components,
        semantic_cluster_pairs,
    )
    from pyspark.sql import functions as F

    vecs = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [0.97, 0.03]),
        (4, [0.95, 0.05]),
        (5, [0.02, 1.0]),
        (6, [-1.0, 0.0]),
    ]
    e = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    pairs = semantic_cluster_pairs(e, k=2, threshold=0.9).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    got = {
        r.node: (r.label, r.label == r.node)
        for r in connected_components(pairs).collect()
    }
    assert got == {
        0: (0, True),
        2: (0, False),
        4: (0, False),
        1: (1, True),
        5: (1, False),
    }
