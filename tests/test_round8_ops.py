"""Round-8 additions: ADVICE r7 regressions (drain_progress ring-buffer
accounting) and closed-form fixtures for the round's new operators."""

from __future__ import annotations


class _RingBufferQuery:
    """Stub StreamingQuery whose recentProgress mimics Spark's ~100-event
    ring buffer: the data-bearing early batches are EVICTED by a flood of
    empty-batch progress events, so any naive sum over the live buffer
    permanently undercounts."""

    def __init__(self):
        self.polls = 0

    @property
    def recentProgress(self):
        self.polls += 1
        if self.polls == 1:
            # first poll: the two data-bearing batches are still visible
            return [
                {"batchId": 0, "numInputRows": 600},
                {"batchId": 1, "numInputRows": 400},
            ]
        # afterwards: ring buffer holds only empty keep-alive batches
        return [
            {"batchId": i, "numInputRows": 0} for i in range(2, 102)
        ]


def test_drain_progress_survives_ring_buffer_eviction():
    """ADVICE r7: cumulative consumed rows must accumulate ACROSS polls
    (each batchId counted once), not be re-summed over the live ring
    buffer — otherwise eviction of early data-bearing events makes the
    helper spin to timeout and return an incomplete event list."""
    from sparkstreaming_rawdataingestion_spark.streaming.ingest_stream import (
        drain_progress,
    )

    q = _RingBufferQuery()
    events = drain_progress(q, n_messages=1000, timeout_s=10.0)
    # both data-bearing batches retained even after eviction, in order
    assert [e["batchId"] for e in events] == [0, 1]
    assert sum(e["numInputRows"] for e in events) == 1000
    # and it did NOT spin to the timeout: the second poll already sees
    # the cumulative 1000 (first poll folds both batches in)
    assert q.polls <= 3


def test_drain_progress_counts_each_batch_once():
    """A batch reappearing across polls (normal: the buffer is a window)
    must not double-count its rows."""
    from sparkstreaming_rawdataingestion_spark.streaming.ingest_stream import (
        drain_progress,
    )

    class _StableQuery:
        polls = 0

        @property
        def recentProgress(self):
            type(self).polls += 1
            return [
                {"batchId": 0, "numInputRows": 300},
                {"batchId": 1, "numInputRows": 300},
            ]

    # 600 total available; asking for 700 must time out (not reach it by
    # double-counting batch 0/1 on the second poll)
    events = drain_progress(_StableQuery(), n_messages=700, timeout_s=2.0)
    assert sum(e["numInputRows"] for e in events) == 600


# ---------------------------------------------------------------------------
# dedup_semantic_clusters (SemDeDup) — closed-form fixture
# ---------------------------------------------------------------------------


def test_semantic_dedup_closed_form(spark):
    """Hand-built geometry: centroid seeds are the axis vectors e0/e1
    (k=2), and the seeds are corpus members themselves (the registered
    semantics: centroids = vec_id < k). vec 2 = 10*e0 (cluster 0),
    vec 3 ≈ e0 slightly perturbed (cluster 0, cosine ≈ 0.9999), vec 4 =
    e1 (cluster 1, orthogonal to everything in cluster 0). Surviving
    pairs are exactly the within-cluster near-parallel ones — (0,2),
    (0,3), (2,3) in cluster 0 and (1,4) in cluster 1 — and NEVER a
    cross-cluster pair, even though e.g. cos(2, 4) is well-defined."""
    from sparkstreaming_rawdataingestion_spark.operators.dedup import (
        semantic_cluster_pairs,
    )

    rows = [
        (0, [1.0, 0.0, 0.0]),          # centroid seed 0
        (1, [0.0, 1.0, 0.0]),          # centroid seed 1
        (2, [10.0, 0.0, 0.0]),         # cluster 0
        (3, [1.0, 0.014, 0.0]),        # cluster 0, near-dup of 2
        (4, [0.0, 1.0, 0.0]),          # cluster 1, orthogonal
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r.cluster_id, r.vec_a, r.vec_b): r.cosine_sim
        for r in semantic_cluster_pairs(e, k=2, threshold=0.9).collect()
    }
    # cos(2,3) = 10 / (10 * sqrt(1 + 0.014^2)) = 0.999902...
    assert set(got) == {(0, 0, 2), (0, 0, 3), (0, 2, 3), (1, 1, 4)}
    assert got[(0, 0, 2)] == 1.0
    assert got[(1, 1, 4)] == 1.0
    assert abs(got[(0, 2, 3)] - 0.999902) < 1e-6
    assert abs(got[(0, 0, 3)] - 0.999902) < 1e-6


def test_semantic_dedup_assignment_is_nearest_centroid(spark):
    """The composition must use the SAME deterministic assignment as
    kmeans_one_step: a vector between the two seeds but nearer seed 1
    lands in cluster 1, so it can NOT pair with a near-parallel vector
    assigned to cluster 0 (the SemDeDup scope contract)."""
    from sparkstreaming_rawdataingestion_spark.operators.dedup import (
        semantic_cluster_pairs,
    )

    rows = [
        (0, [1.0, 0.0]),    # seed 0
        (1, [0.0, 1.0]),    # seed 1
        (2, [0.4, 0.6]),    # nearer seed 1 -> cluster 1
        (3, [0.45, 0.55]),  # nearer seed 1 -> cluster 1; cosine(2,3)~0.999
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = semantic_cluster_pairs(e, k=2, threshold=0.99).collect()
    assert {(r.cluster_id, r.vec_a, r.vec_b) for r in got} == {(1, 2, 3)}


# ---------------------------------------------------------------------------
# quality_classifier_score — closed-form fixture (hand weights, 2 docs)
# ---------------------------------------------------------------------------


def test_quality_classifier_closed_form(spark):
    """Hand-computed logits. Token hashes (31-poly mod 2^32, the
    feature_hash_embedding fold): 'a' -> 97 -> dim 97%16=1, sign
    (97//16)%2=0 -> +1; 'b' -> 98 -> dim 2, +1. So "a a b" has sparse
    features {dim1: 2, dim2: 1} and "b b b" has {dim2: 3}. With hand
    weights w1=0.5, w2=0.25, bias=-0.1:
      doc 1: 0.5*2 + 0.25*1 - 0.1 = 1.15  (keep)
      doc 2: 0.25*3 - 0.1      = 0.65  (keep)
    and with w2=-0.25: doc 2 = -0.85 (drop) while doc 1 = 0.65 (keep).
    """
    from sparkstreaming_rawdataingestion_spark.operators.text import (
        quality_classifier_score,
    )

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b b b")], "doc_id long, text string"
    )
    w = ["0"] * 16
    w[1], w[2] = "0.5", "0.25"
    got = {
        r.doc_id: (r.logit, r.keep)
        for r in quality_classifier_score(
            docs, weights=tuple(w), bias="-0.1"
        ).collect()
    }
    assert got == {1: (1.15, True), 2: (0.65, True)}

    w[2] = "-0.25"
    got = {
        r.doc_id: (r.logit, r.keep)
        for r in quality_classifier_score(
            docs, weights=tuple(w), bias="-0.1"
        ).collect()
    }
    assert got == {1: (0.65, True), 2: (-0.85, False)}


def test_curation_classifier_gate_parity(spark):
    """The classified pipeline's stage algebra: its survivors are
    exactly the standard qual_kept docs that the classifier keeps, run
    through the same dedup stages — verified by recomputing the gate
    from the two public kernels on the fixture corpus."""
    from sparkstreaming_rawdataingestion_spark.operators import pipeline
    from sparkstreaming_rawdataingestion_spark.operators.text import (
        quality_classifier_score,
    )
    from sparkstreaming_rawdataingestion_spark import catalog
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    plain = {
        r.doc_id
        for r in pipeline.q_pipeline_curation(spark, sf).collect()
    }
    classified = {
        r.doc_id
        for r in pipeline.q_pipeline_curation_classified(spark, sf).collect()
    }
    clf_keep = {
        r.doc_id
        for r in quality_classifier_score(
            catalog.load_table(spark, sf, "documents")
        )
        .where(F.col("keep"))
        .collect()
    }
    # the gate only removes docs (never adds), every classified survivor
    # is classifier-kept, and the gate actually binds on the fixture
    assert classified <= clf_keep
    assert classified != plain, "fixture must exercise the gate"

    # full independent recomputation of the classified chain with
    # DIFFERENT spellings (min-per-digest groupBy instead of the
    # pipeline's row_number window; set algebra for the gate): a
    # misplaced gate (e.g. applied AFTER exact dedup, changing which
    # near-dup representative survives) fails this equality
    from sparkstreaming_rawdataingestion_spark.operators.dedup import (
        count_verified_pairs,
    )
    from sparkstreaming_rawdataingestion_spark.operators.pipeline import (
        QUALITY_MIN,
        _shingles,
        score_documents,
    )

    docs = catalog.load_table(spark, sf, "documents")
    scored = score_documents(docs)
    gated = (
        scored.where(F.col("predicted_lang") == "en")
        .where(F.col("quality_score") >= QUALITY_MIN)
        .where(F.col("doc_id").isin(list(clf_keep)))
    )
    keepers = {
        r.keep_id
        for r in gated.groupBy(F.sha2("text", 256))
        .agg(F.min("doc_id").alias("keep_id"))
        .collect()
    }
    kept = gated.where(F.col("doc_id").isin(list(keepers)))
    near_dropped = {
        r.doc_b
        for r in count_verified_pairs(
            kept.select("doc_id", _shingles().alias("shingles"))
        ).collect()
    }
    assert classified == keepers - near_dropped


# ---------------------------------------------------------------------------
# dedup_line_level — closed-form fixture (shared header corpus)
# ---------------------------------------------------------------------------


def test_line_level_dedup_closed_form(spark):
    """Four docs, 12-word segment lines, max_line_df=1. Docs 1/2/4 share
    the identical 12-word header H (df=3 -> dropped everywhere); each
    tail is unique (kept). Doc 3 shares nothing (all lines kept). Doc 4
    is ONLY the header -> reassembles to the empty string but survives
    as a row with its drop count."""
    from sparkstreaming_rawdataingestion_spark.operators.dedup import (
        line_level_dedup,
    )

    H = " ".join(f"h{i}" for i in range(12))
    t1 = "alpha beta gamma delta epsilon"
    t2 = "zeta eta theta"
    d3 = " ".join(f"u{i}" for i in range(15))
    docs = spark.createDataFrame(
        [(1, f"{H} {t1}"), (2, f"{H} {t2}"), (3, d3), (4, H)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.clean_text, r.n_kept, r.n_dropped)
        for r in line_level_dedup(docs).collect()
    }
    assert got == {
        1: (t1, 1, 1),
        2: (t2, 1, 1),
        3: (d3, 2, 0),
        4: ("", 0, 1),
    }


def test_line_level_dedup_threshold_and_reassembly_order(spark):
    """max_line_df=2 keeps a line shared by exactly two docs; surviving
    lines must reassemble in original order even when a MIDDLE line is
    dropped."""
    from sparkstreaming_rawdataingestion_spark.operators.dedup import (
        line_level_dedup,
    )

    A = " ".join(f"a{i}" for i in range(12))   # in docs 1+2 (df=2)
    B = " ".join(f"b{i}" for i in range(12))   # in all three (df=3)
    C1 = " ".join(f"c{i}" for i in range(12))  # unique
    docs = spark.createDataFrame(
        [
            (1, f"{A} {B} {C1}"),  # middle line B drops, A+C1 keep
            (2, f"{A} {B}"),
            (3, B),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.clean_text, r.n_kept, r.n_dropped)
        for r in line_level_dedup(docs, max_line_df=2).collect()
    }
    assert got[1] == (f"{A} {C1}", 2, 1)
    assert got[2] == (A, 1, 1)
    assert got[3] == ("", 0, 1)


# ---------------------------------------------------------------------------
# dsir_importance_weights — closed-form fixture
# ---------------------------------------------------------------------------


def test_dsir_importance_weights_closed_form(spark):
    """Hand-computed DSIR log weights on a 3-doc corpus. Target (src0):
    "x x y" -> ct = {x:2, y:1}, nt=3. Raw: "x y" and "z z" -> cr =
    {x:1, y:1, z:2}, nr=4. vocab=3. Laplace-smoothed log ratios:
      lr(x) = ln(3/6) - ln(2/7);  lr(y) = ln(2/6) - ln(2/7)
      lr(z) = ln(1/6) - ln(3/7)
    each rounded to 9 dp before the per-doc sum (the DECIMAL(18,9)
    accumulation discipline)."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from sparkstreaming_rawdataingestion_spark.operators.mining import (
        dsir_importance_weights,
    )

    docs = spark.createDataFrame(
        [(0, "x x y", "src0"), (1, "x y", "web"), (2, "z z", "web")],
        "doc_id long, text string, source string",
    )

    def q(x, places):  # exact decimal half-away rounding, both engines'
        return Decimal(x).quantize(Decimal(f"1e-{places}"), ROUND_HALF_UP)

    lr = {
        "x": q(repr(math.log(3 / 6) - math.log(2 / 7)), 9),
        "y": q(repr(math.log(2 / 6) - math.log(2 / 7)), 9),
        "z": q(repr(math.log(1 / 6) - math.log(3 / 7)), 9),
    }
    want = {
        1: (float(q(lr["x"] + lr["y"], 6)), 2),
        2: (float(q(2 * lr["z"], 6)), 2),
    }
    got = {
        r.doc_id: (r.log_weight, r.n_tokens)
        for r in dsir_importance_weights(docs, "src0").collect()
    }
    assert got == want
    # directionally: the target-like doc must outscore the off-domain one
    assert got[1][0] > got[2][0]


# ---------------------------------------------------------------------------
# pii_redact_text — the scrub agrees with its audit
# ---------------------------------------------------------------------------


def test_pii_redact_text_matches_audit_counts(spark):
    """The redaction pass and the audit share PII_DIGIT_RUN: summing the
    transform's per-row n_redacted per event_type must equal the
    audit's n_matches, and no digit run may survive the scrub."""
    from pyspark.sql import functions as F

    from sparkstreaming_rawdataingestion_spark.operators.validation import (
        q_pii_redact_text,
        q_pii_redaction_stats,
    )

    sf = "/root/testdata/sf0.001"
    red = q_pii_redact_text(spark, sf)
    audit = {
        r.event_type: r.n_matches
        for r in q_pii_redaction_stats(spark, sf).collect()
    }
    per_type = {
        r.event_type: r.total
        for r in red.groupBy("event_type")
        .agg(F.sum("n_redacted").alias("total"))
        .collect()
    }
    assert per_type == audit
    survivors = red.where(
        F.col("props_redacted").rlike("[0-9]")
    ).count()
    assert survivors == 0


def test_pii_redact_text_closed_form(spark):
    from sparkstreaming_rawdataingestion_spark.operators.validation import (
        PII_DIGIT_RUN,
        PII_REDACTION_TOKEN,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, '{"acct": 1234567, "note": "call 555 then 9"}')],
        "event_id long, props string",
    )
    row = df.select(
        F.regexp_replace("props", PII_DIGIT_RUN, PII_REDACTION_TOKEN).alias(
            "r"
        ),
        F.regexp_count("props", F.lit(PII_DIGIT_RUN)).alias("n"),
    ).collect()[0]
    assert row.r == '{"acct": <NUM>, "note": "call <NUM> then <NUM>"}'
    assert row.n == 3


# ---------------------------------------------------------------------------
# ccnet_perplexity_buckets — closed-form fixture
# ---------------------------------------------------------------------------


def test_ccnet_perplexity_buckets_closed_form(spark):
    """Hand-computed terciles on a 4-doc corpus (sample_pct=100 so the
    cutpoints are exact). Corpus LM over ALL docs: freq a=4 b=2 c=2,
    n_total=8, lp(a)=ln(1/2), lp(b)=lp(c)=ln(1/4), each rounded 9 dp.
    en scores: d0=-0.693147 > d1=-1.039721 > d2=-1.386294 with n=3 →
    cut_head=rank-1 score, cut_middle=rank-2 score → head/middle/tail.
    fr has one doc: both cuts equal its own score → head."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from sparkstreaming_rawdataingestion_spark.operators.mining import (
        ccnet_perplexity_buckets,
    )

    docs = spark.createDataFrame(
        [
            (0, "a a a", "en"),
            (1, "a b", "en"),
            (2, "b c", "en"),
            (3, "c", "fr"),
        ],
        "doc_id long, text string, lang string",
    )

    def q(x, places):
        return Decimal(x).quantize(Decimal(f"1e-{places}"), ROUND_HALF_UP)

    lp_a = q(repr(math.log(4 / 8)), 9)
    lp_b = q(repr(math.log(2 / 8)), 9)
    want = {
        0: (float(q(repr(float(3 * lp_a) / 3), 6)), "head"),
        1: (float(q(repr(float(lp_a + lp_b) / 2), 6)), "middle"),
        2: (float(q(repr(float(2 * lp_b) / 2), 6)), "tail"),
        3: (float(q(repr(float(lp_b) / 1), 6)), "head"),
    }
    got = {
        r.doc_id: (r.avg_logprob, r.bucket)
        for r in ccnet_perplexity_buckets(docs, sample_pct=100).collect()
    }
    assert got == want


def test_ccnet_buckets_unsampled_lang_falls_to_tail(spark):
    """A language with NO sampled docs has NULL cutpoints — every doc
    of that language lands in 'tail' deterministically (the CASE's
    else branch), never in an engine-dependent null bucket."""
    from pyspark.sql import functions as F

    from sparkstreaming_rawdataingestion_spark.operators.mining import (
        ccnet_perplexity_buckets,
    )

    docs = spark.createDataFrame(
        [(7, "a b c", "xx"), (8, "a", "xx")],
        "doc_id long, text string, lang string",
    )
    got = ccnet_perplexity_buckets(docs, sample_pct=0)
    assert [r.bucket for r in got.collect()] == ["tail", "tail"]
    assert got.where(F.col("bucket").isNull()).count() == 0


# ---------------------------------------------------------------------------
# source_overlap_matrix — closed-form fixture
# ---------------------------------------------------------------------------


def test_source_overlap_matrix_closed_form(spark):
    """3 sources with controlled 2-word segments (line_words=2):
    s1 = {AB, CD}, s2 = {AB, EF}, s3 = {GH}. Only (s1,s2) overlaps:
    shared=1, totals 2 and 2, jaccard 1/(2+2-1) = 0.333333. s3 pairs
    with nobody and must be absent. Duplicate segments WITHIN a source
    count once (distinct (source, digest) presence)."""
    from sparkstreaming_rawdataingestion_spark.operators.dedup import (
        source_overlap_matrix,
    )

    docs = spark.createDataFrame(
        [
            (0, "A B C D", "s1"),
            (1, "A B E F", "s2"),
            (2, "A B", "s2"),       # repeat of AB inside s2: counts once
            (3, "G H", "s3"),
        ],
        "doc_id long, text string, source string",
    )
    rows = source_overlap_matrix(docs, line_words=2).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.source_a, r.source_b) == ("s1", "s2")
    assert (r.shared_segments, r.n_segments_a, r.n_segments_b) == (1, 2, 2)
    assert r.seg_jaccard == 0.333333


# ---------------------------------------------------------------------------
# embedding int8 quantization — closed-form fixture
# ---------------------------------------------------------------------------


def test_embedding_int8_closed_form(spark):
    """Hand-quantized vector [1.0, -0.5, 0.25, 0.0] (amax=1, scale=127):
    codes floor(x*127+0.5) = [127, -63, 32, 0]; errors
    [0, -0.5+63/127, 0.25-32/127, 0]. A zero vector quantizes to zero
    codes, NULL scale, zero error (never an ANSI divide crash)."""
    from decimal import ROUND_HALF_UP, Decimal

    from sparkstreaming_rawdataingestion_spark.operators.similarity import (
        embedding_int8_quantize,
        embedding_int8_report,
    )

    e = spark.createDataFrame(
        [(0, [1.0, -0.5, 0.25, 0.0]), (1, [0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    codes = {
        r.vec_id: (r.codes, r.amax)
        for r in embedding_int8_quantize(e).collect()
    }
    assert codes == {0: ([127, -63, 32, 0], 1.0), 1: ([0, 0, 0, 0], 0.0)}

    errs = [0.0, -0.5 + 63 / 127, 0.25 - 32 / 127, 0.0]

    def q6(x):  # str() round-trips floats AND Decimals
        return float(
            Decimal(str(x)).quantize(Decimal("1e-6"), ROUND_HALF_UP)
        )

    mse_ppm = q6(sum(Decimal(repr(er * er)) for er in errs) / 4 * 10**6)
    max_ppm = q6(max(abs(er) for er in errs) * 1e6)
    got = {
        r.vec_id: (r.n_dims, r.scale, r.mse_ppm, r.max_abs_err_ppm)
        for r in embedding_int8_report(e).collect()
    }
    assert got[0] == (4, 127.0, mse_ppm, max_ppm)
    assert got[1] == (4, None, 0.0, 0.0)


# ---------------------------------------------------------------------------
# eval_pass_at_k — closed-form fixture
# ---------------------------------------------------------------------------


def test_eval_pass_at_k_closed_form(spark):
    """Hand-computed estimator: task A has n=5, c=2 →
    pass@1 = c/n = 0.4; pass@3 = 1 - (3/5)(2/4)(1/3) = 0.9.
    Task B has n=5, c=4 → n-c=1 < 3, the fold hits a zero factor and
    pass@3 = 1.0 exactly (the estimator's boundary: any 3-subset must
    contain a correct sample). Task C (n=2) is filtered by
    min_samples."""
    from sparkstreaming_rawdataingestion_spark.operators.evaluation import (
        eval_pass_at_k,
    )

    rows = [(u, t) for u, kinds in
            [(1, "ppxxx"), (2, "ppppx"), (3, "px")]
            for t in kinds]
    ev = spark.createDataFrame(
        [(u, "purchase" if t == "p" else "view") for u, t in rows],
        "user_id long, event_type string",
    )
    got = {
        r.task_id: (r.n_samples, r.n_correct, r.pass_at_1, r.pass_at_3)
        for r in eval_pass_at_k(ev, ks=(1, 3), min_samples=5).collect()
    }
    assert got == {1: (5, 2, 0.4, 0.9), 2: (5, 4, 0.8, 1.0)}


# ---------------------------------------------------------------------------
# dedup_incremental_census — closed-form fixture
# ---------------------------------------------------------------------------


def test_incremental_census_closed_form(spark):
    """Ingest order s1 < s2. s1 = {X, X, Y}: nothing earlier, X+Y novel,
    one extra X copy. s2 = {X, Z, Z}: X duplicates the archive, Z is
    novel with one extra copy. Per-source conservation law holds:
    n_docs = dup_of_earlier + novel_unique + dup_within."""
    from sparkstreaming_rawdataingestion_spark.operators.dedup import (
        incremental_census,
    )

    docs = spark.createDataFrame(
        [
            (0, "X", "s1"), (1, "X", "s1"), (2, "Y", "s1"),
            (3, "X", "s2"), (4, "Z", "s2"), (5, "Z", "s2"),
        ],
        "doc_id long, text string, source string",
    )
    got = {
        r.source: (
            r.n_docs, r.n_dup_of_earlier, r.n_novel_unique, r.n_dup_within
        )
        for r in incremental_census(docs).collect()
    }
    assert got == {"s1": (3, 0, 2, 1), "s2": (3, 1, 1, 1)}
    for n, de, nu, dw in got.values():
        assert n == de + nu + dw


def test_incremental_census_null_text_not_dropped(spark):
    """NULL-text docs have a NULL digest; the first-seen join is
    null-safe so they stay in the census and n_docs keeps agreeing with
    the per-source row count (two NULL docs across two sources form one
    digest class: first source novel, second a dup of earlier)."""
    from sparkstreaming_rawdataingestion_spark.operators.dedup import (
        incremental_census,
    )

    docs = spark.createDataFrame(
        [(0, None, "s1"), (1, "X", "s1"), (2, None, "s2")],
        "doc_id long, text string, source string",
    )
    got = {
        r.source: (
            r.n_docs, r.n_dup_of_earlier, r.n_novel_unique, r.n_dup_within
        )
        for r in incremental_census(docs).collect()
    }
    assert got == {"s1": (2, 0, 2, 0), "s2": (1, 1, 0, 0)}


def test_pass_at_k_floor_rises_to_max_k(spark):
    """ks above min_samples must raise the effective sample floor, not
    divide by zero: with ks=(20,) and min_samples=10, a task with n=10
    is filtered out instead of evaluating a 0 denominator."""
    from sparkstreaming_rawdataingestion_spark.operators.evaluation import (
        eval_pass_at_k,
    )

    ev = spark.createDataFrame(
        [(1, "purchase")] * 4 + [(1, "view")] * 6,
        "user_id long, event_type string",
    )
    assert eval_pass_at_k(ev, ks=(20,), min_samples=10).count() == 0


def test_pass_at_k_oracle_shares_the_engine_floor():
    """ADVICE r8: the oracle's WHERE floor must be the engine kernel's
    effective floor max(min_samples, max(ks)) — raising any k in
    PASS_AT_KS above PASS_MIN_SAMPLES must move BOTH sides together
    (the old f-string used the raw constant and would have divided by
    zero for tasks with n < k)."""
    from sparkstreaming_rawdataingestion_spark.operators.evaluation import (
        PASS_AT_KS,
        PASS_MIN_SAMPLES,
        _PASS_ORACLE,
    )

    floor = max(PASS_MIN_SAMPLES, max(PASS_AT_KS))
    assert f"WHERE n >= {floor}" in _PASS_ORACLE


def test_classifier_rejects_partial_weight_tables(spark):
    """ADVICE r8: a weights tuple shorter than the hash-dim count would
    make documents whose features all hash to uncovered dims vanish
    from the inner join — the kernel must refuse it loudly."""
    import pytest

    from sparkstreaming_rawdataingestion_spark.operators.text import (
        quality_classifier_score,
    )

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="hash dims"):
        quality_classifier_score(docs, weights=("0.5",), bias="0")


def test_segment_lines_null_text_yields_empty_segment(spark):
    """ADVICE r8: NULL text is coalesced to '' before segmentation so
    the doc keeps a reassembly row (consistent with the census's
    NULL-text accounting) instead of vanishing — and no phantom
    [0, -1] sequence can appear under legacy sizeOfNull semantics."""
    from sparkstreaming_rawdataingestion_spark.operators.dedup import (
        segment_lines,
    )

    docs = spark.createDataFrame(
        [(1, None), (2, "a b")], "doc_id long, text string"
    )
    rows = sorted(
        (r.doc_id, r.line_no, r.line)
        for r in segment_lines(docs, ("doc_id",), line_words=2).collect()
    )
    assert rows == [(1, 0, ""), (2, 0, "a b")]


def test_classified_oracle_anchor_check_is_not_an_assert(monkeypatch):
    """ADVICE r8: the template-anchor guard must survive ``python -O``
    — a drifted _ORACLE_STAGES raises RuntimeError instead of letting
    replace() silently no-op the classifier stage away."""
    import pytest

    from sparkstreaming_rawdataingestion_spark.operators import pipeline

    monkeypatch.setattr(pipeline, "_ORACLE_STAGES", "WITH drifted AS ()")
    with pytest.raises(RuntimeError, match="drifted"):
        pipeline._classified_stages_sql()
