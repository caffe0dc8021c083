"""Property tests for the dedup / similarity / text / multimodal packs
(value-exactness is covered by the DuckDB oracle gate; these pin the
approximate operators' quality and the stub plumbing)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkstreaming_rawdataingestion_spark.operators import (
    dedup,
    multimodal,
    similarity,
    text,
)

SF01 = "/root/testdata/sf0.01"


def _pairs(df):
    return {(r["doc_a"], r["doc_b"]) for r in df.select("doc_a", "doc_b").collect()}


@pytest.fixture(scope="module")
def exact_pairs(spark):
    return _pairs(dedup.q_dedup_ngram_jaccard_pairs(spark, SF01))


def test_minhash_lsh_recall_and_precision(spark, exact_pairs):
    """Banded MinHash (16×4) at τ=0.8 must find every exact pair on the
    fixture (P(miss) ≈ 2e-4 per pair) and — being exact-verified — must
    emit nothing else."""
    lsh = _pairs(dedup.q_dedup_minhash_lsh_pairs(spark, SF01))
    assert lsh == exact_pairs


def test_simhash_near_dups_have_small_hamming(spark, exact_pairs):
    sigs = {
        r["doc_id"]: r["simhash"]
        for r in dedup.simhash_signatures(spark, SF01).collect()
    }
    assert len(sigs) == 500
    # exact near-dups (J≥0.8) should sit well below the random-pair
    # expectation of 32 differing bits
    for a, b in list(exact_pairs)[:10]:
        hamming = bin((sigs[a] ^ sigs[b]) & (1 << 64) - 1).count("1")
        assert hamming <= 16, f"near-dup pair ({a},{b}) hamming={hamming}"


def test_identical_text_identical_signatures(spark, sf_dir):
    from sparkstreaming_rawdataingestion_spark import catalog

    d = catalog.load_table(spark, SF01, "documents").limit(50)
    doubled = d.unionAll(d)
    doubled.createOrReplaceTempView("documents_doubled")
    # same text → same simhash: signature count collapses to 50
    sigs = (
        d.select("doc_id", "text")
        .unionAll(d.select((F.col("doc_id") + 10000).alias("doc_id"), "text"))
    )
    # route through the same tokenize+hash pipeline via a temp swap
    tok = sigs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).select("doc_id", F.xxhash64("tok").alias("h"))
    votes = tok.groupBy("doc_id").agg(
        F.sum(F.when(F.shiftright("h", 0).bitwiseAND(1) == 1, 1).otherwise(-1)).alias(
            "v0"
        )
    )
    v = {r["doc_id"]: r["v0"] for r in votes.collect()}
    for i in v:
        if i >= 10000:
            assert v[i] == v[i - 10000]


def test_lsh_topk_recall(spark):
    exact = similarity.q_similarity_topk_bruteforce(spark, SF01).collect()
    approx = similarity.q_similarity_topk_lsh(spark, SF01).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.6, f"LSH top-k recall too low: {recall:.2f}"
    # every LSH hit must carry the exact cosine (no score drift)
    exact_scores = {
        (r["query_id"], r["neighbor_id"]): r["cosine_sim"] for r in exact
    }
    for r in approx:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_scores:
            assert abs(r["cosine_sim"] - exact_scores[key]) < 1e-9


def test_ivf_topk_recall(spark):
    """Recall at the default nprobe, and the nprobe dial: probing more
    inverted lists buys recall linearly in scan cost. The fixture
    embeddings are near-orthogonal random vectors (no real cluster
    structure — max pairwise cosine ≈ 0.51), which is the worst case for
    any coarse quantizer; real embedding corpora cluster far better."""
    exact = similarity.q_similarity_topk_bruteforce(spark, SF01).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}

    ivf = similarity.q_similarity_topk_ivf(spark, SF01).collect()
    ivf_set = {(r["query_id"], r["neighbor_id"]) for r in ivf}
    assert len(ivf) == len(exact)  # full k returned per query
    recall = len(exact_set & ivf_set) / len(exact_set)
    assert recall >= 0.8, f"IVF top-k recall too low: {recall:.2f}"

    old = similarity.IVF_NPROBE
    try:
        similarity.IVF_NPROBE = 6
        ivf6 = similarity.q_similarity_topk_ivf(spark, SF01).collect()
    finally:
        similarity.IVF_NPROBE = old
    ivf6_set = {(r["query_id"], r["neighbor_id"]) for r in ivf6}
    recall6 = len(exact_set & ivf6_set) / len(exact_set)
    assert recall6 >= 0.9, f"IVF nprobe=6 recall too low: {recall6:.2f}"
    assert recall6 >= recall


def test_multimodal_frame_sampling_fanout(spark):
    media = multimodal.documents_as_media(spark, SF01)
    frames = multimodal.sample_frames(media, every_n_bytes=100)
    n_media = media.count()
    assert frames.count() >= n_media  # ≥1 frame per payload
    offs = frames.where(F.col("media_id") == 0).select("byte_offset").collect()
    assert [r["byte_offset"] for r in offs] == [i * 100 for i in range(len(offs))]


def test_quality_score_bounds(spark):
    q = text.q_text_quality_score(spark, SF01)
    mm = q.agg(
        F.min("quality_score").alias("lo"), F.max("quality_score").alias("hi")
    ).first()
    assert 0.0 <= mm["lo"] <= mm["hi"] <= 1.0


def test_token_stats_agree_with_stored_metadata(spark):
    """Cross-check against the fixture's own n_chars column: the measured
    character count must equal the stored metadata for every document."""
    from sparkstreaming_rawdataingestion_spark import catalog

    d = catalog.load_table(spark, SF01, "documents")
    stats = text.q_text_token_stats(spark, SF01)
    joined = d.select("doc_id", "n_chars").join(stats, "doc_id")
    mismatches = joined.where(
        F.col("n_chars") != F.col("n_chars_measured")
    ).count()
    assert mismatches == 0


def test_pq_topk_recall_and_fidelity(spark):
    """PQ ADC shortlist + exact re-rank: recall@10 vs brute force on the
    near-orthogonal fixture (PQ's hard case — reconstruction cosine
    ≈ 0.65) must clear 0.9 at the documented shortlist; the
    reconstruction report's corpus stats must sit in sane ranges and
    the code alphabet must be the declared 4-bit one."""
    from sparkstreaming_rawdataingestion_spark.operators import similarity

    exact = similarity.QUERIES["similarity_topk_bruteforce"](spark, SF01)
    pq = similarity.QUERIES["similarity_topk_pq"](spark, SF01)
    exact_set = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    pq_set = {(r.query_id, r.neighbor_id) for r in pq.collect()}
    recall = len(exact_set & pq_set) / len(exact_set)
    assert recall >= 0.9, f"PQ top-k recall too low: {recall:.2f}"

    rep = similarity.QUERIES["pq_reconstruction_report"](spark, SF01).first()
    assert rep.n_vectors == 500
    assert 0.0 < rep.min_recon_cos <= rep.mean_recon_cos < 1.0
    assert rep.mean_sq_err > 0.0

    from pyspark.sql import functions as F

    from sparkstreaming_rawdataingestion_spark import catalog

    e = catalog.load_table(spark, SF01, "embeddings")
    corpus = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").cast("array<double>").alias("v_emb"),
    )
    books = similarity.pq_codebooks(corpus)
    codes = similarity.pq_encode(
        similarity._subvectors(corpus, "neighbor_id", "v_emb"), books
    )
    stats = codes.agg(
        F.min("code"), F.max("code"), F.count(F.lit(1))
    ).first()
    assert stats[0] >= 1 and stats[1] <= similarity.PQ_K
    assert stats[2] == 500 * similarity.PQ_M  # one code per subspace


def test_feature_hash_embedding_matches_hand_fold(spark, tmp_path):
    """The char-fold hash, dimension pick and sign must equal the
    documented integer algebra exactly; duplicate tokens accumulate."""
    from pyspark.sql import functions as F

    from sparkstreaming_rawdataingestion_spark.operators import text as t

    docs = [(1, "ab ab ba", "en", "s", 8)]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))

    def fold(tok):
        h = 0
        for c in tok:
            h = (h * 31 + ord(c)) % t._FHASH_MOD
        return h

    expect = {}
    for tok in ("ab", "ab", "ba"):
        h = fold(tok)
        dim = h % t._FHASH_DIMS
        sign = 1 if (h // t._FHASH_DIMS) % 2 == 0 else -1
        expect[dim] = expect.get(dim, 0) + sign
    got = {
        r.dim: r.weight
        for r in t.q_feature_hash_embedding(spark, str(tmp_path)).collect()
    }
    assert got == expect
    assert all(0 <= d < t._FHASH_DIMS for d in got)


def test_mg_heavy_hitters_bounds_and_guarantee(spark, tmp_path):
    """Misra-Gries invariants: est ≤ true ≤ est + max_undercount on the
    fixture corpus, and on a skewed corpus every item above the n/(k+1)
    frequency floor is reported (with the dominant item ranked first)."""
    from pyspark.sql import functions as F

    from sparkstreaming_rawdataingestion_spark import catalog
    from sparkstreaming_rawdataingestion_spark.operators import stats

    got = stats.QUERIES["sketch_heavy_hitters"](spark, SF01).collect()
    assert got
    bound = got[0].max_undercount
    d = catalog.load_table(spark, SF01, "documents")
    exact = {
        r.tok: r.c
        for r in d.select(
            F.explode(F.split("text", " ")).alias("tok")
        )
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    n = sum(exact.values())
    assert bound <= n / (stats.MG_K + 1) + len(got)  # per-partition sums
    for r in got:
        assert r.est_count <= exact[r.tok] <= r.est_count + bound

    # skewed corpus: 'hot' is 50% of tokens → guaranteed present and top
    docs = [(i, "hot " * 20 + f"cold{i % 40} rare{i}", "en", "s", 1)
            for i in range(100)]
    spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    skew = stats.QUERIES["sketch_heavy_hitters"](
        spark, str(tmp_path)
    ).collect()
    assert skew[0].tok == "hot"
    assert skew[0].est_count > 0


def test_portable_simhash_near_dups_have_small_hamming(spark, exact_pairs):
    """The oracle-backed portable variant must ALSO rank true near-dups
    (J ≥ 0.8) far below the random-pair expectation of 16 differing
    bits (of 32) — hash portability must not cost detection quality."""
    sigs = {
        r["doc_id"]: r["simhash"]
        for r in dedup.simhash_portable_signatures(spark, SF01).collect()
    }
    assert len(sigs) == 500
    assert all(0 <= s < (1 << 32) for s in sigs.values())
    for a, b in list(exact_pairs)[:10]:
        hamming = bin(sigs[a] ^ sigs[b]).count("1")
        assert hamming <= 8, f"near-dup pair ({a},{b}) hamming={hamming}"


def test_portable_simhash_pairs_recall_on_exact_near_dups(
    spark, exact_pairs
):
    """The d ≤ 3 cut is probabilistic w.r.t. Jaccard: recall over the
    exact J≥0.8 pair set must be ≥ 0.9 (observed: 1 of ~50 fixture
    pairs sits just past the hamming cut). The pigeonhole candidate
    stage itself is exact for d ≤ 3 — only the threshold costs recall."""
    got = _pairs(dedup.q_dedup_simhash_portable_pairs(spark, SF01))
    missed = exact_pairs - got
    recall = 1 - len(missed) / max(1, len(exact_pairs))
    assert recall >= 0.9, f"recall={recall}: missed {missed}"


def test_portable_lsh_pairs_are_true_pairs_with_graded_recall(spark):
    """Every portable-LSH pair must be a true cosine≥τ pair (exact
    verify stage), and recall against the brute-force ground truth is
    graded by similarity: pairs with cos ≥ 0.75 must all be found (bit
    collision probability 1−θ/π makes misses vanish for near-identical
    vectors)."""
    from sparkstreaming_rawdataingestion_spark.operators import dedup

    truth = {
        (r.vec_a, r.vec_b): r.cosine_sim
        for r in dedup.q_dedup_embedding_cosine_pairs(spark, SF01).collect()
    }
    got = {
        (r.vec_a, r.vec_b)
        for r in similarity.q_similarity_lsh_portable_pairs(
            spark, SF01
        ).collect()
    }
    assert got <= set(truth)  # no false positives — verify stage is exact
    strong = {k for k, v in truth.items() if v >= 0.75}
    assert strong <= got, f"missed strong pairs: {strong - got}"
