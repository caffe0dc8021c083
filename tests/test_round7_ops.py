"""Round-7 operator tests.

TF-IDF pair-join skew guard: the registered query's TFIDF_MAX_DF is a
no-op at fixture scale (max term df 3923 at sf0.1 < 4000), so the
rare/hot decomposition is exercised here with a LOWERED cap on a
hand-built corpus — pinning (1) exactness of the hot patch for every
pair that shares at least one rare term, (2) the documented soundness
bound (a pair sharing ONLY >max_df terms is the one miss), and (3) the
zero-weight universal-term prune (df == n_docs terms change nothing).
"""

from __future__ import annotations

from sparkstreaming_rawdataingestion_spark.operators import retrieval

DOCS = [
    # (doc_id, source, text) — one source block; term dfs over 6 docs:
    # common=5 (hot under cap 2, NOT universal), alpha/beta=2 (rare),
    # everything else 1 (rare)
    (1, "s", "alpha beta common common"),
    (2, "s", "alpha beta common common"),
    (3, "s", "common common common common common common common common gamma"),
    (4, "s", "common common common common common common common common delta"),
    (5, "s", "zeta eta"),
    (6, "s", "common theta"),
]


def _docs(spark, rows=DOCS):
    return spark.createDataFrame(rows, ["doc_id", "source", "text"])


def _pairs(df):
    return {
        (r["doc_a"], r["doc_b"]): r["cosine_sim"] for r in df.collect()
    }


def test_tfidf_capped_patch_is_exact_for_rare_sharing_pairs(spark):
    """Every pair sharing >=1 rare term survives the cap with a cosine
    EXACTLY equal to the lossless kernel's (the hot patch restores the
    >max_df contributions bit-for-bit via the DECIMAL re-sum)."""
    d = _docs(spark)
    lossless = _pairs(retrieval.tfidf_cosine_pairs(d, None, 0.1))
    capped = _pairs(retrieval.tfidf_cosine_pairs(d, 2, 0.1))
    # docs 1-2 share rare alpha/beta AND hot common: candidate via the
    # rare join, hot mass patched back -> identical docs, cosine 1.0
    assert capped[(1, 2)] == lossless[(1, 2)] == 1.0
    # the cap never invents pairs, and every emitted cosine is exact
    assert set(capped) <= set(lossless)
    assert all(capped[k] == lossless[k] for k in capped)


def test_tfidf_cap_soundness_bound_hot_only_pairs(spark):
    """The one documented miss: a qualifying pair whose ONLY shared terms
    are hot (df > max_df) — docs 3-4 share nothing but 'common' (df=5).
    It appears in the lossless output and not in the capped one; pairs
    with any rare shared term are unaffected."""
    d = _docs(spark)
    lossless = _pairs(retrieval.tfidf_cosine_pairs(d, None, 0.1))
    capped = _pairs(retrieval.tfidf_cosine_pairs(d, 2, 0.1))
    assert (3, 4) in lossless
    assert (3, 4) not in capped
    # the bound, exactly: a pair is missed iff every term it shares is
    # hot (df > 2 here means only 'common'); any rare shared term keeps
    # the pair as a candidate
    from collections import Counter

    toks = {i: set(t.split()) for i, _, t in DOCS}
    df = Counter(term for ts in toks.values() for term in ts)
    rare = {t for t, c in df.items() if c <= 2}
    missed = set(lossless) - set(capped)
    assert missed, "fixture must exercise the miss branch"
    for a, b in missed:
        assert not (toks[a] & toks[b] & rare), f"({a},{b}) shares a rare term"
    for a, b in capped:
        assert toks[a] & toks[b] & rare


def test_tfidf_universal_term_prune_changes_nothing(spark):
    """A term present in EVERY doc weighs exactly tf*ln(1) = 0: adding
    one to every document must not change a single emitted pair or
    cosine (the df == n_docs prune is exactness-preserving)."""
    d = _docs(spark)
    salted = _docs(
        spark,
        [(i, s, f"the {t} the") for i, s, t in DOCS],
    )
    base = _pairs(retrieval.tfidf_cosine_pairs(d, 2, 0.1))
    with_universal = _pairs(retrieval.tfidf_cosine_pairs(salted, 2, 0.1))
    assert base == with_universal
