"""Regression pins for the round-6 self-review findings — each test is
an input class the oracle gate cannot reach on the TPC-H-style fixtures
(short docs, huge ids, month-long gaps, constant scores, zero-norm
docs) that previously crashed or diverged."""

from __future__ import annotations

import datetime

import duckdb
import pytest
from pyspark.sql import functions as F

D = datetime.datetime

_EV_SCHEMA = (
    "event_id long, user_id long, ts timestamp_ntz, "
    "event_type string, value double, props string"
)
_DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _events(spark, tmp_path, rows):
    spark.createDataFrame(rows, _EV_SCHEMA).coalesce(1).write.parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


def _docs(spark, tmp_path, rows):
    spark.createDataFrame(rows, _DOC_SCHEMA).coalesce(1).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def _duck_for(sf_dir: str, tables=("events", "documents")):
    con = duckdb.connect()
    for t in tables:
        # Spark writes <name>.parquet as a DIRECTORY of part files
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet/*.parquet')"
        )
    return con


# ---------------------------------------------------------------------------
# sequence(1, 0) descends: sub-gram-width docs must yield EMPTY, not crash
# ---------------------------------------------------------------------------


def test_short_docs_survive_every_shingle_consumer(spark, tmp_path):
    """1- and 2-token docs (empty crawl records, bare titles) must flow
    through the n-gram dedup family and winnowing as empty-shingle docs
    — Spark's sequence(1, 0) is the DESCENDING [1, 0], which used to
    crash slice() with INVALID_PARAMETER_VALUE.START."""
    from sparkstreaming_rawdataingestion_spark.operators import dedup

    rows = [
        (1, "", "en", "web", 0),
        (2, "one", "en", "web", 3),
        (3, "two words", "en", "web", 9),
        (4, "the quick brown fox jumps over the lazy dog", "en", "web", 44),
        (5, "the quick brown fox jumps over the lazy dog", "en", "web", 44),
    ]
    sf = _docs(spark, tmp_path, rows)
    # exact near-dup pair between docs 4/5 must still be found; the
    # short docs contribute nothing and crash nothing
    pairs = {
        (r.doc_a, r.doc_b)
        for r in dedup.QUERIES["dedup_ngram_jaccard_pairs"](
            spark, sf
        ).collect()
    }
    assert (4, 5) in pairs
    assert all(a not in (1, 2, 3) and b not in (1, 2, 3) for a, b in pairs)

    win = dedup.QUERIES["winnowing_candidate_pairs"](spark, sf).collect()
    assert all(r.doc_a not in (1, 2, 3) for r in win)

    # engine matches the DuckDB oracle on this adversarial fixture too
    con = _duck_for(sf, tables=("documents",))
    want = con.execute(
        dedup.ORACLES["dedup_ngram_jaccard_pairs"]
    ).fetchall()
    assert {(a, b) for a, b, *_ in want} == pairs
    con.close()


def test_one_word_doc_survives_bigram_filters(spark, tmp_path):
    from sparkstreaming_rawdataingestion_spark.operators import filters

    rows = [
        (1, "solo", "en", "web", 4),
        (2, "a a a a a a a a", "en", "web", 15),
    ]
    sf = _docs(spark, tmp_path, rows)
    out = filters.QUERIES["text_repetition_filters"](spark, sf).collect()
    assert {r.doc_id for r in out} == {1, 2}


# ---------------------------------------------------------------------------
# hash sampling at 100 TB ids: key reduced mod 2^32 before multiplying
# ---------------------------------------------------------------------------


def test_bootstrap_survives_huge_event_ids_and_matches_oracle(
    spark, tmp_path
):
    """event_id around 5e9 (past the ~3.5e9 int64*multiplier overflow
    line) must neither crash nor diverge from the DuckDB oracle."""
    from sparkstreaming_rawdataingestion_spark.operators import experiments

    rows = [
        (5_000_000_000 + i, 1, D(2024, 1, 1, 0, 0, i % 60), "m", float(i), "{}")
        for i in range(50)
    ]
    sf = _events(spark, tmp_path, rows)
    got = experiments.q_bootstrap_mean_ci(spark, sf).collect()[0]
    con = _duck_for(sf, tables=("events",))
    want = con.execute(experiments.ORACLES["bootstrap_mean_ci"]).fetchone()
    con.close()
    assert (got.n_replicas, got.boot_mean, got.ci_lo, got.ci_hi) == want


def test_theil_sen_sampled_survives_huge_user_ids(spark, tmp_path):
    from sparkstreaming_rawdataingestion_spark.operators import segments

    rows = [
        (i, 6_000_000_000, D(2024, 1, 1, h), "m", float(h) * 2 + 1, "{}")
        for i, h in enumerate(range(12))
    ]
    sf = _events(spark, tmp_path, rows)
    out = segments.QUERIES["theil_sen_sampled"](spark, sf).collect()
    assert len(out) == 1
    # a clean linear series: every sampled pairwise slope is exactly 2
    assert out[0].sen_slope_est == 2.0


# ---------------------------------------------------------------------------
# burstiness: a single >35-day gap must not overflow gap²
# ---------------------------------------------------------------------------


def test_burstiness_survives_forty_day_gap(spark, tmp_path):
    from sparkstreaming_rawdataingestion_spark.operators import behavior

    rows = [
        (1, 1, D(2024, 1, 1), "m", 0.0, "{}"),
        (2, 1, D(2024, 2, 10), "m", 0.0, "{}"),  # 40-day gap
        (3, 1, D(2024, 2, 10, 0, 1), "m", 0.0, "{}"),
    ]
    sf = _events(spark, tmp_path, rows)
    out = behavior.q_user_burstiness_profile(spark, sf).collect()
    assert len(out) == 1 and out[0].n_users == 1
    # two gaps (a >> b): B = (σ−μ)/(σ+μ) = −b/a ≈ 0⁻ — the point is the
    # 40-day gap² no longer overflows int64, and the oracle agrees
    assert -0.01 < out[0].mean_burstiness < 0
    con = _duck_for(sf, tables=("events",))
    want = con.execute(
        behavior.ORACLES["user_burstiness_profile"]
    ).fetchall()
    con.close()
    assert len(want) == 1
    assert abs(want[0][2] - out[0].mean_burstiness) < 1e-12


# ---------------------------------------------------------------------------
# constant scores / one-class slices: AUC + sweep emit NULL, not crash
# ---------------------------------------------------------------------------


def test_auc_histogram_constant_scores_is_half(spark, tmp_path):
    rows = [
        (i, 1, D(2024, 1, 1, 0, 0, i), "purchase" if i % 2 else "view", 7.0, "{}")
        for i in range(10)
    ]
    from sparkstreaming_rawdataingestion_spark.operators import evaluation

    sf = _events(spark, tmp_path, rows)
    r = evaluation.q_ranking_auc_histogram(spark, sf).collect()[0]
    # every score ties → all mass in bin 0 → AUC exactly 0.5
    assert r.auc_est == 0.5


def test_auc_histogram_one_class_emits_null(spark, tmp_path):
    rows = [
        (i, 1, D(2024, 1, 1, 0, 0, i), "view", float(i), "{}")
        for i in range(5)
    ]
    from sparkstreaming_rawdataingestion_spark.operators import evaluation

    sf = _events(spark, tmp_path, rows)
    r = evaluation.q_ranking_auc_histogram(spark, sf).collect()[0]
    assert r.n_pos == 0 and r.auc_est is None


def test_threshold_sweep_no_positives_emits_null_recall(spark, tmp_path):
    rows = [
        (i, 1, D(2024, 1, 1, 0, 0, i), "view", float(i), "{}")
        for i in range(5)
    ]
    from sparkstreaming_rawdataingestion_spark.operators import evaluation

    sf = _events(spark, tmp_path, rows)
    out = evaluation.q_threshold_sweep_pr(spark, sf).collect()
    assert len(out) == 20
    assert all(r.recall_at is None for r in out)


# ---------------------------------------------------------------------------
# tfidf: a zero-norm doc (all terms corpus-universal) drops, not crashes
# ---------------------------------------------------------------------------


def test_tfidf_zero_norm_doc_pairs_drop(spark, tmp_path):
    from sparkstreaming_rawdataingestion_spark.operators import retrieval

    # docs 1-3 share EVERY term (df = n_docs → idf = ln(1) = 0 → zero
    # norms); doc 4/5 are a genuine near-dup pair with distinctive terms
    rows = [
        (1, "common words here", "en", "web", 17),
        (2, "common words here", "en", "web", 17),
        (3, "common words here", "en", "web", 17),
        (4, "common words here zebra quartz nebula", "en", "web", 38),
        (5, "common words here zebra quartz nebula", "en", "web", 38),
    ]
    sf = _docs(spark, tmp_path, rows)
    pairs = {
        (r.doc_a, r.doc_b)
        for r in retrieval.QUERIES["tfidf_cosine_pairs"](spark, sf).collect()
    }
    assert (4, 5) in pairs
    assert all(a not in (1, 2, 3) and b not in (1, 2, 3) for a, b in pairs)


def test_calibration_constant_scores_single_bin(spark, tmp_path):
    """All-equal scores: every row lands in bin 0 (p = 0), no crash —
    the Spark side now matches the oracle's coalesce/nullif guard."""
    from sparkstreaming_rawdataingestion_spark.operators import evaluation

    rows = [
        (i, 1, D(2024, 1, 1, 0, 0, i), "purchase" if i % 2 else "view", 7.0, "{}")
        for i in range(10)
    ]
    sf = _events(spark, tmp_path, rows)
    out = evaluation.q_score_calibration_bins(spark, sf).collect()
    assert len(out) == 1 and out[0].bin == 0


def test_exact_auc_one_class_emits_null_like_its_twin(spark, tmp_path):
    """The exact Mann-Whitney AUC must agree with its histogram twin on
    degenerate one-class slices: NULL, never DIVIDE_BY_ZERO."""
    from sparkstreaming_rawdataingestion_spark.operators import evaluation

    rows = [
        (i, 1, D(2024, 1, 1, 0, 0, i), "purchase", float(i), "{}")
        for i in range(5)
    ]
    sf = _events(spark, tmp_path, rows)
    r = evaluation.q_ranking_auc_report(spark, sf).collect()[0]
    assert r.n_neg == 0 and r.auc is None


def test_contamination_short_corpus_doc_null_ratio(spark, tmp_path):
    """A sub-3-token corpus doc has an empty shingle set (post-seq1):
    contamination ratio must be NULL, not DIVIDE_BY_ZERO — and the
    DuckDB oracle must agree row-for-row."""
    from sparkstreaming_rawdataingestion_spark.operators import filters
    from sparkstreaming_rawdataingestion_spark.operators.filters import (
        BENCH_MAX_DOC_ID,
    )

    base = BENCH_MAX_DOC_ID
    rows = [
        # bench side (doc_id < BENCH_MAX_DOC_ID)
        (1, "alpha beta gamma delta epsilon", "en", "web", 30),
        # corpus docs: one contaminated, one short
        (base + 1, "alpha beta gamma delta epsilon", "en", "web", 30),
        (base + 2, "hi", "en", "web", 2),
    ]
    sf = _docs(spark, tmp_path, rows)
    got = {
        r.doc_id: (r.n_shingles, r.contamination_ratio)
        for r in filters.QUERIES["contamination_check"](spark, sf).collect()
    }
    assert got[base + 2] == (0, None)
    assert got[base + 1][1] == 1.0
    con = _duck_for(sf, tables=("documents",))
    want = {
        r[0]: (r[1], r[3])
        for r in con.execute(
            filters.ORACLES["contamination_check"]
        ).fetchall()
    }
    con.close()
    assert want == got
