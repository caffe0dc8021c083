"""Corpus filtering / decontamination operator invariants (value-level
correctness vs DuckDB is covered by the oracles; these pin the semantic
contracts and the map-only plan shapes)."""

from __future__ import annotations

from sparkstreaming_rawdataingestion_spark.operators import filters
from sparkstreaming_rawdataingestion_spark.operators.similarity import (
    q_embedding_quantization,
)

SF01 = "/root/testdata/sf0.01"


def test_repetition_filters_bounds_and_both_classes(spark):
    rows = filters.q_text_repetition_filters(spark, SF01).collect()
    for r in rows:
        assert 0 < r["distinct_word_ratio"] <= 1.0
        assert 0 < r["top_word_frac"] <= 1.0
        assert 0 <= r["dup_bigram_frac"] < 1.0
        # a doc where every word is unique cannot be flagged repetitive
        if r["distinct_word_ratio"] == 1.0:
            assert not r["repetitive"]
    flags = {r["repetitive"] for r in rows}
    assert flags == {True, False}, "threshold should split the corpus"


def test_repetition_filters_plan_is_map_only(spark):
    plan = filters.q_text_repetition_filters(spark, SF01)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "repetition metrics must not shuffle"


def test_contamination_flags_only_near_dups_of_benchmark(spark):
    rows = filters.q_contamination_check(spark, SF01).collect()
    # benchmark docs themselves are excluded from scoring
    assert all(r["doc_id"] >= filters.BENCH_MAX_DOC_ID for r in rows)
    flagged = [r for r in rows if r["contaminated"]]
    assert 0 < len(flagged) < len(rows) / 10, "flag should be rare, not empty"
    for r in rows:
        assert 0 <= r["shared_shingles"] <= r["n_shingles"]


def test_pii_redaction_scrubs_every_injected_token(spark):
    df = filters.q_pii_redaction(spark, SF01)
    rows = df.collect()
    # one synthetic email/phone/ip injected per doc, all redacted
    assert all(
        r["n_emails"] == 1 and r["n_phones"] == 1 and r["n_ips"] == 1
        for r in rows
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "redaction must be a pure scan stage"


def test_quantization_reconstruction_error_is_bounded(spark):
    rows = q_embedding_quantization(spark, SF01).collect()
    for r in rows:
        # symmetric int8: |err| <= scale/2 (plus clamp, which never fires
        # since max|v|/scale == 127 exactly)
        assert r["max_abs_err"] <= r["scale"] / 2 + 1e-12
        assert r["cos_preserved"] > 0.999, "int8 must preserve direction"


def test_curation_filters_pack_covers_all_components(spark):
    rows = filters.q_curation_filters_pack(spark, SF01).collect()
    by_comp = {}
    for r in rows:
        by_comp[r["component"]] = by_comp.get(r["component"], 0) + 1
    assert set(by_comp) == {"repetition", "contamination", "pii", "quantization"}
    assert by_comp["repetition"] == by_comp["pii"] == 500


def test_vocab_coverage_bounds_and_identity(spark, sf_dir):
    """OOV rate in [0,1]; a corpus whose vocab holds every token (top-K
    ≥ distinct tokens) reports zero OOV everywhere."""
    from pyspark.sql import functions as F

    from sparkstreaming_rawdataingestion_spark.operators import text

    out = text.q_tokenizer_vocab_coverage(spark, sf_dir)
    mm = out.agg(
        F.min("oov_rate").alias("lo"), F.max("oov_rate").alias("hi")
    ).first()
    assert 0.0 <= mm.lo <= mm.hi <= 1.0
    n_distinct = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.explode(F.split("text", " ")).alias("t"))
        .distinct()
        .count()
    )
    if n_distinct <= text.VOCAB_TOP_K:
        assert mm.hi == 0.0


def test_novelty_detects_duplicated_text(spark):
    """Two identical docs share every bigram (novelty 0); a unique doc
    scores 1."""
    import sparkstreaming_rawdataingestion_spark.catalog as catalog
    from sparkstreaming_rawdataingestion_spark.operators import text

    d = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta", "en", "web", 22),
            (2, "alpha beta gamma delta", "en", "web", 22),
            (3, "omega psi chi phi", "en", "web", 17),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    orig = catalog.load_table
    try:
        catalog.load_table = lambda sp, sf, t: d
        text.catalog.load_table = catalog.load_table
        out = {
            r.doc_id: r.novelty
            for r in text.q_ngram_novelty_score(spark, "x").collect()
        }
    finally:
        catalog.load_table = orig
        text.catalog.load_table = orig
    assert out[1] == 0.0 and out[2] == 0.0
    assert out[3] == 1.0
