"""Profiling / rollup / sampling operator invariants (correctness vs
DuckDB is covered by their oracles; these pin the operational contracts)."""

from __future__ import annotations

from sparkstreaming_rawdataingestion_spark.operators import profiling

SF01 = "/root/testdata/sf0.01"


def test_stratified_sample_is_deterministic_and_mixed(spark):
    a = sorted(r["doc_id"] for r in profiling.q_stratified_sample(spark, SF01).collect())
    b = sorted(r["doc_id"] for r in profiling.q_stratified_sample(spark, SF01).collect())
    assert a == b and len(a) > 0
    rows = profiling.q_stratified_sample(spark, SF01).collect()
    langs = {r["lang"] for r in rows}
    # every stratum with a non-zero rate is represented
    assert langs == set(profiling._MIX_RATES)


def test_table_profile_one_row_per_column(spark):
    rows = profiling.q_table_profile(spark, SF01).collect()
    assert {r["column_name"] for r in rows} == set(profiling._PROFILE_COLS)
    by_col = {r["column_name"]: r for r in rows}
    # primary key: distinct == rows, no nulls
    pk = by_col["o_orderkey"]
    assert pk["n_distinct"] == pk["n_rows"] and pk["n_null"] == 0


def test_rollup_hierarchy_levels_are_consistent(spark):
    rows = profiling.q_rollup_time_hierarchy(spark, SF01).collect()
    totals = {}
    for r in rows:
        t = totals.setdefault(r["resolution"], [0, 0.0])
        t[0] += r["n_events"]
        t[1] += r["sum_value"]
    # every resolution preserves the grand total exactly (decimal partials)
    assert totals["hour"][0] == totals["day"][0] == totals["month"][0]
    assert abs(totals["hour"][1] - totals["month"][1]) < 1e-6


def test_hll_sketch_merge_is_accurate_where_naive_sum_is_not(spark):
    """Merged daily sketches must estimate the true per-status distinct
    within HLL tolerance, while summing daily distinct counts
    over-counts (the reason sketches, not counts, are what you roll up)."""
    from pyspark.sql import functions as F

    from sparkstreaming_rawdataingestion_spark import catalog
    from sparkstreaming_rawdataingestion_spark.operators.stats import (
        q_sketch_mergeable_hll,
    )

    got = {r["o_orderstatus"]: r for r in q_sketch_mergeable_hll(spark, SF01).collect()}
    exact = {
        r["o_orderstatus"]: r["n"]
        for r in catalog.load_table(spark, SF01, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count_distinct("o_custkey").alias("n"))
        .collect()
    }
    for status, n_exact in exact.items():
        approx = got[status]["approx_customers"]
        assert abs(approx - n_exact) / n_exact < 0.05
        # the naive rollup over-counts repeat customers across days
        assert got[status]["naive_sum_of_daily_distincts"] > n_exact


def test_leakage_safe_split_keeps_clusters_together(spark):
    rows = profiling.q_leakage_safe_split(spark, SF01).collect()
    by_group = {}
    for r in rows:
        by_group.setdefault(r["group_id"], set()).add(r["split"])
    # no near-dup cluster straddles a split boundary
    assert all(len(s) == 1 for s in by_group.values())
    # multi-member groups exist (the fixture corpus has near-dups)
    sizes = {}
    for r in rows:
        sizes[r["group_id"]] = sizes.get(r["group_id"], 0) + 1
    assert max(sizes.values()) > 1
    # all three splits populated at the 80/10/10 rates (loose bounds)
    frac = {}
    for r in rows:
        frac[r["split"]] = frac.get(r["split"], 0) + 1
    n = len(rows)
    assert 0.6 < frac["train"] / n < 0.95 and frac["valid"] and frac["test"]


def test_dedup_keep_best_keeps_the_highest_quality_member(spark):
    from sparkstreaming_rawdataingestion_spark.operators.text import (
        q_text_quality_score,
    )

    kept = {r["group_id"]: r for r in profiling.q_dedup_keep_best(spark, SF01).collect()}
    quality = {
        r["doc_id"]: r["quality_score"]
        for r in q_text_quality_score(spark, SF01).collect()
    }
    groups = {}
    for r in profiling.q_leakage_safe_split(spark, SF01).collect():
        groups.setdefault(r["group_id"], []).append(r["doc_id"])
    assert set(kept) == set(groups)
    for gid, members in groups.items():
        assert kept[gid]["n_members"] == len(members)
        assert kept[gid]["kept_quality"] == max(quality[m] for m in members)
    # at least one multi-member cluster keeps a non-minimal doc_id somewhere
    multi = [g for g, m in groups.items() if len(m) > 1]
    assert multi


def test_bucket_hash_is_overflow_safe_at_full_scale_ids(spark):
    """Spark 4 runs ANSI mode: a raw Knuth multiply on int64 keys ERRORS
    with ARITHMETIC_OVERFLOW for ids ≳ 3.5e9 (verified while fixing this)
    — plausible ids at 100 TB. The shipped hash reduces the key mod 2^32
    before a sub-2^31 multiplier, so it must evaluate for the full int64
    domain and stay in [0, 100)."""
    from pyspark.sql import functions as F

    from sparkstreaming_rawdataingestion_spark.operators.profiling import (
        _bucket_col,
    )

    ids = [0, 1, 4_000_000_000, 2**32, 2**40 + 7, 2**62, 2**63 - 1]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    rows = df.select(
        "doc_id", _bucket_col(F.col("doc_id")).alias("b")
    ).collect()
    assert len(rows) == len(ids)
    assert all(0 <= r.b < 100 for r in rows)
    # and it actually discriminates (not a constant)
    assert len({r.b for r in rows}) > 1


def test_upsample_mix_rates_and_determinism(spark):
    from pyspark.sql import functions as F

    from sparkstreaming_rawdataingestion_spark.operators.profiling import (
        _UPSAMPLE_RATES,
        QUERIES,
    )

    out = QUERIES["upsample_mix"](spark, "/root/testdata/sf0.01")
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    base = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    got = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, rate in _UPSAMPLE_RATES.items():
        if lang not in base:
            continue
        # hash-selected fraction → within a few % of rate on 100+ docs
        ratio = got.get(lang, 0) / base[lang]
        assert abs(ratio - rate / 100) < 0.15, (lang, ratio, rate)
    # exact determinism: rerun yields the identical multiset
    again = QUERIES["upsample_mix"](spark, "/root/testdata/sf0.01")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))
    # every doc with weight >= 1 appears at least floor(w) times
    en_min = out.where(F.col("lang") == "en").groupBy("doc_id").count()
    assert en_min.agg(F.min("count")).first()[0] >= 1
