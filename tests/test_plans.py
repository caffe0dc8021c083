"""Physical-plan assertions — would this plan survive 100×the data?

Each test pins a scale-critical property of a query's executed plan so a
regression that silently de-optimizes (drops a pushdown, breaks a
broadcast, adds a shuffle) fails here instead of on the cluster.
"""

from __future__ import annotations

from sparkstreaming_rawdataingestion_spark import plans
from sparkstreaming_rawdataingestion_spark.operators import relational


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = relational.q_filter_project_pushdown(spark, sf_dir)
    assert plans.has_pushed_filter(df, "l_discount"), "predicate not pushed"
    assert plans.has_pushed_filter(df, "l_returnflag")


def test_column_pruning(spark, sf_dir):
    df = relational.q_filter_project_pushdown(spark, sf_dir)
    cols = set(plans.read_schema_columns(df))
    # only the 4 projected + 3 filtered columns may be read — never the
    # full 11-column lineitem row
    assert cols <= {
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag",
        "l_shipdate", "l_discount",
    }, f"scan reads too much: {cols}"


def test_dim_join_broadcasts(spark, sf_dir):
    df = relational.q_join_broadcast_dims(spark, sf_dir)
    assert plans.has_broadcast_join(df), "dimension join must broadcast"


def test_global_topk_avoids_full_sort(spark, sf_dir):
    df = relational.q_topk_global(spark, sf_dir)
    plan = plans.executed_plan(df)
    assert "TakeOrderedAndProject" in plan, "LIMIT+ORDER BY must use top-k"


def test_single_agg_shuffle(spark, sf_dir):
    df = relational.q_agg_pricing_summary(spark, sf_dir)
    # one hash-partitioning exchange (partial → final agg), nothing more
    assert plans.count_exchanges(df) <= 1


def test_asof_join_single_shuffle(spark, sf_dir):
    """The union-merge as-of join must not expand into a range cross-join:
    its plan is bounded by shuffles for the two inputs' union + window."""
    from sparkstreaming_rawdataingestion_spark.operators import asof

    df = asof.q_asof_join(spark, sf_dir)
    plan = plans.executed_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_join_strategy_hints_respected(spark, sf_dir):
    """The engine exposes Spark's full join-strategy surface: hints must
    flip the physical operator (merge vs shuffle-hash vs broadcast)."""
    from sparkstreaming_rawdataingestion_spark import catalog

    o = catalog.load_table(spark, sf_dir, "orders")
    c = catalog.load_table(spark, sf_dir, "customer")
    merged = o.join(c.hint("merge"), o.o_custkey == c.c_custkey)
    assert "SortMergeJoin" in plans.executed_plan(merged)
    hashed = o.join(c.hint("shuffle_hash"), o.o_custkey == c.c_custkey)
    assert "ShuffledHashJoin" in plans.executed_plan(hashed)
    bcast = o.join(c.hint("broadcast"), o.o_custkey == c.c_custkey)
    assert "BroadcastHashJoin" in plans.executed_plan(bcast)


def test_aqe_coalesces_small_shuffles(spark, sf_dir):
    """AQE must be live: a tiny grouped aggregate's shuffle read is
    coalesced at runtime (AQEShuffleRead), the knob that keeps small
    reducers from dominating task overhead at scale."""
    from pyspark.sql import functions as F

    from sparkstreaming_rawdataingestion_spark import catalog

    df = (
        catalog.load_table(spark, sf_dir, "nation")
        .groupBy("n_regionkey")
        .agg(F.count("*").alias("n"))
    )
    df.collect()  # AQE final plan materializes after execution
    assert "AQEShuffleRead" in plans.executed_plan(df)


def test_chunking_is_map_only(spark, sf_dir):
    """Token-window chunking must stay a generator projection: zero
    exchanges, no Python, whole plan parallel with the scan."""
    from sparkstreaming_rawdataingestion_spark.operators import packing

    df = packing.q_chunk_documents(spark, sf_dir)
    assert plans.count_exchanges(df) == 0
    plan = plans.executed_plan(df)
    assert "Python" not in plan  # no UDF in the hot path


def test_table_profile_single_scan(spark, sf_dir):
    """The wide profile aggregation must scan the table once — one scan
    node regardless of how many columns are profiled."""
    from sparkstreaming_rawdataingestion_spark.operators import profiling

    df = profiling.q_table_profile(spark, sf_dir)
    plan = plans.executed_plan(df)
    assert plan.count("Scan parquet") == 1


def test_window_pack_shares_one_exchange(spark, sf_dir):
    """Both window orderings partition on user_id: Spark must plan them
    over ONE exchange (re-sort, not re-shuffle)."""
    from sparkstreaming_rawdataingestion_spark.operators import packs

    df = packs.q_window_functions_pack(spark, sf_dir)
    assert plans.count_exchanges(df) == 1


def test_sessionize_single_shuffle_no_global_sort(spark, sf_dir):
    """lag + running-sum share one window spec: exactly one hash
    exchange on user_id, local sorts only (no range partitioning)."""
    from sparkstreaming_rawdataingestion_spark.operators import analytics

    df = analytics.QUERIES["sessionize_events"](spark, sf_dir)
    plan = plans.executed_plan(df)
    assert plan.count("Exchange hashpartitioning") == 1
    assert "rangepartitioning" not in plan


def test_weighted_sample_is_topk_on_pruned_scan(spark, sf_dir):
    """Sequential Poisson sampling must be TakeOrderedAndProject over a
    2-column scan — no shuffle of the corpus, no global sort."""
    from sparkstreaming_rawdataingestion_spark.operators import mining

    df = mining.q_weighted_sample_poisson(spark, sf_dir)
    plan = plans.executed_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert plans.count_exchanges(df) == 0
    assert set(plans.read_schema_columns(df)) <= {"doc_id", "n_chars"}


def test_lag_features_single_window_exchange(spark, sf_dir):
    """Every lag/rolling feature column must ride ONE (user × time)
    exchange + sort — both window frames share the spec."""
    from sparkstreaming_rawdataingestion_spark.operators import features

    df = features.q_ml_lag_features(spark, sf_dir)
    assert plans.count_exchanges(df) == 1
    plan = plans.executed_plan(df)
    assert plan.count("Window") == 1


def test_temperature_mix_is_broadcast_filter(spark, sf_dir):
    """The rate table must broadcast onto the scan — the corpus side
    never shuffles."""
    from sparkstreaming_rawdataingestion_spark.operators import mining

    df = mining.q_temperature_mix_sample(spark, sf_dir)
    assert plans.has_broadcast_join(df)
    plan = plans.executed_plan(df)
    assert "SortMergeJoin" not in plan


def test_feature_hash_has_no_join(spark, sf_dir):
    """The hashing trick's point: no vocabulary join anywhere — explode,
    codegen fold, one aggregation."""
    from sparkstreaming_rawdataingestion_spark.operators import text

    df = text.q_feature_hash_embedding(spark, sf_dir)
    plan = plans.executed_plan(df)
    assert "Join" not in plan
    assert plans.count_exchanges(df) == 1


def test_path_trigrams_topk_over_bounded_agg(spark, sf_dir):
    from sparkstreaming_rawdataingestion_spark.operators import behavior

    df = behavior.q_event_path_trigrams(spark, sf_dir)
    plan = plans.executed_plan(df)
    assert "TakeOrderedAndProject" in plan


def test_allocation_window_exchange_reused_by_join(spark, sf_dir):
    """The per-order window and the header join share the l_orderkey
    partitioning: ONE lineitem-side exchange total, no cartesian."""
    from sparkstreaming_rawdataingestion_spark.operators import segments

    df = segments.q_allocation_proportional(spark, sf_dir)
    assert plans.count_exchanges(df) <= 2  # li window + orders join side
    plan = plans.executed_plan(df)
    assert "CartesianProduct" not in plan


def _fact_scans_all_cached(plan: str, fragment: str) -> bool:
    """True when every textual occurrence of the fact's FileScan sits
    inside an InMemoryRelation printout (the cached-plan echo) — i.e.
    the fact is physically scanned once and re-consumers read the
    cache. Each InMemoryTableScan prints its cached subtree once, so
    cached echoes == InMemoryRelation count."""
    return 0 < plan.count(fragment) <= plan.count("InMemoryRelation")


def test_pareto_single_lineitem_pass(spark, sf_dir):
    """Grand total AND ranking window consume the STAGED part rollup —
    lineitem is scanned once; windows never see raw facts."""
    from sparkstreaming_rawdataingestion_spark.operators import segments
    from sparkstreaming_rawdataingestion_spark.session import release_staged

    df = segments.q_pareto_revenue_share(spark, sf_dir)
    plan = plans.executed_plan(df)
    assert "InMemoryTableScan" in plan
    assert _fact_scans_all_cached(plan, "lineitem.parquet")
    release_staged()


def test_mad_flags_broadcast_stats_onto_scan(spark, sf_dir):
    from sparkstreaming_rawdataingestion_spark.operators import segments

    df = segments.q_mad_outlier_flags(spark, sf_dir)
    assert plans.has_broadcast_join(df)
    plan = plans.executed_plan(df)
    assert "SortMergeJoin" not in plan


def test_topn_other_single_fact_pass(spark, sf_dir):
    """Both union branches must consume the STAGED ranked rollup — the
    orders scan is cached once, the branches read InMemoryTableScan."""
    from sparkstreaming_rawdataingestion_spark.operators import trends
    from sparkstreaming_rawdataingestion_spark.session import release_staged

    df = trends.q_topn_plus_other(spark, sf_dir)
    plan = plans.executed_plan(df)
    assert plan.count("InMemoryTableScan") >= 2
    assert _fact_scans_all_cached(plan, "orders.parquet")
    release_staged()


def test_period_over_period_single_fact_pass(spark, sf_dir):
    from sparkstreaming_rawdataingestion_spark.operators import trends
    from sparkstreaming_rawdataingestion_spark.session import release_staged

    df = trends.q_period_over_period(spark, sf_dir)
    plan = plans.executed_plan(df)
    assert plan.count("InMemoryTableScan") >= 3  # cur, month-1, month-12
    assert _fact_scans_all_cached(plan, "orders.parquet")
    release_staged()


def test_cuped_single_fact_pass(spark, sf_dir):
    from sparkstreaming_rawdataingestion_spark.operators import experiments
    from sparkstreaming_rawdataingestion_spark.session import release_staged

    df = experiments.q_ab_cuped_adjusted(spark, sf_dir)
    plan = plans.executed_plan(df)
    assert plan.count("InMemoryTableScan") >= 2  # theta fit + adjustment
    assert _fact_scans_all_cached(plan, "events.parquet")
    release_staged()


def test_holdout_split_is_map_only(spark, sf_dir):
    from sparkstreaming_rawdataingestion_spark.operators import layout

    df = layout.QUERIES["train_val_test_split"](spark, sf_dir)
    assert plans.count_exchanges(df) == 0, "hash split must not shuffle"


def test_skew_report_topk_uses_heaps_not_global_sort(spark, sf_dir):
    from sparkstreaming_rawdataingestion_spark.operators import profiling
    from sparkstreaming_rawdataingestion_spark.session import release_staged

    df = profiling.QUERIES["skew_key_report"](spark, sf_dir)
    plan = plans.executed_plan(df)
    # one per-partition-heap top-k per key family — the key space never
    # funnels through a single-partition full sort
    assert plan.count("TakeOrderedAndProject") == 4
    release_staged()


def test_pmi_margins_come_from_staged_model_not_corpus(spark, sf_dir):
    from sparkstreaming_rawdataingestion_spark.operators import mining
    from sparkstreaming_rawdataingestion_spark.session import release_staged

    df = mining.QUERIES["collocation_pmi_bigrams"](spark, sf_dir)
    plan = plans.executed_plan(df)
    # the bigram model aggregate is staged once; left margin, right
    # margin and the grand total all read the cache — the corpus parquet
    # appears in at most one live scan subtree
    assert plan.count("InMemoryTableScan") >= 3
    assert plan.count("documents.parquet].") <= 1 or (
        plan.count("Scan parquet") - plan.count("InMemoryTableScan") <= 1
    )
    release_staged()


# ---------------------------------------------------------------------------
# Round-6: scale twins + new corpus operators
# ---------------------------------------------------------------------------


def test_qnorm_approx_has_no_global_rank(spark, sf_dir):
    """The approx twin's entire point: the exact kernel's data-sized
    global row_number window must be gone — the only single-partition
    exchange left is the 1-row percentile-sketch aggregate."""
    from sparkstreaming_rawdataingestion_spark.operators import signals

    exact = plans.executed_plan(
        signals.q_quantile_normalize_sources(spark, sf_dir)
    )
    approx = plans.executed_plan(
        signals.q_quantile_normalize_approx(spark, sf_dir)
    )
    assert "row_number" in exact  # the scale-killer, present by design
    assert "row_number" not in approx
    assert "percentile_approx" in approx
    assert approx.count("SinglePartition") <= 1


def test_auc_histogram_windows_only_the_model_table(spark, sf_dir):
    """The exact AUC ranks every event (rank() over a global order);
    the histogram twin must not — its window arithmetic runs over the
    ≤4096-row bin table after ONE grouped aggregation."""
    from sparkstreaming_rawdataingestion_spark.operators import evaluation

    exact = plans.executed_plan(evaluation.q_ranking_auc_report(spark, sf_dir))
    hist = plans.executed_plan(
        evaluation.q_ranking_auc_histogram(spark, sf_dir)
    )
    assert "rank(" in exact
    assert "rank(" not in hist
    assert "BroadcastExchange" in hist  # 1-row bounds onto the scan


def test_kmeans_assignment_is_broadcast_map_side(spark, sf_dir):
    """Lloyd-step assignment must be a broadcast K-fanout — no shuffle
    of the vectors, no single-partition stage anywhere; the only
    aggregation exchange carries K keys."""
    from sparkstreaming_rawdataingestion_spark.operators import similarity

    p = plans.executed_plan(similarity.q_kmeans_one_step(spark, sf_dir))
    assert "BroadcastExchange" in p
    assert "SinglePartition" not in p


def test_token_budget_no_global_sort(spark, sf_dir):
    """The greedy budget selection orders only WITHIN source partitions:
    a global sort ("], true" Sort flag) anywhere means the plan stopped
    scaling."""
    from sparkstreaming_rawdataingestion_spark.operators import layout

    p = plans.executed_plan(layout.q_tokens_budget_allocation(spark, sf_dir))
    assert "], true, 0" not in p  # no global-flagged Sort node
    assert "hashpartitioning(source" in p


def test_degree_distribution_second_agg_keys_on_degree(spark, sf_dir):
    """Hub safety: the share arithmetic runs after re-keying on degree,
    so a hot node contributes one row, not a hot partition."""
    from sparkstreaming_rawdataingestion_spark.operators import graph

    p = plans.executed_plan(graph.q_graph_degree_distribution(spark, sf_dir))
    assert "hashpartitioning(degree" in p


def test_bootstrap_fanout_is_map_side(spark, sf_dir):
    """The Poisson-bootstrap B-fanout must stay in the scan stage: one
    Generate (explode) feeding a partial aggregate, ONE exchange total
    (B partial sums per map task) — never a shuffle of the exploded
    rows and never a replica-driven re-scan."""
    from sparkstreaming_rawdataingestion_spark.operators import experiments

    df = experiments.q_bootstrap_mean_ci(spark, sf_dir)
    p = plans.executed_plan(df)
    assert "Generate" in p  # the explode is present…
    assert plans.count_exchanges(df) <= 1  # …and never shuffled raw
    assert "rangepartitioning" not in p


def test_ndcg_no_global_sort_single_user_exchange(spark, sf_dir):
    """NDCG@10 sorts only WITHIN user partitions — a rangepartitioning
    exchange (global sort) anywhere means the ranking stopped scaling;
    the user window's exchange is reused by the per-user reduce."""
    from sparkstreaming_rawdataingestion_spark.operators import evaluation

    df = evaluation.q_ndcg_ranking_quality(spark, sf_dir)
    p = plans.executed_plan(df)
    assert "rangepartitioning" not in p
    assert plans.count_exchanges(df) <= 1


def test_wilson_single_day_exchange(spark, sf_dir):
    """Daily Wilson bounds: one grouped count (map-side combine into a
    days-keyed exchange), closed-form arithmetic after — never a second
    shuffle, never a global sort."""
    from sparkstreaming_rawdataingestion_spark.operators import evaluation

    df = evaluation.q_ctr_wilson_bounds(spark, sf_dir)
    assert plans.count_exchanges(df) <= 1
    assert "rangepartitioning" not in plans.executed_plan(df)


def test_kappa_reduces_before_joining(spark, sf_dir):
    """Kappa's joins run over the ≤|langs|² confusion matrix and 1-row
    totals — broadcast nested loops over constant-size inputs are fine,
    an unbroadcast CartesianProduct is not."""
    from sparkstreaming_rawdataingestion_spark.operators import evaluation

    p = plans.executed_plan(evaluation.q_label_agreement_kappa(spark, sf_dir))
    assert "CartesianProduct" not in p


def test_burstiness_reuses_user_exchange(spark, sf_dir):
    """The lag window and the per-user moment reduce share one user_id
    exchange; the only other shuffle carries ≤ ~20 bucket keys. No
    global sort anywhere."""
    from sparkstreaming_rawdataingestion_spark.operators import behavior

    df = behavior.q_user_burstiness_profile(spark, sf_dir)
    p = plans.executed_plan(df)
    assert plans.count_exchanges(df) <= 2
    assert "rangepartitioning" not in p


def test_tfidf_pairs_no_cartesian_no_global_sort(spark, sf_dir):
    """The exact TF-IDF pair kernel must get its candidates from the
    inverted term index (equi-join on term within the source block) —
    an unbroadcast CartesianProduct means all-pairs; a rangepartitioning
    exchange means something global-sorted the corpus. The df and
    n_docs model tables join as broadcasts."""
    from sparkstreaming_rawdataingestion_spark.operators import retrieval

    df = retrieval.q_tfidf_cosine_pairs(spark, sf_dir)
    p = plans.executed_plan(df)
    assert "CartesianProduct" not in p
    assert "rangepartitioning" not in p
    assert "BroadcastHashJoin" in p  # df-model join stays broadcast


def test_tfidf_pair_join_input_is_df_guarded(spark, sf_dir):
    """The DEFAULT (pipeline/scale) TF-IDF kernel must be df-filtered in
    the PLAN, not just benign on the fixture: (1) corpus-universal terms
    (df = n_docs, weight exactly 0) pruned before the index is staged, and
    (2) candidate generation restricted to df <= TFIDF_MAX_DF so one
    stopword-like term can't contribute df² join rows at scale (the hot
    remainder patches exact products through a pair-keyed join instead).
    The REGISTERED query, by contrast, is the lossless max_df=None form
    (ADVICE r7: oracle parity must not depend on the fixture's df
    profile), so its plan carries the zero-weight prune but NO cap."""
    import re

    from sparkstreaming_rawdataingestion_spark import catalog
    from sparkstreaming_rawdataingestion_spark.operators import retrieval

    d = catalog.load_table(spark, sf_dir, "documents")
    capped = plans.analyzed_plan(retrieval.tfidf_cosine_pairs(d))
    assert re.search(r"df#\d+L? < n_docs#\d+", capped), (
        "zero-weight universal-term prune missing from the plan"
    )
    assert re.search(
        rf"df#\d+L? <= cast\({retrieval.TFIDF_MAX_DF} as bigint\)", capped
    ), "TFIDF_MAX_DF candidate cap missing from the plan"

    registered = plans.analyzed_plan(retrieval.q_tfidf_cosine_pairs(spark, sf_dir))
    assert re.search(r"df#\d+L? < n_docs#\d+", registered)
    assert not re.search(
        rf"df#\d+L? <= cast\({retrieval.TFIDF_MAX_DF} as bigint\)", registered
    ), "registered query must run the lossless kernel (max_df=None)"


def test_winnowing_pairs_df_capped_equi_join(spark, sf_dir):
    """Winnowing pairs come from the df-capped inverted fingerprint
    index: the pair join is an equi-join on fp (never cartesian, never
    a global sort), and the whole kernel is a bounded shuffle chain —
    per-doc windows plus the fp/pair aggregations."""
    from sparkstreaming_rawdataingestion_spark.operators import dedup

    df = dedup.q_winnowing_candidate_pairs(spark, sf_dir)
    p = plans.executed_plan(df)
    assert "CartesianProduct" not in p
    assert "rangepartitioning" not in p
    assert plans.count_exchanges(df) <= 6


def test_decontamination_eval_index_broadcasts(spark, sf_dir):
    """The contamination probe's scale contract: the eval-side n-gram
    index and sizes join as BROADCASTS (a benchmark is model-table
    sized), the train-side gram stream never shuffles payloads — the
    single exchange is the (train_id, eval_id) pair aggregation."""
    from sparkstreaming_rawdataingestion_spark.operators import dedup

    df = dedup.QUERIES["decontamination_ngram_overlap"](spark, sf_dir)
    p = plans.executed_plan(df)
    assert p.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in p
    assert plans.count_exchanges(df) <= 2


def test_gopher_filter_doc_keyed_only(spark, sf_dir):
    """The repetition filter must stay embarrassingly parallel over
    documents: bigram count + per-doc max are doc-keyed aggregations
    (bounded exchanges), with no corpus-global sort or cross join."""
    from sparkstreaming_rawdataingestion_spark.operators import text

    df = text.QUERIES["gopher_repetition_filter"](spark, sf_dir)
    p = plans.executed_plan(df)
    assert "CartesianProduct" not in p
    assert "rangepartitioning" not in p
    assert plans.count_exchanges(df) <= 3


def test_temperature_mix_no_global_sort(spark, sf_dir):
    """The mix planner reduces the corpus once (source-keyed census) and
    finishes on model tables against broadcast totals — never a global
    sort, never a cartesian over data tables."""
    from sparkstreaming_rawdataingestion_spark.operators import pipeline

    df = pipeline.QUERIES["temperature_mixture_weights"](spark, sf_dir)
    p = plans.executed_plan(df)
    assert "rangepartitioning" not in p
    assert plans.count_exchanges(df) <= 4


def test_pii_audit_single_reduce(spark, sf_dir):
    """The redaction audit folds every regex statistic into ONE grouped
    aggregation over one scan (the data_quality_checks shape): a single
    exchange, no joins, no Python."""
    from sparkstreaming_rawdataingestion_spark.operators import validation

    df = validation.QUERIES["pii_redaction_stats"](spark, sf_dir)
    p = plans.executed_plan(df)
    assert plans.count_exchanges(df) == 1
    assert "Join" not in p
    assert "Python" not in p


def test_substring_chunks_digest_keyed(spark, sf_dir):
    """Chunk generation is a map-only sequence+slice projection and the
    census shuffles sha256 digests only: bounded exchanges (count +
    countDistinct), never a sort or cartesian, no Python."""
    from sparkstreaming_rawdataingestion_spark.operators import dedup

    df = dedup.QUERIES["dedup_exact_substring_chunks"](spark, sf_dir)
    p = plans.executed_plan(df)
    assert plans.count_exchanges(df) <= 2
    assert "rangepartitioning" not in p
    assert "CartesianProduct" not in p
    assert "Python" not in p


def test_ece_report_model_table_algebra(spark, sf_dir):
    """ECE scans the corpus once into a 10-key bin aggregation; the
    gap/total/Brier algebra runs on model tables against broadcast
    1-row frames — bounded exchanges, no global sort."""
    from sparkstreaming_rawdataingestion_spark.operators import evaluation

    df = evaluation.QUERIES["calibration_ece_report"](spark, sf_dir)
    p = plans.executed_plan(df)
    assert plans.count_exchanges(df) <= 3
    assert "rangepartitioning" not in p


def test_psi_model_table_algebra(spark, sf_dir):
    """PSI scans the corpus once into a staged (type, value, cohort)
    projection; bounds, grid and terms are model tables — bounded
    exchanges, never a sort, no Python. Every parquet scan in the plan
    string must sit under an InMemoryRelation (the one cached plan,
    printed once per reference): a consumer bypassing the cache would
    add a bare scan and re-read the corpus."""
    from sparkstreaming_rawdataingestion_spark.operators import validation

    df = validation.QUERIES["score_drift_psi"](spark, sf_dir)
    p = plans.executed_plan(df)
    assert plans.count_exchanges(df) <= 3
    assert p.count("Scan parquet") == p.count("InMemoryRelation")
    assert "rangepartitioning" not in p
    assert "CartesianProduct" not in p
    assert "Python" not in p


def test_dedup_rate_digest_keyed(spark, sf_dir):
    """The duplication census shuffles (source, sha) digests only —
    two aggregations, no joins, no sort."""
    from sparkstreaming_rawdataingestion_spark.operators import dedup

    df = dedup.QUERIES["dedup_rate_report"](spark, sf_dir)
    p = plans.executed_plan(df)
    assert plans.count_exchanges(df) <= 2
    assert "Join" not in p
    assert "rangepartitioning" not in p


def test_semantic_dedup_pair_join_is_cluster_keyed(spark, sf_dir):
    """SemDeDup's contract IS the plan shape: the cosine pair join must
    be an equi-join keyed on cluster_id (cluster membership bounds the
    candidate set — no CartesianProduct anywhere), the K-row centroid
    table must broadcast into the assignment, and the assignment frame
    must be staged ONCE and reused by both sides of the self-join."""
    from sparkstreaming_rawdataingestion_spark.operators import dedup

    df = dedup.q_dedup_semantic_clusters(spark, sf_dir)
    p = plans.executed_plan(df)
    assert "CartesianProduct" not in p
    # The only nested-loop broadcast allowed is the K-row centroid
    # fanout inside kmeans_assign — which lives in the STAGED assignment
    # subtree, and each InMemoryRelation reference reprints its cached
    # child plan (the round-7 plan-string lesson), so the textual count
    # must equal the InMemoryRelation count exactly. The PAIR join is
    # OUTSIDE the cache: if it were nested-loop, BNLJ would exceed IMR.
    assert p.count("BroadcastNestedLoopJoin") == p.count("InMemoryRelation")
    assert p.count("InMemoryRelation") >= 1  # staged assignment, built once
    assert "SortMergeJoin" in p or "ShuffledHashJoin" in p  # equi pair join
    logical = plans.analyzed_plan(df)
    assert "cluster_id" in logical


def test_quality_classifier_weights_broadcast_no_extra_shuffle(spark, sf_dir):
    """The model table must broadcast onto the sparse features (never a
    shuffle join against a 16-row table), and the whole scorer is the
    hashing trick's two doc-keyed aggregations — no vocabulary join, no
    Python, no range partitioning."""
    from sparkstreaming_rawdataingestion_spark.operators import text

    df = text.q_quality_classifier_score(spark, sf_dir)
    p = plans.executed_plan(df)
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "rangepartitioning" not in p
    assert "Python" not in p
    assert plans.count_exchanges(df) <= 2  # (doc,dim) agg + doc agg


def test_line_level_dedup_digest_keyed_and_staged_once(spark, sf_dir):
    """Line generation is map-only; the ONLY shuffles are the digest df
    census, the digest join back, and the doc-keyed reassembly — no
    cartesian, no global sort, and the line frame is staged ONCE
    (consumed by both the census and the join)."""
    from sparkstreaming_rawdataingestion_spark.operators import dedup

    df = dedup.q_dedup_line_level(spark, sf_dir)
    p = plans.executed_plan(df)
    assert "CartesianProduct" not in p
    assert "rangepartitioning" not in p
    assert "Python" not in p
    assert p.count("InMemoryRelation") >= 1  # staged line frame
    # one source scan materialized once into the staged frame
    assert p.count("Scan parquet") == p.count("InMemoryRelation")


def test_pii_redact_map_only(spark, sf_dir):
    """The scrub is a pure projection over the scan: ZERO exchanges, no
    joins, no Python — the embarrassingly parallel shape its docstring
    promises for a 100 TB pass."""
    from sparkstreaming_rawdataingestion_spark.operators import validation

    df = validation.QUERIES["pii_redact_text"](spark, sf_dir)
    p = plans.executed_plan(df)
    assert plans.count_exchanges(df) == 0
    assert "Join" not in p
    assert "Python" not in p


def test_dsir_model_table_join_no_global_sort(spark, sf_dir):
    """DSIR scores via the vocabulary-sized model table joined back on
    the token key: no cartesian over data tables (the totals crossJoin
    is a broadcast 1-row frame), no global sort, no Python, and the tf
    frame is staged so the model derives from the cache, not a second
    corpus scan. (tc stages on top of staged tf, so plan-STRING counts
    reprint — pin properties, not counts.)"""
    from sparkstreaming_rawdataingestion_spark.operators import mining

    df = mining.QUERIES["dsir_importance_weights"](spark, sf_dir)
    p = plans.executed_plan(df)
    assert "CartesianProduct" not in p
    assert "rangepartitioning" not in p
    assert "Python" not in p
    assert p.count("InMemoryRelation") >= 1  # staged tf/model frames


def test_ccnet_buckets_sampled_window_and_broadcast_cuts(spark, sf_dir):
    """The rank window runs over the hash SAMPLE only; cutpoints join
    back as a broadcast; no data-table cartesian, no Python. (Nested
    staged frames reprint cached children in the plan string — pin
    properties, not counts.)"""
    from sparkstreaming_rawdataingestion_spark.operators import mining

    df = mining.QUERIES["ccnet_perplexity_buckets"](spark, sf_dir)
    p = plans.executed_plan(df)
    assert "CartesianProduct" not in p
    assert "Python" not in p
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p
    assert p.count("InMemoryRelation") >= 1


def test_source_overlap_pairs_explode_map_side(spark, sf_dir):
    """The pair matrix comes from per-digest source SETS exploded
    map-side, never a digest-keyed self-join of presence rows, and the
    totals join back broadcast: no SortMergeJoin, no cartesian, no
    Python anywhere."""
    from sparkstreaming_rawdataingestion_spark.operators import dedup

    df = dedup.QUERIES["source_overlap_matrix"](spark, sf_dir)
    p = plans.executed_plan(df)
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p
    assert "Python" not in p
    assert "BroadcastHashJoin" in p


def test_int8_report_single_vec_keyed_shuffle(spark, sf_dir):
    """amax folds map-side inside the array; the ONLY shuffle is the
    vec-keyed error aggregation — no joins, no Python, one exchange."""
    from sparkstreaming_rawdataingestion_spark.operators import similarity

    df = similarity.QUERIES["embedding_int8_report"](spark, sf_dir)
    p = plans.executed_plan(df)
    assert plans.count_exchanges(df) == 1
    assert "Join" not in p
    assert "Python" not in p


def test_pass_at_k_single_task_aggregation(spark, sf_dir):
    """pass@k is ONE grouped pass over events; the k-fold product is
    per-row map work on the tasks-sized table — one exchange, no joins,
    no Python."""
    from sparkstreaming_rawdataingestion_spark.operators import evaluation

    df = evaluation.QUERIES["eval_pass_at_k"](spark, sf_dir)
    p = plans.executed_plan(df)
    assert plans.count_exchanges(df) == 1
    assert "Join" not in p
    assert "Python" not in p


def test_incremental_census_digest_keyed_only(spark, sf_dir):
    """The census shuffles (source, sha, count) triples only: the
    per-digest aggregation, the first-seen aggregation, ONE digest join
    and the sources-sized reduce — text never travels past the initial
    digest projection, no sort, no cartesian, no Python."""
    from sparkstreaming_rawdataingestion_spark.operators import dedup

    df = dedup.QUERIES["dedup_incremental_census"](spark, sf_dir)
    p = plans.executed_plan(df)
    assert "rangepartitioning" not in p
    assert "CartesianProduct" not in p
    assert "Python" not in p
    assert plans.count_exchanges(df) <= 4
    # text is consumed by sha2 directly above the scan and never rides
    # any other operator (shuffle, join, aggregate output): every plan
    # line mentioning the column is either the digest projection or the
    # scan itself
    for ln in p.splitlines():
        if "text#" in ln:
            assert "sha2(" in ln or "FileScan" in ln, ln


def test_semantic_decon_eval_side_broadcasts(spark, sf_dir):
    """The decon contract at 100 TB: the 100 TB train scan never
    shuffles. Centroids broadcast into the (staged) assignment; the
    benchmark-sized eval side broadcasts into the cluster-keyed pair
    join — so the pair join is a BroadcastHashJoin, and the only
    nested-loop broadcast is the K-row centroid fanout inside the
    staged assignment subtree (textual count == InMemoryRelation count,
    the round-7 plan-string lesson)."""
    from sparkstreaming_rawdataingestion_spark.operators import dedup

    df = dedup.q_decontamination_semantic_pairs(spark, sf_dir)
    p = plans.executed_plan(df)
    assert "CartesianProduct" not in p
    assert p.count("BroadcastNestedLoopJoin") == p.count("InMemoryRelation")
    assert p.count("InMemoryRelation") >= 1
    assert "BroadcastHashJoin" in p  # eval side broadcast, map-side pair join
    assert "SortMergeJoin" not in p  # nothing shuffles on cluster_id


def test_greedy_tokenizer_is_a_pure_map(spark, sf_dir):
    """The subword encoder's 100 TB contract: ONE scan, per-split
    Arrow-batched Python, and nothing else — no exchange, no join, no
    aggregation. Token counting must never shuffle the corpus."""
    from sparkstreaming_rawdataingestion_spark.operators import text

    df = text.q_tokenizer_greedy_subword(spark, sf_dir)
    p = plans.executed_plan(df)
    assert plans.count_exchanges(df) == 0
    assert "Join" not in p
    assert p.count("Scan parquet") == 1
    assert "MapInPandas" in p or "mapInPandas" in p.lower()


def test_image_dhash_pair_join_is_band_keyed(spark, sf_dir):
    """The image near-dup contract at scale: the hash is a pure-map
    stage (staged ONCE, feeding both candidate legs and both verify
    legs), candidates come from an EQUI-join on (band_idx, band_val) —
    the pigeonhole discipline, never n² — and nothing in the plan is a
    cartesian or nested-loop broadcast."""
    from sparkstreaming_rawdataingestion_spark.operators import multimodal

    df = multimodal.q_multimodal_image_dhash_pairs(spark, sf_dir)
    p = plans.executed_plan(df)
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert p.count("InMemoryRelation") >= 1  # staged band frame
    assert "SortMergeJoin" in p or "ShuffledHashJoin" in p or (
        "BroadcastHashJoin" in p
    )


def test_subword_budget_is_scan_fused_plus_one_window(spark, sf_dir):
    """The carry pattern's payoff: the encoder rides the scan stage (no
    re-join against documents), so the whole budget operator is ONE
    scan + ONE per-source window exchange — identical plan shape to
    the word-budget op, with the tokenizer fused in."""
    from sparkstreaming_rawdataingestion_spark.operators import layout

    df = layout.q_tokens_budget_subword(spark, sf_dir)
    p = plans.executed_plan(df)
    assert "Join" not in p
    assert p.count("Scan parquet") == 1
    assert plans.count_exchanges(df) == 1  # the per-source window


def test_multiprobe_decon_train_scan_assigned_once_eval_broadcast(
    spark, sf_dir
):
    """The recall upgrade must cost eval-set work, not corpus work:
    ONE staged corpus assignment feeds both legs (the only nested-loop
    broadcast is the centroid fanout inside that cached subtree —
    textual BNLJ count == InMemoryRelation count, exactly one distinct
    staged frame), the TRAIN leg filters back to its home cluster
    (rk = 1 visible in the logical plan — a regression that fans the
    corpus side out probes-times would drop that filter and
    double-count pairs), and the pair join stays a BroadcastHashJoin
    on cluster_id with the eval side broadcast — the corpus never
    shuffles."""
    from sparkstreaming_rawdataingestion_spark.operators import dedup

    df = dedup.q_decontamination_semantic_multiprobe(spark, sf_dir)
    p = plans.executed_plan(df)
    assert "CartesianProduct" not in p
    assert p.count("BroadcastNestedLoopJoin") == p.count("InMemoryRelation")
    assert p.count("InMemoryRelation") >= 1  # the ONE staged assignment
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    import re

    logical = plans.analyzed_plan(df)
    # train leg pinned to the home cluster; eval leg keeps the probe
    # fan-out (rk <= SEMDECON_PROBES inside the shared staged kernel)
    assert re.search(r"NOT is_eval#\d+ AND \(rk#\d+ = 1\)", logical)
    assert re.search(r"rk#\d+ <= 2", logical)


def test_piece_frequencies_single_piece_keyed_exchange(spark, sf_dir):
    """The census's only shuffle is the final piece-keyed aggregation
    (key space bounded by |vocab| + unknown chars): encoder pure-map,
    per-batch Counter pre-aggregation, one scan, no join."""
    from sparkstreaming_rawdataingestion_spark.operators import text

    df = text.q_tokenizer_piece_frequencies(spark, sf_dir)
    p = plans.executed_plan(df)
    assert "Join" not in p
    assert p.count("Scan parquet") == 1
    assert plans.count_exchanges(df) == 1


def test_bpe_trainer_stages_are_pure_jvm(spark, sf_dir):
    """The trainer's 100 TB contract: the corpus is scanned exactly
    once (the word-frequency groupBy); every per-iteration stage —
    pair explode, pair-keyed aggregation, merge fold — is built-in
    column algebra with NO Python evaluation anywhere (the fold is
    F.aggregate, not a UDF), so the vocab-scale loop rides whole-stage
    codegen end to end."""
    from sparkstreaming_rawdataingestion_spark import catalog
    from sparkstreaming_rawdataingestion_spark.operators import text

    d = catalog.load_table(spark, sf_dir, "documents")
    pieces = text._bpe_word_pieces(d)
    step = text._bpe_apply_merge(text._bpe_word_pieces(d), "e", "r")
    for df in (text._bpe_pair_counts(pieces), step):
        p = plans.executed_plan(df)
        assert "Scan parquet" in p and p.count("Scan parquet") == 1
        assert "Join" not in p
        for py in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert py not in p
    # word-count agg + pair agg: exactly two key exchanges, both over
    # vocab-scale keys, never corpus rows
    assert plans.count_exchanges(text._bpe_pair_counts(pieces)) == 2


def test_bpe_roundtrip_encode_is_a_pure_map(spark, sf_dir):
    """The roundtrip's encode pass inherits the greedy tokenizer's
    plan shape: one scan, Arrow-batched map, zero exchanges — the
    learned vocab rides in by closure, never by join."""
    from sparkstreaming_rawdataingestion_spark.operators import text

    df = text.q_tokenizer_bpe_roundtrip(spark, sf_dir)
    p = plans.executed_plan(df)
    assert plans.count_exchanges(df) == 0
    assert "Join" not in p
    assert p.count("Scan parquet") == 1
    assert "MapInPandas" in p


def test_audio_fingerprint_pair_join_is_band_keyed(spark, sf_dir):
    """The audio near-dup contract mirrors the image one (the pair
    stage IS dhash_band_pairs): fingerprint pure-map and staged once,
    candidates from the (band_idx, band_val) equi-join, no cartesian
    or nested-loop broadcast anywhere."""
    from sparkstreaming_rawdataingestion_spark.operators import multimodal

    df = multimodal.q_multimodal_audio_fingerprint_pairs(spark, sf_dir)
    p = plans.executed_plan(df)
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert p.count("InMemoryRelation") >= 1  # staged band frame
    assert "SortMergeJoin" in p or "ShuffledHashJoin" in p or (
        "BroadcastHashJoin" in p
    )


def test_semantic_build_plan_is_truncated_and_jvm_side(spark, sf_dir):
    """The semantic training build's scale contract: no cartesian, no
    Python eval anywhere (kmeans assignment, cosine pairs, components
    and the mix tail are all column algebra), the only nested-loop
    broadcast is the K-row centroid fanout, and the CC drop list
    enters the mix tail as a TRUNCATED plan leaf (Scan ExistingRDD —
    the measured fix for the iterative-lineage logical-tree blowup:
    thousands of cache-scan references → a handful)."""
    from sparkstreaming_rawdataingestion_spark.operators import pipeline

    df = pipeline.q_pipeline_training_build_semantic(spark, sf_dir)
    p = plans.executed_plan(df)
    assert "CartesianProduct" not in p
    for py in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert py not in p
    assert p.count("BroadcastNestedLoopJoin") == 1  # centroid fanout
    assert p.count("Scan ExistingRDD") >= 1  # truncated drop list
    assert p.count("InMemoryRelation") < 200  # the blowup stays fixed


def test_compression_report_one_exchange_no_rejoin(spark, sf_dir):
    """The carry pattern's payoff, third instance: source and n_chars
    ride the encode batch, so the whole report is the encode pure-map
    plus ONE source-keyed exchange — no join back to documents."""
    from sparkstreaming_rawdataingestion_spark.operators import text

    df = text.q_tokenizer_compression_report(spark, sf_dir)
    p = plans.executed_plan(df)
    assert "Join" not in p
    assert p.count("Scan parquet") == 1
    assert plans.count_exchanges(df) == 1
    assert "MapInPandas" in p


# ---------------------------------------------------------------------------
# round-11 pins
# ---------------------------------------------------------------------------


def test_bpe_delta_step_stays_jvm_and_narrow(spark, sf_dir):
    """The incremental trainer's per-step scale contract: the in-place
    conditional merge rewrite adds NO exchange beyond the word-count
    aggregation (narrow map over the cached word table), the ±pair
    delta leg likewise explodes map-side, and neither evaluates any
    Python — the whole loop body is column algebra."""
    from pyspark.sql import functions as F

    from sparkstreaming_rawdataingestion_spark import catalog, session
    from sparkstreaming_rawdataingestion_spark.operators import text

    # a staged word table left by an earlier registry test would be
    # cache-substituted into this plan, and InMemoryRelation's repr
    # re-prints its cached child's Exchange — drop staging first so
    # the exchange count reads the bare plan
    session.release_staged()
    d = catalog.load_table(spark, sf_dir, "documents")
    pieces = text._bpe_word_pieces(d)
    pred = text._adjacent_pair_pred("e", "r")
    fold = text._bpe_merge_fold("e", "r")
    rewrite = pieces.select(
        "cnt", F.when(pred, fold).otherwise(F.col("pieces")).alias("pieces")
    )
    delta = (
        pieces.where(pred)
        .select(
            F.explode(
                F.concat(
                    text._bpe_pair_deltas(F.col("pieces"), -1),
                    text._bpe_pair_deltas(fold, +1),
                )
            ).alias("pr")
        )
        .select("pr.lhs", "pr.rhs", F.col("pr.c").alias("c"))
    )
    for df in (rewrite, delta):
        p = plans.executed_plan(df)
        assert plans.count_exchanges(df) == 1  # the word-count agg only
        assert "Join" not in p
        for py in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert py not in p


def test_audio_window_prints_pure_map_and_band_keyed_match(spark, sf_dir):
    """Windowed audio fingerprints: synth + decode + per-hop prints are
    one zero-exchange Arrow map chain (rows grow with DURATION, never
    pairwise); the clip matcher's candidates come from the band
    equi-join — no cartesian, no nested-loop broadcast."""
    from sparkstreaming_rawdataingestion_spark.operators import multimodal

    prints = multimodal.audio_windowed_fingerprint_bands(
        multimodal.synthesize_afpw_media(spark, sf_dir)
    )
    p = plans.executed_plan(prints)
    assert plans.count_exchanges(prints) == 0
    assert "Join" not in p
    assert p.count("Scan parquet") == 1

    df = multimodal.q_multimodal_audio_window_matches(spark, sf_dir)
    p = plans.executed_plan(df)
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert p.count("InMemoryRelation") >= 1  # staged print frame
    assert (
        "SortMergeJoin" in p
        or "ShuffledHashJoin" in p
        or "BroadcastHashJoin" in p
    )


def test_portable_pq_is_jvm_with_broadcast_lut(spark, sf_dir):
    """The portable PQ twin keeps the production ADC shape: zero
    Python evaluation (integer folds are F.aggregate), the per-query
    LUT and query norms reach the search side by BROADCAST (the
    corpus-sized leg never shuffles float arrays), and nothing goes
    cartesian."""
    from sparkstreaming_rawdataingestion_spark.operators import similarity

    df = similarity.q_similarity_pq_portable_topk(spark, sf_dir)
    p = plans.executed_plan(df)
    for py in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert py not in p
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p


def test_audio_window_alignment_shares_the_band_join_shape(spark, sf_dir):
    """The alignment vote inherits the matcher's plan: staged print
    frame, band equi-join candidates, no cartesian or nested-loop
    broadcast; the added offset vote is two bounded aggregations."""
    from sparkstreaming_rawdataingestion_spark.operators import multimodal

    df = multimodal.q_multimodal_audio_window_alignment(spark, sf_dir)
    p = plans.executed_plan(df)
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert p.count("InMemoryRelation") >= 1  # staged print frame
    assert (
        "SortMergeJoin" in p
        or "ShuffledHashJoin" in p
        or "BroadcastHashJoin" in p
    )


def test_audio_window_clusters_loop_on_pair_graph_only(spark, sf_dir):
    """The windowed canonical selection inherits the ladder contract:
    band-join candidates (no cartesian / nested-loop broadcast), and
    the component loop's output enters as a bounded structure over the
    clip PAIR graph, never the corpus."""
    from sparkstreaming_rawdataingestion_spark.operators import multimodal

    df = multimodal.q_multimodal_audio_window_dedup_clusters(spark, sf_dir)
    p = plans.executed_plan(df)
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_asym_containment_band_keyed_no_cartesian(spark, sf_dir):
    """The asymmetric probe inherits the windowed matcher's plan
    contract: the dense hop-1 probe prints and hop-16 archive prints
    are zero-exchange Arrow maps off ONE staged synth frame, candidates
    come from the band equi-join (no cartesian / nested-loop
    broadcast), and the frame-offset vote is two bounded aggregations."""
    from sparkstreaming_rawdataingestion_spark.operators import multimodal

    df = multimodal.q_multimodal_audio_asym_containment(spark, sf_dir)
    p = plans.executed_plan(df)
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert p.count("InMemoryRelation") >= 1  # staged synth frame
    assert (
        "SortMergeJoin" in p
        or "ShuffledHashJoin" in p
        or "BroadcastHashJoin" in p
    )


def test_bpe_batched_round_is_single_action_pure_jvm(spark):
    """One batched round's maintained pair-table frame: pure JVM (no
    Python eval anywhere in the delta/fold chain) and exactly one
    exchange (the pair-keyed aggregation) — the K=1 plan pin carried
    to the multi-rule kernels."""
    from pyspark.sql import functions as F

    from sparkstreaming_rawdataingestion_spark import session
    from sparkstreaming_rawdataingestion_spark.operators.text import (
        _bpe_multi_merge_fold,
        _bpe_multi_pair_pred,
        _bpe_pair_counts,
        _bpe_pair_deltas,
        _bpe_word_pieces,
    )

    session.release_staged()
    docs = spark.createDataFrame(
        [(0, "ab ab cd cd ef")], "doc_id long, text string"
    )
    pieces = _bpe_word_pieces(docs).localCheckpoint()
    rules = [("a", "b"), ("c", "d")]
    pred = _bpe_multi_pair_pred(rules)
    fold = _bpe_multi_merge_fold(rules)
    delta = (
        pieces.where(pred)
        .select(
            F.explode(
                F.concat(
                    _bpe_pair_deltas(F.col("pieces"), -1),
                    _bpe_pair_deltas(fold, +1),
                )
            ).alias("pr")
        )
        .select("pr.lhs", "pr.rhs", F.col("pr.c").alias("c"))
    )
    # the loop keeps the carried pair table as a checkpoint LEAF, so a
    # round adds exactly one exchange (the pair-keyed aggregation)
    pc0 = _bpe_pair_counts(pieces).localCheckpoint()
    pc = (
        pc0.unionAll(delta)
        .groupBy("lhs", "rhs")
        .agg(F.sum("c").alias("c"))
        .where(F.col("c") != 0)
    )
    p = plans.executed_plan(pc)
    for py in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert py not in p
    assert "Join" not in p
    assert plans.count_exchanges(pc) == 1


def test_countmin_portable_pure_jvm_bounded_aggregations(spark, sf_dir):
    """The portable count-min twin: zero Python evaluation, no
    cartesian/nested-loop anywhere except the 1-row mergeability
    scalar broadcast; counter tables are bounded (d x w cells) so
    every aggregation after the scan is small."""
    from sparkstreaming_rawdataingestion_spark.operators import stats

    df = stats.q_sketch_countmin_portable(spark, sf_dir)
    p = plans.executed_plan(df)
    for py in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert py not in p
    assert "CartesianProduct" not in p


def test_subframe_containment_band_keyed_no_cartesian(spark, sf_dir):
    """The sub-frame matcher inherits the asymmetric plan contract:
    sample-hop probe prints and compact archive prints are
    zero-exchange Arrow maps off ONE staged synth frame, candidates
    come from the band equi-join (no cartesian / nested-loop
    broadcast), the energy witnesses ride the same verify joins (no
    extra scan), and the sample-offset vote is two bounded
    aggregations."""
    from sparkstreaming_rawdataingestion_spark.operators import multimodal

    df = multimodal.q_multimodal_audio_subframe_containment(spark, sf_dir)
    p = plans.executed_plan(df)
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert p.count("InMemoryRelation") >= 1  # staged synth frame
    assert (
        "SortMergeJoin" in p
        or "ShuffledHashJoin" in p
        or "BroadcastHashJoin" in p
    )


def test_quantile_portable_pure_jvm_bounded_grid(spark, sf_dir):
    """The portable quantile twin: zero Python evaluation anywhere;
    the only nested-loop joins are the bounded broadcast grid lookups
    (101 rows x the distinct-score histogram) and the 1-row
    array/census broadcasts — never a corpus-sized cartesian; the
    full-table work is one grouped histogram plus one bounded
    per-source window."""
    from sparkstreaming_rawdataingestion_spark import session
    from sparkstreaming_rawdataingestion_spark.operators import signals

    session.release_staged()
    df = signals.q_quantile_normalize_portable(spark, sf_dir)
    p = plans.executed_plan(df)
    for py in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert py not in p
    assert "CartesianProduct" not in p


def test_portable_ivf_broadcast_bounded_no_cartesian(spark, sf_dir):
    """The portable IVF twin: zero Python evaluation; the centroid
    table and the query panel ride broadcasts (the exact-leg fanout is
    the bounded N_QUERIES panel, never corpus x corpus); the search
    join is the cluster_id equi-join over the probed lists — no
    CartesianProduct anywhere."""
    from sparkstreaming_rawdataingestion_spark import session
    from sparkstreaming_rawdataingestion_spark.operators import similarity

    session.release_staged()
    df = similarity.q_similarity_ivf_portable_topk(spark, sf_dir)
    p = plans.executed_plan(df)
    for py in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert py not in p
    assert "CartesianProduct" not in p


def test_portable_bloom_pure_jvm_bounded_words(spark, sf_dir):
    """The portable Bloom twin: zero Python evaluation; the bitset is
    a bounded word aggregation (<= BLM_WORDS rows, bit_or map-side
    combinable); the probe joins a broadcast word table; everything
    after the two distinct-key scans is 1-row or word-bounded — no
    cartesian beyond the 1-row census broadcasts."""
    from sparkstreaming_rawdataingestion_spark import session
    from sparkstreaming_rawdataingestion_spark.operators import stats

    session.release_staged()
    df = stats.q_sketch_bloom_portable(spark, sf_dir)
    p = plans.executed_plan(df)
    for py in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert py not in p
    assert "CartesianProduct" not in p


def test_portable_mg_pure_jvm_bounded_summary(spark, sf_dir):
    """The portable Misra-Gries twin: zero Python evaluation; (item,
    shard) derive map-side from integer hashes; the per-shard rank
    window is shard-partitioned (parallel) and the only global window
    ranks <= S*K merged partials — constant-size; stats/heavies ride
    1-row broadcasts, no corpus-sized cartesian."""
    from sparkstreaming_rawdataingestion_spark import session
    from sparkstreaming_rawdataingestion_spark.operators import stats

    session.release_staged()
    df = stats.q_sketch_mg_portable_heavyhitters(spark, sf_dir)
    p = plans.executed_plan(df)
    for py in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert py not in p
    assert "CartesianProduct" not in p


def test_rational_containment_band_keyed_no_cartesian(spark, sf_dir):
    """The rational (4/3 ZOH) rung inherits the sub-frame plan
    contract unchanged: one staged synth frame, band equi-join
    candidates (no cartesian / nested-loop broadcast), witness verify
    joins, bounded vote aggregations — the rational offset map is
    map-side integer arithmetic only."""
    from sparkstreaming_rawdataingestion_spark.operators import multimodal

    df = multimodal.q_multimodal_audio_rational_containment(
        spark, sf_dir
    )
    p = plans.executed_plan(df)
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_decimated_containment_band_keyed_no_cartesian(spark, sf_dir):
    """The decimated rung inherits the sub-frame plan contract
    unchanged: one staged synth frame, band equi-join candidates (no
    cartesian / nested-loop broadcast), witness verify joins, bounded
    vote aggregations — the probe frame size and offset rate are
    map-side arithmetic only."""
    from sparkstreaming_rawdataingestion_spark.operators import multimodal

    df = multimodal.q_multimodal_audio_decimated_containment(
        spark, sf_dir
    )
    p = plans.executed_plan(df)
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert p.count("InMemoryRelation") >= 1
