"""Benchmark harness — times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Each query is executed once for warm-up-free wall time after a shared
session warm-up query (JVM + codegen caches); timing covers plan build +
execution + a count-style materialization (no driver collect of payloads).

Methodology change (round 3): the query registry now releases each
query's persisted staging when the NEXT query starts (session.stage /
release_staged), so a timed run pays its own staging cost — shingle-set
materialization, edge-list caches, staged aggregates. Rounds 1-2
under-reported queries that use stage(): their untimed warm-up run left
its caches behind and the timed run read them, so e.g.
dedup_minhash_lsh_pairs' r2 "4.1 s" measured only the post-staging
fraction. r3 numbers are the honest end-to-end per-query cost; the
staging-heavy entries (dedup_*, pipeline_curation,
graph_pagerank_authority, tpch q15) regress on paper for that reason,
not because the plans got slower.

Minhash floor experiment (round 4, verdict item 6): collapsing the 64
``transform``+``array_min`` signature passes into ONE ``aggregate`` +
``zip_with`` min-tracking pass was measured at sf0.1 — 4.46 s warm vs
2.91 s warm for the current form (identical signatures). The nested
lambda forces interpreted evaluation of the whole accumulator update,
while 64 independent transforms stay in codegen; fewer/wider bands
(8×8) are off the table because candidate recall at s=0.8 drops to
0.77 and the query must match its exact oracle. The 16×4 + 64-transform
formulation therefore stands as the measured floor.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: flagship ingest + the heaviest representative of each
# operator family. Extended as families land.
HEADLINE = [
    "ingest_normalize",
    "ingest_idempotency",
    "datapoint_day_rollup",
    "agg_pricing_summary",
    "join_fact_fact_revenue",
    "join_broadcast_dims",
    "window_topk_per_group",
    "asof_join_purchase_click",
    "set_operations",
    "dedup_exact_hash",
    "dedup_minhash_lsh_pairs",
    "similarity_topk_bruteforce",
    "text_quality_score",
    "pipeline_curation",
    "multimodal_decode_meta",
    "q5_regional_revenue",
    "q10_returned_items",
    "q3_shipping_priority",
    "q8_market_share",
    "q18_large_orders",
    "q21_waiting_supplier",
    "cdc_latest_per_key",
    "window_frames_pack",
    "downsample_gapfill",
    # consolidated family packs (round 2): each executes a whole operator
    # family in one plan — the heavy representatives of the core window
    "window_functions_pack",
    "scalar_semistructured_pack",
    "join_strategies_pack",
    "text_analysis_pack",
    "streaming_window_pack",
    "dedup_ngram_jaccard_pairs",
    # round-2 session additions: real codec round trip, iterative graph,
    # row-level sessionization, TPC-H scalar-concentration shape
    "multimodal_png_roundtrip",
    "graph_pagerank_authority",
    "sessionize_events",
    "q11_part_value_concentration",
    # round-3 additions: SCD2 history rebuild, one-pass profiling,
    # recursive-CTE closure, deterministic training-mix sampling,
    # containment near-dup, per-key KS distribution drift
    "scd2_dimension_history",
    "table_profile",
    "recursive_event_chains",
    "stratified_sample",
    "dedup_containment_pairs",
    "distribution_drift_ks",
    # round-4 additions: ordered-funnel completion, cohort retention,
    # watermark-sizing lateness audit, OHLC downsampling, BM25 retrieval,
    # blocked edit-distance entity resolution, MERGE-semantics upsert,
    # triangle counting over the co-supply graph
    "funnel_pattern_match",
    "retention_cohorts",
    "event_lateness_audit",
    "ohlc_downsample",
    "bm25_keyword_search",
    "string_similarity_join_brand",
    "merge_upsert_apply",
    "graph_triangle_count",
    "timeseries_twap",
    "upsample_interpolate",
    "numeric_histogram",
    "growth_accounting",
    # round-4 mining batch: basket co-occurrence, PSI drift, corpus-LM
    # scoring, sequential-recurrence EWMA (the applyInPandas kernel),
    # deterministic epoch-shuffle layout
    "market_basket_pairs",
    "psi_drift",
    "unigram_logprob_quality",
    "ewma_smoothing",
    "training_shuffle_order",
    # warehouse/behavioral batch: windowed last-touch attribution,
    # snapshot reconciliation diff, wedge-join link prediction
    "attribution_last_touch",
    "snapshot_diff",
    "graph_common_neighbors",
    # compressed-index ANN: PQ codebook training + ADC + exact re-rank
    "similarity_topk_pq",
    # hashing-trick document vectors (codegen char fold, no vocabulary)
    "feature_hash_embedding",
    # feature-engineering block: lag/rolling features, LOO target
    # encoding, percent-rank normalization, path trigrams
    "ml_lag_features",
    "target_encode_loo",
    "event_path_trigrams",
    # data-derived training-mix rates (vs stratified_sample's fixed recipe)
    "temperature_mix_sample",
    # the full dataset build: curation → mix → shuffle manifest
    "pipeline_training_build",
    # exact-k balanced stratum sampling (WindowGroupLimit)
    "sample_exact_k_per_group",
    # segmentation/concentration batch: RFM quintiles over the customer
    # rollup, exact-cents Pareto share, ratio-to-report allocation,
    # Gini/entropy/HHI, sequential CUSUM (applyInPandas recurrence)
    "rfm_segmentation",
    "pareto_revenue_share",
    "allocation_proportional",
    "concentration_metrics",
    "cusum_changepoint",
    # trend/experiment/signal batch: calendar-join growth, KM survival,
    # cross-source quantile normalization, burst debouncing, portable
    # SimHash (per-char fold), fractional attribution, curriculum layout
    "period_over_period",
    "survival_km_curve",
    "quantile_normalize_sources",
    "debounce_events",
    "dedup_simhash_portable_pairs",
    "attribution_linear",
    "geo_revenue_shares",
    "curriculum_interleave",
    # robust trends (bounded O(k²) pair join), sweep-line backlog,
    # deterministic negative sampling
    "theil_sen_trend",
    "concurrent_intervals_timeline",
    "contrastive_negative_pairs",
    # model-evaluation suite: one-pass confusion tableau, exact
    # Mann-Whitney AUC (the honest global-sort cost, documented)
    "classifier_eval_metrics",
    "ranking_auc_report",
]


def main() -> None:
    from sparkstreaming_rawdataingestion_spark.queries import all_queries
    from sparkstreaming_rawdataingestion_spark.session import get_spark

    spark = get_spark(app_name="bench")
    registry = all_queries()
    names = [n for n in HEADLINE if n in registry]
    # optional extra names from argv
    names += [n for n in sys.argv[1:] if n in registry and n not in names]

    # warm-up: touch the IO + codegen paths once
    registry[names[0]](spark, SF_DIR).limit(1).count()

    warm_runs = int(os.environ.get("SPARK_GRAFT_BENCH_WARM", "1"))

    def run_once(name: str) -> float:
        t0 = time.perf_counter()
        df = registry[name](spark, SF_DIR)
        # force full execution without shipping payload rows to the driver
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    timings: dict[str, float] = {}
    for name in names:
        for _ in range(warm_runs):  # JIT/codegen warm-up, not timed
            run_once(name)
        timings[name] = round(run_once(name), 3)

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
