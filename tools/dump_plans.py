"""Regenerate PLANS.md — formatted physical plans for the queries whose
scale-critical properties ARCHITECTURE.md claims (pushdown, broadcast,
top-k, shuffle-free ingest, as-of merge).

Usage: python tools/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

PICKS = {
    "filter_project_pushdown": (
        "Predicate pushdown + column pruning: filters and the 7-column "
        "ReadSchema reach the parquet scan."
    ),
    "join_broadcast_dims": (
        "Dimension joins broadcast; the customer scan never shuffles for "
        "the join."
    ),
    "topk_global": (
        "ORDER BY + LIMIT runs TakeOrderedAndProject (per-partition "
        "heaps), never a full sort."
    ),
    "ingest_normalize": (
        "The reference pipeline itself: a single whole-stage-codegen map "
        "pipeline (the only exchange below comes from the test fixture's "
        "message wrap, not the engine path)."
    ),
    "asof_join_purchase_click": (
        "Union-merge as-of join: one hash exchange on the key + window; "
        "no nested-loop, no cartesian product."
    ),
    "q6_forecast_revenue": (
        "TPC-H Q6: all four predicates pushed to the parquet scan; "
        "partial+final agg, nothing else."
    ),
    "q18_large_orders": (
        "TPC-H Q18: the HAVING key set broadcasts into a left-semi join "
        "ahead of the fact-fact join."
    ),
    "lateral_topk_per_group": (
        "LATERAL correlated top-k decorrelates to WindowGroupLimit — "
        "never a per-outer-row subquery."
    ),
    "pipeline_curation": (
        "Curation funnel: langid+quality fused into the scan stage; "
        "near-dup verify shuffles (id,id,count) triples, not arrays."
    ),
    "text_tfidf_topterms": (
        "TF-IDF: df/N sides broadcast back onto the tf stream; per-doc "
        "top-3 rides WindowGroupLimit."
    ),
    "dedup_minhash_lsh_pairs": (
        "MinHash-LSH: map-only signature projection (no explode/agg), "
        "banded equi-join candidates, count-based verification — no "
        "shingle array in any exchange after the index build."
    ),
    "window_functions_pack": (
        "Eleven window functions over two orderings of the same partition "
        "key: ONE exchange on user_id feeds every Window operator."
    ),
    "q11_part_value_concentration": (
        "TPC-H Q11: staged per-part aggregate feeds detail rows AND the "
        "scalar total from InMemoryTableScan — one fact scan, 1-row "
        "scalar broadcast."
    ),
    "sessionize_events": (
        "Row-level sessionization: lag + running-sum share one window "
        "spec — a single hash exchange on user_id, local sorts only."
    ),
    "layout_zorder_key": (
        "Morton interleave is pure shift/and/or inside whole-stage "
        "codegen — a map-only stage, zero exchanges."
    ),
    "graph_pagerank_authority": (
        "Fixed-point PageRank: staged edge list + one exploded "
        "aggregation for both degree vectors; each superstep is a "
        "node-sized rank-degree join plus one shuffle of (dst, bigint) "
        "contributions."
    ),
    "scd2_dimension_history": (
        "SCD2 reconstruction: lag, row_number and lead all share ONE "
        "(user_id × time) exchange and sort — history rebuild is a "
        "single shuffle."
    ),
    "timeseries_anomaly_zscore": (
        "Z-score outliers: per-key moments are one tiny aggregate "
        "broadcast back over the raw scan — no window over the full "
        "table, no second shuffle."
    ),
    "table_profile": (
        "Per-column profiling: every metric for every column in ONE wide "
        "aggregation over one scan; the per-column reshape is a map-side "
        "melt of a 1-row result."
    ),
    "salted_join_equivalence": (
        "Skew-safe join: the hot key is salted N ways, the small side "
        "replicated per salt — the plan shows the salted key in the "
        "exchange, and the result hash-matches the plain join."
    ),
    "stratified_sample": (
        "Training-mix sampling: a pure filter on the scan (overflow-safe "
        "multiplicative hash) — map-only, no shuffle, embarrassingly "
        "parallel."
    ),
    "distribution_drift_ks": (
        "KS drift: both empirical CDFs from ONE range-framed window "
        "partitioned by the drift key (per-key local sorts, no global "
        "sort), sup taken by a plain max aggregation."
    ),
    "multimodal_png_roundtrip": (
        "Real PNG decode: two Arrow-batched map stages (encode, decode) "
        "over input splits — zero shuffles, parallelism = splits."
    ),
    "funnel_pattern_match": (
        "Ordered funnel: three grouped mins chained on the SAME user_id "
        "key — the stage joins are node-sized (one row per qualifying "
        "user), never a per-user event-array sort."
    ),
    "event_lateness_audit": (
        "Lateness audit: one per-user window over arrival order plus a "
        "grouped agg on the same key — per-key local sorts, the exchange "
        "is shared."
    ),
    "ohlc_downsample": (
        "OHLC: open/close via struct-min/max aggregates — ONE "
        "aggregation exchange on (series, bucket), no window, no "
        "per-bucket sort, deterministic under ts ties."
    ),
    "bm25_keyword_search": (
        "BM25: tf columns are size(filter()) expressions in the scan "
        "stage; corpus stats reduce to a 1-row broadcast; top-20 rides "
        "TakeOrderedAndProject."
    ),
    "string_similarity_join_brand": (
        "Blocked edit-distance join: hash equi-join on the brand "
        "blocking key; levenshtein runs only inside a block, after the "
        "length pre-filter."
    ),
    "skyline_pareto_brand": (
        "Skyline: two RANGE-framed window maxima share ONE (brand × "
        "cents) sort — the quadratic NOT-EXISTS semantics computed in a "
        "single per-key pass."
    ),
    "merge_upsert_apply": (
        "MERGE semantics: one keyed left join (the same shuffle a table "
        "format's MERGE does), CASE arms map-side, inserts unioned "
        "without a join."
    ),
    "graph_triangle_count": (
        "Triangles: staged oriented edge list feeds wedge join, closure "
        "probe and degree agg from InMemoryTableScan — three equi-joins, "
        "nothing quadratic in nodes."
    ),
    "winsorize_robust_scale": (
        "Winsorization: per-key exact percentiles in one grouped pass, "
        "broadcast back over the scan; clip + robust-z are map-side "
        "expressions."
    ),
    "timeseries_twap": (
        "TWAP: interval weights from one per-key lead window; weighted "
        "sums accumulate in DECIMAL — exact under any reduction order."
    ),
    "upsample_interpolate": (
        "Linear interpolation via union-merge: grid unioned into the "
        "stream, both neighbors from cumulative IGNORE-NULLS windows "
        "(the following-frame O(n²) trap avoided by a reversed "
        "ordering) — no range join anywhere."
    ),
    "numeric_histogram": (
        "Equi-width histogram: 1-row bounds broadcast, map-side bin "
        "arithmetic, one (key, bin) aggregation — no per-key sort."
    ),
    "market_basket_pairs": (
        "Basket co-occurrence: per-basket item sets staged once (one "
        "scan, one shuffle); pair enumeration is a map-side double "
        "explode bounded by per-basket item count — no self-join; item "
        "totals broadcast back."
    ),
    "psi_drift": (
        "PSI drift: reference bounds broadcast onto one binning pass; "
        "counts shuffle (series, cohort, bin) triples; the dense bin "
        "grid is generated, not scanned; DECIMAL-exact term sums."
    ),
    "weighted_sample_poisson": (
        "Weighted sampling: priority is a map-side expression on a "
        "2-column scan; selection is TakeOrderedAndProject (per-"
        "partition heaps) — no global sort, no shuffle of the corpus."
    ),
    "training_shuffle_order": (
        "Epoch shuffle layout: broadcast epoch fan-out, integer hash in "
        "codegen, rank INSIDE (epoch, bucket) partitions — parallel "
        "local sorts, never a single-partition global row_number."
    ),
    "unigram_logprob_quality": (
        "Corpus-LM scoring: two corpus passes total — the staged "
        "vocabulary-sized frequency table serves both the token join "
        "(broadcast) and the corpus total (cached sum)."
    ),
    "ewma_smoothing": (
        "EWMA recurrence: ONE exchange on the key feeding an Arrow "
        "FlatMapGroupsInPandas kernel — the declared sequential "
        "operator; keys process in parallel, state O(1) per key."
    ),
    "attribution_last_touch": (
        "Last-touch attribution: union-merge as-of (one per-user sorted "
        "window over touches+purchases), lookback guard map-side — no "
        "range join, no per-purchase probe."
    ),
    "snapshot_diff": (
        "Snapshot reconciliation: two keyed aggregates into ONE "
        "full-outer join (the MERGE shuffle); classification and column "
        "masks are map-side CASE arms; DECIMAL-exact compared measures."
    ),
    "graph_common_neighbors": (
        "Link prediction: staged oriented edges symmetrized map-side; "
        "wedge equi-join on the shared center (only distance-2 pairs "
        "materialize, hub centers degree-capped at 512 so no hot key "
        "owns the shuffle), anti-join drops adjacency, degrees "
        "broadcast from the UNCAPPED adjacency."
    ),
    "feature_hash_embedding": (
        "Feature hashing: the 31-polynomial char fold is an aggregate "
        "over the char array INSIDE codegen — no vocabulary join, no "
        "Python; one (doc, dim) aggregation after the explode."
    ),
    "ml_lag_features": (
        "Lag/rolling features: both window frames share ONE (user × "
        "time) exchange and sort; DECIMAL rolling sums keep mean/std "
        "exact under any partitioning."
    ),
    "target_encode_loo": (
        "LOO target encoding: category sums from one window over the "
        "category key, 1-row global prior broadcast, leave-one-out "
        "arithmetic map-side — no self-join, no per-row subquery."
    ),
    "event_path_trigrams": (
        "Path trigrams: two leads off one shared per-user sort; the "
        "count aggregates |types|³-bounded keys; top-k is "
        "TakeOrderedAndProject over that tiny aggregate."
    ),
    "temperature_mix_sample": (
        "Temperature mixing: |domains|-row rate table broadcast onto a "
        "single scan filter — embarrassingly parallel, no shuffle of "
        "the corpus."
    ),
    "similarity_topk_pq": (
        "PQ search: corpus side carries (id, m, code) triples only; ADC "
        "partials come from a broadcast query×M×K lookup table; exact "
        "re-rank touches just the shortlist."
    ),
    "pipeline_training_build": (
        "Dataset build: curation stages fused into the scan, survivor "
        "counts → broadcast mix rates, shuffle-rank only over the final "
        "kept set — each stage shrinks the next stage's input."
    ),
    "quantile_normalize_approx": (
        "Scale twin of the quantile normalizer: the global row_number "
        "sort is REPLACED by a 1-row percentile_approx sketch broadcast "
        "+ per-source windows — no data-sized single-partition stage."
    ),
    "ranking_auc_histogram": (
        "Histogram AUC: one grouped aggregation over the events; the "
        "Mann-Whitney window runs over the \u22644096-row bin table, never "
        "the facts; bounds are a 1-row broadcast."
    ),
    "kmeans_one_step": (
        "Lloyd step: K-row centroid table broadcast, assignment is a "
        "map-side K-fanout with a per-vector argmin window (K rows per "
        "vector), ONE K-key aggregation — no vector shuffle."
    ),
    "token_entropy_filter": (
        "Token entropy: explode \u2192 (doc, token) count \u2192 per-doc "
        "sufficient-statistics agg; both shuffles key on doc_id, the "
        "second input pre-reduced to distinct tokens per doc."
    ),
    "tokens_budget_allocation": (
        "Greedy token budget: ONE per-source window over a pre-reduced "
        "(doc, tokens) projection — no global ordering anywhere."
    ),
    "url_canonical_dedup": (
        "URL canonicalization: pure string algebra in codegen; the "
        "dedup groupBy shuffles short canonical keys, not documents."
    ),
    "mixture_reweight_plan": (
        "Mixture plan: one grouped token census (map-side combine), "
        "1-row total broadcast, sources-sized output."
    ),
    "threshold_sweep_pr": (
        "Threshold sweep: suffix sums over the 20-bin score histogram "
        "against a broadcast grid — the events aggregate ONCE."
    ),
    "graph_degree_distribution": (
        "Degree histogram: edges\u2192degree, degree\u2192count; re-keying on "
        "degree collapses hubs to one row before share arithmetic."
    ),
    "multimodal_mjpeg_frame_sample": (
        "MJPEG sampling: two Arrow-batched map stages (AVI encode, "
        "container walk + selective JPEG decode) over input splits — "
        "zero shuffles; skipped frames never leave the container bytes."
    ),
    "sample_exact_k_per_group": (
        "Exact-k stratum sample: rank ≤ k compiles to WindowGroupLimit "
        "— per-stratum top-k heaps, never a full per-stratum sort."
    ),
    "rfm_segmentation": (
        "RFM: one fact scan into a staged customer rollup; the global "
        "max-date scalar re-aggregates the rollup (never a second "
        "orders pass); NTILE windows run over dimension-sized input."
    ),
    "pareto_revenue_share": (
        "Pareto share: staged part rollup feeds both the grand-total "
        "scalar and the ranking window — one lineitem pass; the "
        "ordered cumulative sum runs over |parts| rows of exact cents."
    ),
    "allocation_proportional": (
        "Ratio-to-report: the per-order window's l_orderkey exchange "
        "is REUSED by the header join (same key) — one lineitem "
        "shuffle total, bounded partitions."
    ),
    "mad_outlier_flags": (
        "MAD outliers: two 5-row percentile aggregates broadcast back "
        "onto the event scan; the |z|>3.5 flag filters scan-side in "
        "codegen."
    ),
    "topn_plus_other": (
        "Top-N+other: both union branches read the STAGED ranked "
        "rollup (InMemoryTableScan) — the fact join+agg runs once."
    ),
    "period_over_period": (
        "MoM/YoY: three calendar self-joins consume one staged "
        "month-sized rollup; missing months surface as NULLs, never "
        "misaligned lags."
    ),
    "cohort_ltv_curve": (
        "Cohort LTV: staged first-order cohort table feeds size rollup "
        "and activity join; cumulative cents stay integer-exact in the "
        "per-cohort window."
    ),
    "ab_cuped_adjusted": (
        "CUPED: one event scan into a staged per-user (x, y) rollup; "
        "θ is a broadcast 1-row scalar; adjustment and readout are "
        "map-side + one tiny agg."
    ),
    "survival_km_curve": (
        "Kaplan-Meier: staged per-user durations; risk sets and the "
        "survival product come from ordered windows over the "
        "event-time-sized rollup."
    ),
    "gaps_islands_streaks": (
        "Islands: distinct (user, day) matrix, rn-difference island "
        "key from one bounded per-user window, two grouped counts — "
        "all integer arithmetic."
    ),
    "dedup_simhash_portable_pairs": (
        "Portable SimHash: map-side per-char fold + 32 vote sums, "
        "staged signatures, 8-bit chunk pigeonhole equi-join, popcount "
        "verify — nothing quadratic, nothing engine-specific."
    ),
    "quantile_normalize_sources": (
        "Quantile normalization: bounded per-source percent-rank "
        "windows + ONE global reference ranking; the resolve is an "
        "integer equi-join (at scale the global rank swaps for an "
        "approx-quantile grid)."
    ),
    "debounce_events": (
        "Debounce: one bounded (user, type) window; burst ids are a "
        "running sum of integer-microsecond gap breaks."
    ),
    "attribution_linear": (
        "Linear attribution: per-user bounded range join, per-purchase "
        "credit window, two tiny aggregations — never a global product."
    ),
    "geo_revenue_shares": (
        "Geo shares: all three dimension joins broadcast; share/rank "
        "windows over the |nations|-sized rollup."
    ),
    "contrastive_negative_pairs": (
        "Negative sampling: one dimension-sized ranking, map-side 1→k "
        "fanout, single integer-index equi-join — document payloads "
        "never shuffle."
    ),
    "curriculum_interleave": (
        "Curriculum layout: one NTILE pass + per-bucket hash-shuffle "
        "ranks; the interleave is pure map-side integer arithmetic."
    ),
    "theil_sen_trend": (
        "Theil-Sen: the O(k²) pairwise join is partitioned on user_id "
        "(bounded per-key), median slope is an exact small-group "
        "percentile."
    ),
    "similarity_lsh_portable_pairs": (
        "Portable LSH: map-side sequential-fold signatures (staged), "
        "banded equi-join candidates, exact-cosine verify on candidates "
        "only — engine-exact end to end."
    ),
    "ranking_auc_report": (
        "Exact AUC: ONE rank window + one aggregation (the Mann-Whitney "
        "identity) — never the quadratic pos×neg join; global sort "
        "documented with its histogram-estimator scale path."
    ),
    "tokenizer_vocab_coverage": (
        "Vocab coverage: token-frequency agg → top-K rank → BROADCAST "
        "vocab membership onto the token stream → per-doc aggregate."
    ),
    "ngram_novelty_score": (
        "Bigram novelty: the dedup inverted-index algebra — distinct "
        "(doc, bigram), df aggregation, one join back; no doc×doc "
        "comparison."
    ),
    "asof_nearest_tolerance": (
        "Nearest-in-time join: one shuffle, one shared per-key sort "
        "feeding backward AND forward IGNORE-NULLS windows; "
        "integer-microsecond gap arithmetic."
    ),
    "concurrent_intervals_timeline": (
        "Sweep-line backlog: per-order lifetimes → +1/−1 delta union → "
        "month-sized cumulative window; no interval self-join."
    ),
    "collocation_pmi_bigrams": (
        "PMI collocations: one corpus scan into the staged bigram "
        "aggregate; margins and the grand total are model-table-sized "
        "reductions broadcast back — the support floor filters the "
        "staged table, never the corpus."
    ),
    "decile_lift_table": (
        "Lift table: one global ntile sort (the honest ranked-metric "
        "cost, as ranking_auc_report), then 10-row algebra with a "
        "1-row broadcast total."
    ),
    "mutual_information_features": (
        "MI feature selection: ONE melted fact scan (map-side 3× "
        "explode, partial-aggregated before the shuffle); every "
        "marginal is a window over the ≤|X|·|Y|-cell joint table; "
        "DECIMAL-exact term sums."
    ),
    "train_val_test_split": (
        "Holdout split: portable multiplicative hash as a map-only "
        "projection — ZERO exchanges, stable under engine/run/order."
    ),
    "dedup_cluster_canonical": (
        "Canonical dedup: LSH pairs → staged component labels; the "
        "keep-best pick windows over CLUSTERED ids only; survivors via "
        "anti-join — document text never enters an exchange."
    ),
    "skew_key_report": (
        "Skew report: staged per-key counts feed a 1-row broadcast "
        "total and an orderBy().limit(k) top-k — TakeOrderedAndProject "
        "per family, never a single-partition sort of the key space."
    ),
    "bootstrap_mean_ci": (
        "Poisson bootstrap: the ×200 replica fanout is a Generate "
        "(explode) feeding a partial aggregate INSIDE the scan stage — "
        "one exchange of B partial sums per map task, never a shuffle "
        "of exploded rows, never a per-replica re-scan."
    ),
    "ndcg_ranking_quality": (
        "NDCG@10: the ranking sorts only WITHIN user partitions (no "
        "rangepartitioning anywhere); the user window's exchange is "
        "reused by the per-user reduce, so the whole metric is one "
        "shuffle."
    ),
    "tokenizer_bpe_roundtrip": (
        "BPE train→encode (round 10): the encode pass is ONE scan into "
        "an Arrow-batched pure map with the learned vocab closed over — "
        "zero exchanges; the trainer's N iterations ran on the "
        "vocab-scale word table before this plan was built (their "
        "pure-JVM stages are pinned in test_plans.py)."
    ),
    "multimodal_audio_fingerprint_pairs": (
        "Audio fingerprint near-dup (round 10): real WAV decode + "
        "integer fingerprint as a staged pure map; candidates from the "
        "(band_idx, band_val) equi-join — dhash_band_pairs verbatim — "
        "with exact hamming verify; never n²."
    ),
    "multimodal_audio_asym_containment": (
        "Asymmetric-hop audio containment (round 12): ONE staged synth "
        "frame feeds both the hop-16 archive prints and the hop-1 probe "
        "prints (pure Arrow maps, zero exchanges each); candidates from "
        "the (band_idx, band_val) equi-join — dhash_band_pairs in cross "
        "mode — then the frame-offset vote as two bounded aggregations; "
        "the dense side is the query batch, never the archive."
    ),
    "sketch_hll_portable": (
        "Portable-integer HLL (round 12): one scan into two bounded "
        "register aggregations (64 registers x statuses), a broadcast- "
        "sized spine join, and the exact-BIGINT harmonic sum — floats "
        "appear only in the final division of the estimate."
    ),
    "sketch_countmin_portable": (
        "Portable count-min (round 12): one scan fans out x4 map-side "
        "into two bounded counter aggregations (2048 cells), the exact "
        "top-K via TakeOrdered-sized window, a broadcast probe join and "
        "a 1-row mergeability scalar — all integers, zero Python."
    ),
    "multimodal_audio_subframe_containment": (
        "Sub-frame audio containment (round 13): ONE staged synth frame "
        "feeds both sides of the SAME overlapping-analysis-frame stage "
        "(archive at a 128-sample hop, probe at hop 1 — pure Arrow maps, "
        "zero exchanges each); candidates from the (band_idx, band_val) "
        "equi-join, the energy witnesses ride the verify joins as print-"
        "identity columns (no extra scan), and the sample-offset vote "
        "ranked by the exact-scale BIGINT invariant is two bounded "
        "aggregations."
    ),
    "quantile_normalize_portable": (
        "Integer-exact quantile normalization (round 13): one scan into "
        "a grouped VALUE histogram (bounded by distinct-score "
        "cardinality — the global cumulative window runs over that "
        "bounded table, never the corpus), a 101-row grid range-joined "
        "against the broadcast histogram, one bounded per-source window, "
        "and two 1-row broadcasts (grid array + mergeability census); "
        "the only division is the final fixed-point floor — zero floats, "
        "zero Python, no global sort."
    ),
    "similarity_ivf_portable_topk": (
        "Portable IVF (round 13): broadcast centroid table + broadcast "
        "query panel; assignment one scan with a 16-way bounded min; "
        "the search join is the cluster_id equi-join over the probed "
        "lists (~nprobe/K of the corpus per query); the exact leg fans "
        "out only the bounded query panel — zero Python, no cartesian."
    ),
    "sketch_bloom_portable": (
        "Portable Bloom filter (round 13): two distinct-key scans, a "
        "bounded bit_or word aggregation (<= 1024 words, map-side "
        "combinable — the OR a 1000-executor build would ship), a "
        "broadcast word join for the probe, and 1-row census "
        "aggregates — all BIGINT, zero Python."
    ),
    "pipeline_training_build_semantic": (
        "Training build + SemDeDup stage (round 10): centroid fanout is "
        "the single broadcast nested loop; the CC drop list enters the "
        "mix tail as a TRUNCATED plan leaf (Scan ExistingRDD) — the "
        "measured fix for composed-iteration logical-tree blowup."
    ),
}

SKIP_PREFIXES = (
    "Output", "Input", "Arguments", "Functions", "Aggregate Attributes",
    "Results", "Keys", "Condition", "Join condition",
)


def main() -> None:
    from sparkstreaming_rawdataingestion_spark import plans
    from sparkstreaming_rawdataingestion_spark.queries import all_queries
    from sparkstreaming_rawdataingestion_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    qs = all_queries()
    out = [
        "# PLANS — physical-plan evidence for the scale claims",
        "",
        "Generated from `df.explain('formatted')` at sf0.01 (plans are",
        "identical in shape at any SF; AQE adjusts partition counts only).",
        "Regenerate with `python tools/dump_plans.py`.",
        "",
    ]
    for name, note in PICKS.items():
        plan = plans.formatted_plan(qs[name](spark, sf))
        lines: list[str] = []
        for ln in plan.splitlines():
            if ln.strip().startswith(SKIP_PREFIXES):
                continue
            lines.append(ln)
            if len(lines) > 40:
                lines.append("   ... (truncated)")
                break
        details = [
            ln.strip()[:160]
            for ln in plan.splitlines()
            if any(k in ln for k in ("PushedFilters", "ReadSchema", "PartitionFilters"))
        ][:6]
        out += [f"## {name}", "", note, "", "```", *lines, "```", ""]
        if details:
            out += ["Scan details:", "", "```", *details, "```", ""]
    with open("PLANS.md", "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(out)} lines)")


if __name__ == "__main__":
    main()
