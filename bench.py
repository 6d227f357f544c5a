"""Benchmark harness (driver contract): runs the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ...}

Each query is forced with ``count()`` (full plan execution, no driver-side
result materialization — the realistic action for a 100 TB pipeline stage
whose output feeds a sink, not a collect). A warmup run of the flagship
amortizes JVM/codegen startup out of the per-query numbers.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from seoul_big_data_spark.queries import QUERIES  # noqa: E402
from seoul_big_data_spark.session import get_spark  # noqa: E402

# Headline set: one per operator family, weighted toward the scale-critical
# shapes (big-fact aggregation, shuffle joins, windows, text/dedup/vector).
HEADLINE = [
    "flagship_pricing_summary",
    "ingest_resume_load",
    "filter_eq",
    "join_catalog_dims",
    "join_left_outer_agg",
    "window_latest_per_group",
    "window_running_sum",
    "agg_cube",
    "agg_count_distinct",
    "events_sessionization",
    "events_asof_join",
    "text_token_stats",
    "text_term_frequency",
    "dedup_exact",
    "dedup_minhash_lsh",
    "similarity_brute_force_topk",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q9_product_profit",
    "tpch_q21_waiting_supplier",
    "dq_profile_columns",
    "merge_upsert_pattern",
    "events_funnel_conversion",
    "corpus_prep_pipeline",
]

# Round-2 operators, timed identically but reported under "extended" (NOT
# part of "value"/"queries") so the headline series stays comparable across
# rounds while new operators still get measured.
EXTENDED = [
    "events_range_join_banded",
    "join_skew_salted",
    "cdc_apply_latest",
    "dedup_ngram_jaccard_skewsafe",
    "embedding_random_projection",
    "dedup_span_exact",
    "events_rollup_two_level",
    "timeseries_locf_interpolate",
    "join_bucketed_fact_fact",
    "tpch_q18_large_orders",
    "dedup_simhash_md5",
    "agg_skew_kurt_exact",
    "agg_histogram_fixed_bins",
    "agg_frequent_items_topk",
    "timeseries_ewma_trailing",
    "text_chunk_fixed_tokens",
    "dedup_survivor_best_quality",
    "embedding_quantize_int8",
    "events_session_busy_overlap",
    "events_variant_extract",
    "graph_pagerank_neardup",
    "embedding_pq_codes",
    "similarity_pq_adc",
    "text_bm25_top_terms",
    "join_fuzzy_blocked",
    "events_incremental_rollup",
    "events_asof_nearest",
    "events_rolling_median_24h",
    "sample_train_val_test_split",
    "stats_winsorize_acctbal",
    "stats_chi2_priority_status",
    "stats_source_entropy_by_lang",
    "agg_equidepth_deciles",
    "events_attribution_first_touch",
    "dq_snapshot_diff",
    "orc_roundtrip_load",
    "graph_triangle_count",
    "events_session_window_builtin",
    "events_cumulative_distinct_users",
    "text_udtf_run_length",
    "similarity_ivf_pq_ann",
    "events_funnel_time_bounded",
    "stats_corr_matrix_lineitem",
    "events_type_transition_matrix",
    "stats_rfm_segmentation",
    "stats_abc_pareto_parts",
    "dq_benford_first_digit",
    "text_zipf_slope",
    "dq_quarantine_bad_json",
    "timeseries_linear_interpolate",
    "events_anomaly_seasonal_zscore",
    "agg_filtered_clauses",
    "stats_market_basket_pairs",
    "events_peak_concurrency",
    "events_top_session_paths",
    "timeseries_trend_decompose",
    "events_dau_wau_stickiness",
    "events_new_vs_returning",
    "events_ab_test_ztest",
    "events_point_in_time_tier",
    "events_longest_streaks",
    "events_wow_growth",
    "events_interarrival_profile",
    "corpus_refinery_pipeline",
    # round 3 additions
    "stats_ols_price_vs_qty",
    "stats_gini_customer_revenue",
    "stats_mutual_info_type_hour",
    "dedup_containment_pairs",
    "hierarchy_flatten_ancestors",
    "dedup_incremental_vs_corpus",
    "sample_negative_pairs",
    "agg_countmin_heavy_hitters",
    "agg_bloom_membership",
    "stats_ks_two_sample",
    "stats_auc_roc",
    "stats_cramers_v",
    "dq_psi_drift",
    "dq_order_total_consistency",
    "dq_key_candidates",
    "sample_kfold_assign",
    "text_feature_hashing",
    "sample_per_source_cap",
    "text_vocab_oov_rate",
    "text_bigram_logprob",
    "text_js_divergence",
    "similarity_mmr_rerank",
    "embedding_whitening",
    "mlprep_quality_classifier",
    "dq_join_key_skew",
    "events_throttle_debounce",
    "events_out_of_order_profile",
    "dq_pseudonymize_keys",
    "events_attribution_models",
    "stats_bootstrap_ci_mean",
    "agg_kmv_theta_setops",
    "stats_skyline_parts",
    "agg_weighted_median",
    "events_survival_km",
    "events_cusum_change_point",
    "mlprep_target_encoding_loo",
    "mlprep_woe_encoding",
    "sample_weighted_reservoir",
    "dedup_sorted_neighborhood",
    "events_interval_overlap_pairs",
    "text_rake_keywords",
    "agg_hll_portable",
    "text_cooccurrence_pmi",
    "mlprep_calibration_bins",
    "stats_kendall_tau_b",
    "timeseries_autocorrelation_acf",
    "similarity_knn_classifier",
    "stats_benjamini_hochberg",
    "events_power_analysis_mde",
    "events_geo_neighbor_pairs",
    "dedup_minhash_lsh_md5",
    "stats_spearman_rho",
    "multimodal_phash_dedup",
    "dedup_lsh_recall_eval",
    "events_bot_detection",
    "agg_boolean_family",
    "agg_bitwise_family",
    "dq_sequence_gaps",
    "stats_empirical_bayes_shrinkage",
    "text_textrank_keywords",
    "events_forecast_seasonal_naive",
    "mlprep_token_budget_allocation",
    "text_compression_ratio",
    "pyds_custom_source",
    "join_lateral_top3_per_customer",
    "xml_roundtrip_load",
    "events_markov_absorbing_conversion",
    "dedup_jaccard_prefix_filter",
    "recsys_item_item_cosine",
    "search_phrase_match",
    "stats_mann_whitney_u",
    "stats_theil_sen_slope",
    "agg_mean_family",
    "agg_bottomk_sample_quantiles",
    "join_shuffle_hash_hint",
    "sql_parameterized_query",
    "sql_lateral_column_alias",
    "udf_arrow_token_count",
    "udf_grouped_agg_trimmed_mean",
    "sql_pipe_syntax",
    "sql_scripting_block",
    "timeseries_holt_forecast",
    "events_sliding_window_topk",
    "stats_anova_oneway",
    "text_ngram_novelty",
    "events_bounce_rate_daily",
    "ivm_join_incremental",
    "dq_corpus_health_report",
    "orders_cohort_ltv_curve",
    "stats_wilson_proportion_ci",
    "text_hashing_collision_rate",
    "sample_neyman_allocation",
    "dedup_cluster_size_histogram",
    "scalar_try_function_family",
    "mv_answer_from_rollup",
    "sql_collation_case_insensitive",
    "agg_listagg_ordered",
    "sql_group_by_all",
    "events_session_gap_sensitivity",
    "dq_dup_rate_by_source",
    "stats_cohens_d_effect_size",
    "events_slo_burn_rate",
    "text_lexical_diversity",
    "events_funnel_step_latency",
    "dq_timestamp_sanity",
    # round 4 additions
    "ivf_cell_assignment_md5",
    "lsh_bucket_assignment_md5",
    "pq_codes_md5",
    "pq_adc_md5",
    "dedup_semantic_cells_md5",
    "text_pack_sequences",
    "mlprep_logreg_newton_step",
    "text_entropy_compressibility",
    "dedup_substring_runs",
    "multimodal_resize",
    # round 9 additions
    "text_bpe_tokenize",
    "text_bpe_token_budget",
    "text_bpe_chunk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_spark("bench")

    # Steady-state methodology: one warm run (JIT/codegen compilation,
    # file-listing caches), then the timed runs. Cold-start costs are a
    # per-JVM constant, not a per-query property — at 100 TB they amortize
    # to zero, so timing them would just add noise to the comparison.
    #
    # r10 (VERDICT r9 #8): the same-code headline spread on this box
    # (11.4–18.5 s across five runs in r9) exceeds any single
    # optimization, so the protocol is now median-of-5 INTERLEAVED passes —
    # the whole suite runs 5 times in round-robin, so slow machine phases
    # hit every query equally instead of whichever query they landed on.
    # "queries"/"value" keep the legacy min-of-N estimator (series
    # continuity back to r1 — min answers "what does the CODE cost");
    # "value_median"/"value_spread"/"queries_median" carry the robust
    # estimator round-over-round comparisons should use from r10 on.
    # Extended entries stay single-timed (they are trend indicators).
    n_passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "5"))
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for name in HEADLINE:  # warm pass
        QUERIES[name](spark, sf_dir).count()
    pass_totals: list[float] = []
    for _ in range(n_passes):
        tot = 0.0
        for name in HEADLINE:
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).count()
            dt = time.perf_counter() - t0
            samples[name].append(dt)
            tot += dt
        pass_totals.append(tot)

    def _median(xs: list[float]) -> float:
        s = sorted(xs)
        n = len(s)
        return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2

    timings = {name: round(min(xs), 3) for name, xs in samples.items()}
    timings_median = {name: round(_median(xs), 3) for name, xs in samples.items()}

    prev_head, prev_ext = _load_prev_round()

    def _time_ext(name: str) -> float:
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).count()
        return time.perf_counter() - t0

    # SPARK_GRAFT_BENCH_EXTENDED=0 skips the ~180 extended entries — for
    # builder-side scale-tier runs (x32 replicas, 8-vs-32-core scaling)
    # where only the headline line is wanted. The driver sets no such var,
    # so the official record keeps the full extended side file.
    run_extended = os.environ.get("SPARK_GRAFT_BENCH_EXTENDED", "1") != "0"
    extended: dict[str, float] = {}
    for name in EXTENDED if run_extended else []:
        QUERIES[name](spark, sf_dir).count()  # warm
        extended[name] = round(_time_ext(name), 3)

    # r11 (VERDICT r10 What's-wrong #2 / Next #7): extended entries are the
    # round-over-round trend record, and a single-shot reading lands on a
    # host-noise phase a few times per run (r10 committed pagerank at 15.06 s
    # one-shot vs ~3.9 s controlled; bm25 "3.8x vs prev" re-read at 0.42x
    # this round). The slowest 20 entries — the optimization targets the
    # next round chases — plus any entry whose vs-prev ratio moved >= 2x in
    # EITHER direction (a too-fast outlier poisons next round's baseline the
    # same way) are re-timed twice and recorded as the median of 3.
    suspects = {n for n, _ in sorted(extended.items(), key=lambda kv: -kv[1])[:20]}
    suspects |= {
        n
        for n, v in extended.items()
        if prev_ext.get(n) and not 0.5 < v / prev_ext[n] < 2.0
    }
    extended_retimed: dict[str, list[float]] = {}
    for name in sorted(suspects):
        xs = [extended[name], _time_ext(name), _time_ext(name)]
        extended[name] = round(_median(xs), 3)
        extended_retimed[name] = [round(x, 3) for x in xs]
    side = {
        "extended": extended,
        "extended_retimed": extended_retimed,
        "extended_total": round(sum(extended.values()), 3),
        "headline_median": timings_median,
        "headline_pass_totals": [round(t, 3) for t in pass_totals],
        "vs_prev": {
            q: round(timings[q] / prev_head[q], 2)
            for q in timings
            if prev_head.get(q)
        },
        "vs_prev_extended": {
            q: round(extended[q] / prev_ext[q], 2)
            for q in extended
            if prev_ext.get(q)
        },
        "sf": sf,
    }
    here = os.path.dirname(os.path.abspath(__file__))
    if run_extended:  # never clobber the trend side file with an empty map
        with open(os.path.join(here, "bench_extended.json"), "w") as fh:
            json.dump(side, fh, indent=1)

    # The official record MUST be the final stdout line and stay well under
    # the driver's stdout-tail capture (r2's single fat line with the
    # extended map got truncated mid-line → BENCH_r02 parsed:null). Extended
    # timings + ratios live in bench_extended.json; only the compact
    # headline object is printed, last, on its own line.
    out = {
        "metric": "headline_suite_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        # keep the official line COMPACT (r2's fat line got tail-truncated):
        # per-query medians live in bench_extended.json
        "value_median": round(_median(pass_totals), 3),
        "value_spread": round(max(pass_totals) - min(pass_totals), 3),
        "sf": sf,
    }
    spark.stop()
    sys.stdout.flush()
    print(json.dumps(out))


def _load_prev_round() -> tuple[dict[str, float], dict[str, float]]:
    """(headline, extended) per-query timings from the previous round, so
    each run prints this-run/prev-round ratios (regressions visible in-run;
    methodology is identical across rounds — warm timed run). Headline comes
    from the latest parseable BENCH_r{N}.json; extended comes from the
    bench_extended.json side file the previous run wrote (r3+)."""
    here = os.path.dirname(os.path.abspath(__file__))
    rounds = sorted(
        (f for f in os.listdir(here) if re.fullmatch(r"BENCH_r\d+\.json", f)),
        key=lambda f: int(re.search(r"\d+", f).group()),
        reverse=True,
    )
    head: dict[str, float] = {}
    for name in rounds:  # skip unparseable rounds (e.g. r2's truncated line)
        try:
            with open(os.path.join(here, name)) as fh:
                doc = json.load(fh)
            # The driver wraps bench's JSON line under "parsed".
            head = (doc.get("parsed") or doc).get("queries", {}) or {}
        except (OSError, json.JSONDecodeError, AttributeError):
            head = {}
        if head:
            break
    try:
        with open(os.path.join(here, "bench_extended.json")) as fh:
            ext = json.load(fh).get("extended", {}) or {}
    except (OSError, json.JSONDecodeError, AttributeError):
        ext = {}
    return head, ext


if __name__ == "__main__":
    main()
