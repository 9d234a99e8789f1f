"""Oracle-checked query catalog.

Each module registers (spark builder, DuckDB oracle SQL) pairs into the
shared registry. Importing this package populates it.

Registration order is deliberate: the external driver checks a ~50-entry
prefix of the catalog each round, so _PRIORITY below puts the queries
that most need a fresh CORRECTNESS row first. Round-8 order (catalog
growth frozen; the round-7 window duplicated round 6's, so the window
rotates to the evidence debt): first the 8 queries modified THIS
round (q79/q253/q171's all-ties zero-variance fixes; the
minimal-scale sweep fixes q104/q126/q177/q187/q261/q264; the
constant-ts fixes q87/q163 — q171/q163 already sit in part 2), then
the 10 queries modified in r6
whose newest driver rows (r3/r5) predate their current code
(q85/q225/q228/q229/q230/q234/q237/q259/q262/q268 — decimal-tie /
try_divide / offset-derivation / shared-rank-bin fixes; q229/q230's
r6 change was a fixture-invariant TEST, their query code is unchanged
since r5), then the 15 r6-modified queries never driver-checked (q219
float32 fix; the degenerate-text fixes
q135/q163/q127/q132/q164/q171/q178/q184; the try_divide set
q166/q167/q191/q152/q165; q215), then 16 of the never-driver-checked
backlog oldest-first (q128..q147) — exactly 50 entries. After the
window prefix: the remaining 54 never-checked (q149..q216), then the
driver-green tail oldest-evidence-first
(r3, r4, r5, r7). All 263 queries are locally parity-green at
sf0.001/0.01/0.1 under the hostile replica
(tests/test_oracle_parity.py); the window exists purely to convert
local evidence into driver CORRECTNESS rows.
"""

from __future__ import annotations

from airquality_data_pipeline_spark.queries.registry import ORACLE, QUERIES

# populate the registry
from airquality_data_pipeline_spark.queries import relational  # noqa: E402,F401
from airquality_data_pipeline_spark.queries import relational2  # noqa: E402,F401
from airquality_data_pipeline_spark.queries import relational3  # noqa: E402,F401
from airquality_data_pipeline_spark.queries import advanced  # noqa: E402,F401
from airquality_data_pipeline_spark.queries import pipeline  # noqa: E402,F401
from airquality_data_pipeline_spark.queries import dedup  # noqa: E402,F401
from airquality_data_pipeline_spark.queries import similarity  # noqa: E402,F401
from airquality_data_pipeline_spark.queries import text  # noqa: E402,F401
from airquality_data_pipeline_spark.queries import llmops  # noqa: E402,F401
from airquality_data_pipeline_spark.queries import multimodal  # noqa: E402,F401
from airquality_data_pipeline_spark.queries import advanced2  # noqa: E402,F401
from airquality_data_pipeline_spark.queries import advanced3  # noqa: E402,F401
from airquality_data_pipeline_spark.queries import advanced4  # noqa: E402,F401
from airquality_data_pipeline_spark.queries import llmops2  # noqa: E402,F401
from airquality_data_pipeline_spark.queries import tpch2  # noqa: E402,F401
from airquality_data_pipeline_spark.queries import llmops3  # noqa: E402,F401

# Names the driver must check first this round (see module docstring).
_PRIORITY = [
    # --- round-8 window, part 0: modified THIS round — their old
    # driver rows predate the code (q79/q253: all-ties axis
    # zero-variance fixes; q104: shared floor grid for continuous
    # ratio roundings; q126/q177/q187/q261/q264: minimal-scale sweep
    # try_divide + decimal-headroom fixes)
    "q79_stat_aggs",
    "q253_zone_map_skipping",
    "q104_kmeans_refine",
    "q126_token_drift",
    "q177_interevent_fit",
    "q187_rate_change_alert",
    "q261_fairness_audit",
    "q264_causal_estimators",
    "q87_time_weighted_avg",
    # --- part 1: the 10 r6-modified queries whose newest driver rows
    # (r3/r5) predate their current code
    "q85_doc_chunking",
    "q225_seasonal_decompose",
    "q228_runs_test",
    "q229_dedup_pr_harness",
    "q230_band_threshold_sweep",
    "q234_code_screen",
    "q237_uplift_deciles",
    "q259_psi_drift",
    "q262_woe_iv",
    "q268_slo_burn_rate",
    # --- part 2: the 15 r6-modified queries never driver-checked
    # (float32 fix, degenerate-text/decimal-tie fixes, try_divide
    # hardening, offset derivation)
    "q219_fisher_dims",
    "q135_char_entropy",
    "q163_grouped_linear_trend",
    "q127_weighted_sample",
    "q132_incremental_dedup",
    "q164_chi_square",
    "q171_anova_f",
    "q178_embedding_dim_stats",
    "q184_retention_halflife",
    "q166_series_correlation",
    "q167_ab_test",
    "q191_acf",
    "q152_rfm_segmentation",
    "q165_revenue_concentration",
    "q215_template_prefix",
    # --- part 3: 16 never-driver-checked, oldest-first
    "q128_unigram_crossentropy",
    "q129_containment",
    "q131_cms_heavy_hitters",
    "q134_hll_shard_union",
    "q136_bigram_crossentropy",
    "q137_split_ngram_leakage",
    "q138_containment_capped",
    "q139_funnel",
    "q140_cohort_retention",
    "q141_zorder_layout",
    "q142_basket_lift",
    "q143_repetition_filter",
    "q144_mixture_reweight",
    "q145_mad_outliers",
    "q146_ewma",
    "q147_fuzzy_string_join",
    # ^^^ exactly 50 entries above this line — the driver window.
    # --- remaining never-driver-checked backlog (drains r9+)
    "q149_pagerank",
    "q150_seasonal_anomaly",
    "q151_markov_transitions",
    "q153_stratified_kfold",
    "q154_winsorized_scaling",
    "q155_ohlc_bars",
    "q156_scd2_intervals",
    "q157_triangle_count",
    "q158_snowflake_rollup",
    "q159_semantic_decontamination",
    "q160_entry_paths",
    "q161_dq_audit",
    "q162_incremental_agg_merge",
    "q168_fulfillment_latency",
    "q169_bounce_rate",
    "q170_mom_growth",
    "q172_knn_label_noise",
    "q173_grid_nn_join",
    "q174_time_travel_lookup",
    "q176_quantile_normalization",
    "q179_hub_detection",
    "q180_join_cardinality",
    "q181_theil_sen",
    "q182_token_pmi",
    "q183_benford_audit",
    "q185_weighted_median",
    "q186_funnel_latency",
    "q188_invoice_reconciliation",
    "q189_duplicate_payments",
    "q190_roc_auc",
    "q192_cusum_changepoint",
    "q193_survival_km",
    "q194_interval_union",
    "q195_activity_streaks",
    "q197_last_touch_attribution",
    "q198_hierarchy_rollup",
    "q199_calibration_bins",
    "q200_ols_two_feature",
    "q201_nation_trade",
    "q202_market_share",
    "q203_product_profit",
    "q204_info_gain",
    "q205_rolling_median",
    "q206_khop_reachability",
    "q207_table_profile",
    "q208_topn_with_other",
    "q209_binary_segmentation",
    "q210_pareto_frontier",
    "q211_robust_means",
    "q212_survivorship",
    "q213_backtest_smape",
    "q216_tokenizer_fertility",
    # --- driver-green tail, oldest evidence first (r3, r4, r5, r7)
    "q02_filter_project",
    "q03_shipping_priority",
    "q04_semi_join_exists",
    "q06_forecast_revenue",
    "q07_anti_join_no_orders",
    "q08_left_join_coalesce",
    "q41_minhash_candidates",
    "q42_ngram_jaccard",
    "q44_cosine_topk",
    "q46_ivf_topk",
    "q50_token_counts",
    "q71_neardup_components",
    "q89_multiset_ops",
    "q93_snapshot_diff",
    "q94_stratified_sample",
    "q97_boilerplate_ngrams",
    "q98_sequence_packing",
    "q99_decontamination",
    "q100_language_sampling",
    "q101_pii_scrub",
    "q103_curation_pipeline",
    "q105_length_filter",
    "q106_source_mix",
    "q107_ivf_multiprobe",
    "q108_shard_export",
    "q111_length_histogram",
    "q114_unicode_normalize",
    "q115_ann_recall",
    "q116_product_quantization",
    "q01_pricing_summary",
    "q05_local_supplier_volume",
    "q09_broadcast_dim_join",
    "q10_topk_per_group",
    "q17_datetime_tz",
    "q18_json_extract",
    "q23_cursor_incremental_filter",
    "q24_pending_cursor_updates",
    "q25_first_wins_dedup",
    "q26_greatest_merge",
    "q27_coalesce_merge",
    "q28_retention_filter",
    "q29_ragged_union",
    "q30_sessionization",
    "q31_tumbling_window",
    "q32_sliding_window",
    "q33_asof_join",
    "q34_range_join",
    "q40_exact_dedup",
    "q45_embedding_neardup",
    "q48_language_id",
    "q55_salted_agg",
    "q60_approx_distinct",
    "q61_approx_percentile",
    "q62_tfidf",
    "q65_nullsafe_join",
    "q68_bit_aggs",
    "q75_edit_distance",
    "q76_null_aggregates",
    "q77_range_frame",
    "q80_ignore_nulls",
    "q83_map_functions",
    "q88_gapfill_locf",
    "q91_running_distinct",
    "q102_chunk_fingerprints",
    "q109_chunk_dedup",
    "q112_jaccard_estimate",
    "q113_bloom_decontamination",
    "q118_span_scrub",
    "q119_bm25_topk",
    "q120_dedup_pipeline",
    "q122_vocab_coverage",
    "q123_source_calibration",
    "q124_leakage_free_split",
    "q125_token_budget_selection",
    "q218_matryoshka_recall",
    "q220_cuped",
    "q221_diff_in_diff",
    "q222_poisson_bootstrap",
    "q223_cohort_ltv",
    "q224_negative_sampling",
    "q226_burst_detection",
    "q227_mann_kendall",
    "q231_srm_check",
    "q232_capping_sensitivity",
    "q233_readability_lix",
    "q235_dp_noisy_counts",
    "q236_k_anonymity",
    "q238_watermark_lateness",
    "q239_compaction_plan",
    "q240_order_priority_check",
    "q241_important_parts",
    "q242_ship_delay_priority",
    "q243_promo_revenue_share",
    "q244_top_supplier_revenue",
    "q245_brand_supplier_counts",
    "q246_large_volume_customers",
    "q247_disjunctive_revenue",
    "q248_dominant_widget_suppliers",
    "q249_dormant_high_balance",
    "q250_dsir_selection",
    "q251_perplexity_terciles",
    "q252_bpe_pair_stats",
    "q254_ndcg_at_10",
    "q255_rrf_fusion",
    "q256_temperature_sampling",
    "q257_ushaped_attribution",
    "q258_offpolicy_eval",
    "q260_conformal_calibration",
    "q263_oof_target_encoding",
    "q265_blocklist_screen",
    "q266_recursive_hierarchy",
    "q267_variant_rollup",
    "q11_window_running",
    "q12_rollup",
    "q13_cube",
    "q14_set_ops",
    "q15_distinct_agg",
    "q16_conditional_agg",
    "q19_string_funcs",
    "q35_pivot",
    "q36_unpivot",
    "q37_percentiles",
    "q38_argmax",
    "q39_collect_sorted",
    "q43_simhash",
    "q47_vector_lsh",
    "q49_quality_score",
    "q51_fingerprint",
    "q52_binary_columns",
    "q53_sql_api",
    "q54_term_stats",
    "q56_array_functions",
    "q57_having",
    "q58_below_avg_quantity",
    "q59_order_distribution",
    "q63_ml_minhash_lsh",
    "q64_ranking_extras",
    "q66_embedding_quantize",
    "q67_signature_clusters",
    "q69_posexplode",
    "q70_regexp_groups",
    "q72_correlated_min",
    "q73_multi_exists",
    "q74_date_arithmetic",
    "q78_grouping_sets",
    "q81_full_outer_join",
    "q82_lateral_topk",
    "q84_month_spine",
    "q86_hash_split",
    "q90_nulls_order_pagination",
    "q92_discrete_percentiles",
    "q95_repetition_filter",
    "q96_canonical_docs",
    "q117_simhash_neardup",
    "q130_semdedup",
    "q133_multimodal_frames",
    "q148_equidepth_histogram",
    "q175_ks_test",
    "q196_decile_lift",
    "q214_epoch_capped_mixture",
    "q217_curriculum_interleave",
]


def _reorder() -> None:
    missing = [n for n in _PRIORITY if n not in QUERIES]
    if missing:
        raise ValueError(
            f"priority list references unknown queries: {missing}"
        )
    rest = [n for n in QUERIES if n not in set(_PRIORITY)]
    for mapping in (QUERIES, ORACLE):
        ordered = {
            n: mapping[n] for n in (*_PRIORITY, *rest) if n in mapping
        }
        mapping.clear()
        mapping.update(ordered)


_reorder()

__all__ = ["QUERIES", "ORACLE"]
