"""Oracle-checked query catalog.

Each module registers (spark builder, DuckDB oracle SQL) pairs into the
shared registry. Importing this package populates it.

Registration order is deliberate: the external driver checks a ~50-entry
prefix of the catalog each round, so _PRIORITY below puts the queries
that most need a fresh CORRECTNESS row first. Round-9 order (catalog
growth frozen): q220 and q258 lead — both REWRITTEN this round after
hot_key-axis sweeps caught cross-engine drift (q220: DECIMAL(24,6)
product casts at high magnitude, now exact integer micro-units;
q258: continuous round() .5-boundary ties, now the guarded floor
grid), so their r5 driver rows predate the current code. Then the 52
never-driver-checked queries — exactly the catalog minus the union of
CORRECTNESS_r01–r08 keys, derived mechanically from the ledger (see
git history for the generator), in numeric order q149..q216. The
driver window is the first ~50, so q211/q212/q213/q216 spill to
round 10 and the backlog drops 52 → 4. After the never-checked block:
the driver-green tail ordered oldest-evidence first — r3 (29 queries,
the q01–q05-era rows, 6 rounds stale; these lead the r10 refresh),
then r4 (45), r5 (36 + the 2 at the head), r7 (49), r8 (50);
2+52+29+45+36+49+50 = 263. All 263 queries are locally parity-green
at sf0.001/0.01/0.1 under the hostile replica
(tests/test_oracle_parity.py); the window exists purely to convert
local evidence into driver CORRECTNESS rows.

Round-10 rotation plan (recorded per r8 VERDICT item 6):
q211/q212/q213/q216 (backlog remainder) first, then the 29
r3-evidence queries, then r4's 45 oldest — refreshing the most stale
driver evidence each round.
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
    # --- round-9 window, part 0: queries REWRITTEN this round lead
    # (modified-first, same policy as r8 — their latest driver rows,
    # both r5, predate the current code). q220: hot_key-x10 catch,
    # DECIMAL(24,6) product casts diverge at high magnitude, now exact
    # integer micro-unit statistics. q258: hot_key-x30 catch, round()
    # of continuous quotients ties at .5 boundaries, now on the
    # guarded floor grid (roundq).
    "q220_cuped",
    "q258_offpolicy_eval",
    # --- part 1: the 52 never-driver-checked queries (catalog minus
    # the union of CORRECTNESS_r01-r08 keys), numeric order. The
    # driver checks the first ~50, so with q220/q258 ahead
    # q211/q212/q213/q216 spill to round 10 and the backlog drains
    # to 4 (docstring has the full arithmetic).
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
    # ^^^ the 52 never-checked entries end here (with q220 ahead,
    # the ~50-entry driver window covers q220 + the first 49).
    # --- driver-green tail: latest evidence r3 (29 queries)
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
    # --- driver-green tail: latest evidence r4 (45 queries)
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
    # --- driver-green tail: latest evidence r5 (36 queries;
    # q220/q258 moved to the window head after their r9 rewrites)
    "q218_matryoshka_recall",
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
    "q260_conformal_calibration",
    "q263_oof_target_encoding",
    "q265_blocklist_screen",
    "q266_recursive_hierarchy",
    "q267_variant_rollup",
    # --- driver-green tail: latest evidence r7 (49 queries)
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
    # --- driver-green tail: latest evidence r8 (50 queries)
    "q79_stat_aggs",
    "q85_doc_chunking",
    "q87_time_weighted_avg",
    "q104_kmeans_refine",
    "q126_token_drift",
    "q127_weighted_sample",
    "q128_unigram_crossentropy",
    "q129_containment",
    "q131_cms_heavy_hitters",
    "q132_incremental_dedup",
    "q134_hll_shard_union",
    "q135_char_entropy",
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
    "q152_rfm_segmentation",
    "q163_grouped_linear_trend",
    "q164_chi_square",
    "q165_revenue_concentration",
    "q166_series_correlation",
    "q167_ab_test",
    "q171_anova_f",
    "q177_interevent_fit",
    "q178_embedding_dim_stats",
    "q184_retention_halflife",
    "q187_rate_change_alert",
    "q191_acf",
    "q215_template_prefix",
    "q219_fisher_dims",
    "q225_seasonal_decompose",
    "q228_runs_test",
    "q229_dedup_pr_harness",
    "q230_band_threshold_sweep",
    "q234_code_screen",
    "q237_uplift_deciles",
    "q253_zone_map_skipping",
    "q259_psi_drift",
    "q261_fairness_audit",
    "q262_woe_iv",
    "q264_causal_estimators",
    "q268_slo_burn_rate",
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
