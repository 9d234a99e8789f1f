"""Oracle-checked query catalog.

Each module registers (spark builder, DuckDB oracle SQL) pairs into the
shared registry. Importing this package populates it.

Registration order is deliberate: the external driver checks a ~50-entry
prefix of the catalog each round, so _PRIORITY below puts the queries
that most need a fresh CORRECTNESS row first. Round-6 order (catalog
growth frozen this round — NOTHING is placed ahead of the debt): the
41 queries whose last driver-green row dates from r1/r2 lead, then
q63/q117/q133 (changed in r5, never driver-checked in their current
form), then the six queries modified in r6 (q148/q175/q196/q217
fact-window rewrites, q130 k-scaling, q214 infeasible-budget fix) —
exactly 50 entries. After the window prefix: the other r6-modified
queries (q219 float32 fix; the degenerate-text/decimal-tie fixes
q135/q163/q127/q132/q85/q164/q171/q178/q184/q225;
q166/q167/q191/q228 try_divide hardening; q215/q229/q230/q234 offset
derivation; q259/q262 shared-rank bin edges; q268 RANGE frame), then
the remaining never-driver-checked backlog oldest-first (drains
across r7+), then the rest. The r5 window
checked only the 50 newest additions (q218-q268 region); roughly 86
catalog queries still await a first driver row — all are locally
parity-green at sf0.001/0.01/0.1 under the hostile replica
(tests/test_oracle_parity.py).
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
    # --- 41 queries whose last driver-green row is r1/r2 (the oldest
    # evidence in the catalog; the r6 window is spent entirely here)
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
    "q64_ranking_extras",
    "q66_embedding_quantize",
    "q67_signature_clusters",
    "q69_posexplode",
    "q70_regexp_groups",
    "q72_correlated_min",
    "q73_multi_exists",
    "q74_date_arithmetic",
    "q78_grouping_sets",
    "q79_stat_aggs",
    "q81_full_outer_join",
    "q82_lateral_topk",
    "q84_month_spine",
    "q86_hash_split",
    "q90_nulls_order_pagination",
    "q92_discrete_percentiles",
    "q95_repetition_filter",
    "q96_canonical_docs",
    # --- changed in r5, never driver-checked in current form
    "q63_ml_minhash_lsh",
    "q117_simhash_neardup",
    "q133_multimodal_frames",
    # --- modified in r6 (fact-window rewrites / k-scaling / waterfill
    # infeasible-budget fix) — need driver rows for the new plans
    "q148_equidepth_histogram",
    "q175_ks_test",
    "q196_decile_lift",
    "q217_curriculum_interleave",
    "q130_semdedup",
    "q214_epoch_capped_mixture",
    # ^^^ exactly 50 entries above this line — the driver window.
    # --- also modified in r6 (r5 driver rows exist for most; re-earn
    # when the window allows)
    "q219_fisher_dims",  # float32-product quantization fix (robustness sweep)
    # degenerate-text + decimal-tie fixes (robustness sweep seed31/19:
    # sequence(1,0) descending inference, EMPTY sentinel, zero-weight
    # A-ES, CAST-to-DECIMAL tie hazard -> shared floor grid)
    "q135_char_entropy",
    "q163_grouped_linear_trend",
    "q127_weighted_sample",
    "q132_incremental_dedup",
    "q85_doc_chunking",
    "q164_chi_square",
    "q171_anova_f",
    "q178_embedding_dim_stats",
    "q184_retention_halflife",
    "q225_seasonal_decompose",
    # try_divide hardening (robustness sweep: zero-variance / zero-
    # conversion denominators NULL like the oracle instead of throwing)
    "q166_series_correlation",
    "q167_ab_test",
    "q191_acf",
    "q228_runs_test",
    "q152_rfm_segmentation",
    "q165_revenue_concentration",
    "q237_uplift_deciles",
    "q215_template_prefix",
    "q229_dedup_pr_harness",
    "q230_band_threshold_sweep",
    "q234_code_screen",
    "q259_psi_drift",
    "q262_woe_iv",
    "q268_slo_burn_rate",
    # --- never-driver-checked backlog, oldest-first (drains r7+)
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
    "q177_interevent_fit",
    "q179_hub_detection",
    "q180_join_cardinality",
    "q181_theil_sen",
    "q182_token_pmi",
    "q183_benford_audit",
    "q185_weighted_median",
    "q186_funnel_latency",
    "q187_rate_change_alert",
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
    # --- r5-driver-green tail (freshest evidence, lowest priority)
    "q267_variant_rollup",
    "q266_recursive_hierarchy",
    "q265_blocklist_screen",
    "q264_causal_estimators",
    "q263_oof_target_encoding",
    "q261_fairness_audit",
    "q260_conformal_calibration",
    "q258_offpolicy_eval",
    "q257_ushaped_attribution",
    "q256_temperature_sampling",
    "q255_rrf_fusion",
    "q254_ndcg_at_10",
    "q253_zone_map_skipping",
    "q250_dsir_selection",
    "q251_perplexity_terciles",
    "q252_bpe_pair_stats",
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
    "q239_compaction_plan",
    "q238_watermark_lateness",
    "q235_dp_noisy_counts",
    "q236_k_anonymity",
    "q233_readability_lix",
    "q231_srm_check",
    "q232_capping_sensitivity",
    "q227_mann_kendall",
    "q226_burst_detection",
    "q222_poisson_bootstrap",
    "q223_cohort_ltv",
    "q224_negative_sampling",
    "q220_cuped",
    "q221_diff_in_diff",
    "q218_matryoshka_recall",
    # --- oracle added in r5 (was the one rows-only entry)
    # --- implementation changed in r5 (registered default now 64-bit)
    # --- 41 queries whose last driver-green row is r1/r2: rotate them
    # through the window so the catalog's driver evidence is current
    # (locally parity-green; any tail the 50-entry window clips
    # re-rotates in r6)
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
