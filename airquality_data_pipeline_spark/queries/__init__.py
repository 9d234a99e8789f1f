"""Oracle-checked query catalog.

Each module registers (spark builder, DuckDB oracle SQL) pairs into the
shared registry. Importing this package populates it.

Registration order is deliberate: the external driver checks a prefix of
the catalog (r1 checked exactly the first 50 entries), so the families
that have never received a driver correctness row — pipeline, dedup,
similarity, text, advanced, and the relational3 tail — are promoted to
the front, followed by the four rows that were red/crashed in r1
(q18/q39/q56/q61). Already-green relational families come last.
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

# Names the driver must check first this round (see module docstring):
# the 40 queries without a CORRECTNESS_r01 row, then the 4 r1 red/crash
# rows whose fixes need re-verification.
_PRIORITY = [
    # pipeline semantics (S5/S7/S10, F5, A1/A2/A4, C9, K4, windows)
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
    "q55_salted_agg",
    # dedup family (LLM-pipeline brief)
    "q40_exact_dedup",
    "q41_minhash_candidates",
    "q42_ngram_jaccard",
    "q43_simhash",
    "q67_signature_clusters",
    "q71_neardup_components",
    "q63_ml_minhash_lsh",
    # similarity search
    "q44_cosine_topk",
    "q45_embedding_neardup",
    "q46_ivf_topk",
    "q47_vector_lsh",
    "q66_embedding_quantize",
    # text analysis + multimodal plumbing
    "q48_language_id",
    "q49_quality_score",
    "q50_token_counts",
    "q51_fingerprint",
    "q52_binary_columns",
    "q54_term_stats",
    "q62_tfidf",
    # advanced / timeseries / CDC
    "q85_doc_chunking",
    "q86_hash_split",
    "q87_time_weighted_avg",
    "q88_gapfill_locf",
    "q92_discrete_percentiles",
    "q93_snapshot_diff",
    # relational3 tail (registered after the r1 cutoff)
    "q84_month_spine",
    "q89_multiset_ops",
    "q90_nulls_order_pagination",
    "q91_running_distinct",
    # r1 red/crashed rows, now fixed — need fresh driver rows
    "q18_json_extract",
    "q39_collect_sorted",
    "q56_array_functions",
    "q61_approx_percentile",
    # new in r2 (LLM-pipeline ops) — never driver-checked
    "q94_stratified_sample",
    "q95_repetition_filter",
    "q96_canonical_docs",
    "q97_boilerplate_ngrams",
    "q98_sequence_packing",
    "q99_decontamination",
    # --- positions 51+: past the r1 cutoff, but if the driver's prefix
    # is ever longer than 50, the still-unchecked r2 additions should be
    # next in line, ahead of the long-green relational families.
    "q100_language_sampling",
    "q101_pii_scrub",
    "q102_chunk_fingerprints",
    "q103_curation_pipeline",
    "q104_kmeans_refine",
    "q105_length_filter",
    "q106_source_mix",
    "q107_ivf_multiprobe",
    "q108_shard_export",
    "q109_chunk_dedup",
    "q111_length_histogram",
    "q112_jaccard_estimate",
    "q114_unicode_normalize",
    "q113_bloom_decontamination",
    "q115_ann_recall",
    "q116_product_quantization",
]


def _reorder() -> None:
    missing = [n for n in _PRIORITY if n not in QUERIES]
    assert not missing, f"priority list references unknown queries: {missing}"
    rest = [n for n in QUERIES if n not in set(_PRIORITY)]
    for mapping in (QUERIES, ORACLE):
        ordered = {
            n: mapping[n] for n in (*_PRIORITY, *rest) if n in mapping
        }
        mapping.clear()
        mapping.update(ordered)


_reorder()

__all__ = ["QUERIES", "ORACLE"]
