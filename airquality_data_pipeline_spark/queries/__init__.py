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
# r3 rotation — the 16 late-r2 queries that sat past the 50-entry prefix
# in both prior rounds lead, then any queries newly added this round,
# then the 4 rows-only entries (so the weaker rows stay visible), then
# green families as filler. Across r1+r2+r3 this completes driver
# verification of the whole catalog.
_PRIORITY = [
    # --- never driver-checked (registered at positions 51+ in r2)
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
    # --- new in r3 (never driver-checked)
    # (appended by the r3 modules below as they register)
    # --- rows-only by design: re-run each round so regressions surface
    "q60_approx_distinct",
    "q61_approx_percentile",
    "q62_tfidf",
    "q63_ml_minhash_lsh",
    # --- green filler: one representative per family, refreshed
    "q23_cursor_incremental_filter",
    "q25_first_wins_dedup",
    "q30_sessionization",
    "q40_exact_dedup",
    "q41_minhash_candidates",
    "q42_ngram_jaccard",
    "q44_cosine_topk",
    "q45_embedding_neardup",
    "q46_ivf_topk",
    "q48_language_id",
    "q50_token_counts",
    "q55_salted_agg",
    "q71_neardup_components",
    "q85_doc_chunking",
    "q89_multiset_ops",
    "q93_snapshot_diff",
    "q94_stratified_sample",
    "q97_boilerplate_ngrams",
    "q98_sequence_packing",
    "q99_decontamination",
]

# r3 additions are inserted right after the never-checked block so they
# land inside the driver's 50-entry prefix.
_R3_INSERT_AT = _PRIORITY.index("q60_approx_distinct")
_R3_NEW: list[str] = []
_PRIORITY[_R3_INSERT_AT:_R3_INSERT_AT] = _R3_NEW


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
