"""compare_bounded (streamed count + order-insensitive md5-sum) must
agree with the strict comparator verdict-for-verdict: green on real
parity pairs across type shapes (decimals, doubles, timestamps,
booleans, NULLs), red on row-count and value drift. It exists so the
scale-100 robustness sweep can verify quadratic-output harness queries
(q45/q229) without materializing ~1e8 rows on the driver."""

from __future__ import annotations

import pytest

from airquality_data_pipeline_spark.queries import ORACLE, QUERIES
from tests.oracle_utils import compare, compare_bounded

# a type-diverse slice of the catalog: decimal sums, doubles, epoch
# millis, booleans, strings, NULL-bearing aggregates — plus the two
# queries the sweep actually runs through the bounded path
_SAMPLE = [
    "q01_pricing_summary",
    "q45_embedding_neardup",
    "q76_null_aggregates",
    "q87_time_weighted_avg",
    "q113_bloom_decontamination",
    "q229_dedup_pr_harness",
]


@pytest.mark.parametrize("name", _SAMPLE)
def test_bounded_matches_strict_verdict(name, spark, duck, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert compare(df, duck, ORACLE[name]) == []
    assert compare_bounded(df, duck, ORACLE[name]) == []


def test_bounded_catches_row_count_drift(spark, duck, sf_dir):
    df = QUERIES["q01_pricing_summary"](spark, sf_dir).limit(1)
    probs = compare_bounded(df, duck, ORACLE["q01_pricing_summary"])
    assert any("row count" in p for p in probs)


def test_bounded_catches_value_drift(spark, duck, sf_dir):
    from pyspark.sql import functions as F

    df = QUERIES["q01_pricing_summary"](spark, sf_dir).withColumn(
        "sum_qty", F.col("sum_qty") + F.lit(1)
    )
    probs = compare_bounded(df, duck, ORACLE["q01_pricing_summary"])
    assert any("value-hash" in p for p in probs)


def test_bounded_catches_schema_drift(spark, duck, sf_dir):
    df = QUERIES["q01_pricing_summary"](spark, sf_dir).withColumnRenamed(
        "sum_qty", "sq"
    )
    probs = compare_bounded(df, duck, ORACLE["q01_pricing_summary"])
    assert any("schema mismatch" in p for p in probs)
