"""Property tests for the two-phase global rank operators
(operators/windows.global_row_number / global_ntile /
exact_decile_edges) — the r6 replacements for single-partition
`OVER (ORDER BY ...)` windows (PLANS.md "Global windows").

The catalog queries pin these via oracle parity end-to-end; these
tests pin the OPERATOR CONTRACT directly: equality with the native
window on a deterministic total order, tie validity, and invariance
to the range-partition count (any boundary placement must give the
same answer)."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from airquality_data_pipeline_spark.operators.windows import (
    exact_decile_edges,
    global_ntile,
    global_row_number,
)

SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)


def _frame(spark, vals):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v long"
    )


@given(
    vals=st.lists(st.integers(-50, 50), min_size=1, max_size=60),
    nparts=st.sampled_from([1, 2, 7, 64]),
)
@SETTINGS
def test_global_row_number_matches_native_on_unique_key(
    spark, vals, nparts
):
    # (v, id) is a unique composite sort key -> ranks must equal the
    # native single-partition window bit-for-bit, for ANY partition
    # count (range-boundary placement must not matter).
    df = _frame(spark, vals)
    got = {
        r.id: r.rn
        for r in global_row_number(
            df, ["v", "id"], num_partitions=nparts, n_col="n"
        ).collect()
    }
    want = {
        r.id: r.rn
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy("v", "id"))
        ).collect()
    }
    assert got == want


@given(vals=st.lists(st.integers(-5, 5), min_size=1, max_size=60))
@SETTINGS
def test_global_row_number_ties_form_valid_total_order(spark, vals):
    # Ties on the sort key: the contract is a valid total order
    # consistent with the key — ranks are a permutation of 1..n and
    # each distinct key owns the same contiguous rank block as the
    # native window would assign (order within the block is free).
    df = _frame(spark, vals)
    rows = global_row_number(df, ["v"], num_partitions=7, n_col="n").collect()
    n = len(vals)
    assert sorted(r.rn for r in rows) == list(range(1, n + 1))
    assert all(r.n == n for r in rows)
    svals = sorted(vals)
    for r in rows:
        lo = svals.index(r.v) + 1
        hi = n - svals[::-1].index(r.v)
        assert lo <= r.rn <= hi, (r.v, r.rn, lo, hi)


@given(
    vals=st.lists(st.integers(-50, 50), min_size=1, max_size=60),
    k=st.sampled_from([1, 2, 3, 7, 10, 100]),
)
@SETTINGS
def test_global_ntile_matches_native(spark, vals, k):
    # Deterministic total order (v, id): bucket-for-bucket equality
    # with native ntile(k), including k > n and the uneven-remainder
    # tile sizes of the SQL ntile contract.
    df = _frame(spark, vals)
    got = {
        r.id: r.tile
        for r in global_ntile(
            df, k, [F.col("v"), F.col("id")], num_partitions=7
        ).collect()
    }
    want = {
        r.id: r.t
        for r in df.withColumn(
            "t", F.ntile(k).over(Window.orderBy("v", "id"))
        ).collect()
    }
    assert got == want


@given(vals=st.lists(st.integers(-20, 20), min_size=1, max_size=80))
@SETTINGS
def test_exact_decile_edges_matches_order_statistic(spark, vals):
    # edge i = the ceil(i*n/10)-th smallest value, 1-based — the one
    # explicit rank convention both engines share (PLANS.md).
    df = _frame(spark, vals)
    [row] = exact_decile_edges(df, "v").collect()
    svals = sorted(vals)
    n = len(svals)
    want = [svals[math.ceil(i * n / 10) - 1] for i in range(1, 10)]
    assert list(row.qs) == want


def test_exact_decile_edges_empty_input_yields_nine_nulls(spark):
    # r6 ADVICE: an empty input used to yield a 0-element array, so
    # consumers doing element_at(qs, i) threw under ANSI. The frame
    # stays 1-row with exactly 9 (null) edges.
    df = spark.createDataFrame([], "v long")
    [row] = exact_decile_edges(df, "v").collect()
    assert list(row.qs) == [None] * 9


def test_global_row_number_rejects_reserved_columns(spark):
    # r6 ADVICE: silently mis-ranking when the input already carries
    # the operator's internal columns — now an explicit error.
    import pytest as _pytest

    from airquality_data_pipeline_spark.operators.windows import (
        global_row_number,
    )

    df = spark.range(5).select(F.col("id"), F.lit(1).alias("__pid"))
    with _pytest.raises(ValueError, match="reserved internal"):
        global_row_number(df, ["id"])
