"""functions.expr: let-binding and Generate-boundary materialization.

These guard the engine-level contract the text/dedup/similarity hot
paths rely on: bound values behave exactly like the inlined expression
(same results, including nulls), and materialize() never changes row
counts (explode of a one-element array).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from airquality_data_pipeline_spark.functions.expr import let, materialize


def test_let_matches_inlined_expression(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, ""), (3, None)], "id long, text string"
    )
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    got = df.select(
        "id",
        let(toks, lambda w: F.size(w)).alias("bound"),
        F.size(toks).alias("inlined"),
    ).collect()
    for r in got:
        assert r.bound == r.inlined, r


def test_let_nested_binding(spark):
    df = spark.createDataFrame([(1, "x y x y")], "id long, text string")
    toks = F.split(F.col("text"), " ")
    out = df.select(
        let(
            toks,
            lambda w: let(
                F.array_distinct(w),
                lambda d: F.size(w) - F.size(d),
            ),
        ).alias("n_dupes")
    ).collect()
    assert out[0].n_dupes == 2


def test_materialize_preserves_rows_and_fields(spark):
    df = spark.createDataFrame(
        [(1, "a a a"), (2, None), (3, "")], "id long, text string"
    )
    toks = F.split(F.col("text"), " ")
    st = F.struct(
        F.size(toks).alias("n"),
        F.size(F.array_distinct(toks)).alias("d"),
    )
    out = materialize(df, ["id"], st, "_s").select(
        "id", F.col("_s.n").alias("n"), F.col("_s.d").alias("d")
    )
    rows = {r.id: r for r in out.collect()}
    # every input row survives the Generate boundary, null input included
    assert set(rows) == {1, 2, 3}
    assert (rows[1].n, rows[1].d) == (3, 1)
    assert rows[2].n is None  # null text -> null sizes, row kept
    assert (rows[3].n, rows[3].d) == (1, 1)  # split("") -> [""]


def test_materialize_plan_has_generate_boundary(spark):
    # the whole point: downstream projections must read attributes, not
    # re-inlined expression trees — visible as a Generate in the plan
    df = spark.createDataFrame([(1, "a b")], "id long, text string")
    out = materialize(
        df, ["id"], F.struct(F.size(F.split(F.col("text"), " ")).alias("n")), "_s"
    ).select("id", F.col("_s.n"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Generate" in plan


def test_sql_scalar_udf_stays_jvm_side(spark):
    # Spark 4 SQL UDFs (CREATE FUNCTION ... RETURN expr) are inlined
    # by Catalyst — the reference's pollutant normalization
    # (app/main.py pm2.5 -> pm25) expressed as one, with the plan
    # proving no Python evaluation is involved (the UDF form that
    # survives 100 TB: stays inside codegen, unlike a @udf lambda)
    from pyspark.sql import functions as F

    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION pollutant_norm(p STRING) "
        "RETURNS STRING "
        "RETURN CASE WHEN lower(p) = 'pm2.5' THEN 'pm25' "
        "ELSE lower(p) END"
    )
    df = spark.createDataFrame(
        [("PM2.5",), ("PM10",), ("no2",)], "p string"
    ).select(F.expr("pollutant_norm(p)").alias("norm"))
    assert [r.norm for r in df.collect()] == ["pm25", "pm10", "no2"]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
