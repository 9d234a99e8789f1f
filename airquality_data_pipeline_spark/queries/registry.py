"""Shared registry: query name -> builder, query name -> oracle SQL.

The driver contract (/root/repo/__spark_entry__.py) exposes these via
queries() / oracle_sql(). Builders take (spark, sf_dir) and return a
DataFrame; oracle SQL is ANSI SQL DuckDB can run against the same parquet
tables registered as views.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a builder (and optionally its oracle SQL) to the
    catalog. oracle=None => driver runs the weaker rows-only check.

    Oracle SQL is passed through nonfinite_null_sql() here — ONCE,
    centrally — so every DECIMAL/floor-grid cast in every oracle
    (hand-written or helper-rendered) enforces the non-finite-as-NULL
    grid convention (queries/common.py docstring). DuckDB raises on
    CAST(NaN AS DECIMAL) where Spark's twin paths yield NULL; wrapping
    at registration means the ~150 hand sites cannot drift and new
    queries inherit the convention for free."""
    from airquality_data_pipeline_spark.queries.common import (
        nonfinite_null_sql,
    )

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = nonfinite_null_sql(oracle)
        return fn

    return deco
