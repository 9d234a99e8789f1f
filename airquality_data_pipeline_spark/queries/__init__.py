"""Oracle-checked query catalog.

Each module registers (spark builder, DuckDB oracle SQL) pairs into the
shared registry. Importing this package populates it.
"""

from __future__ import annotations

from airquality_data_pipeline_spark.queries.registry import ORACLE, QUERIES

# populate the registry (order = rough build order)
from airquality_data_pipeline_spark.queries import relational  # noqa: E402,F401
from airquality_data_pipeline_spark.queries import relational2  # noqa: E402,F401
from airquality_data_pipeline_spark.queries import relational3  # noqa: E402,F401
from airquality_data_pipeline_spark.queries import advanced  # noqa: E402,F401
from airquality_data_pipeline_spark.queries import pipeline  # noqa: E402,F401
from airquality_data_pipeline_spark.queries import dedup  # noqa: E402,F401
from airquality_data_pipeline_spark.queries import similarity  # noqa: E402,F401
from airquality_data_pipeline_spark.queries import text  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLE"]
