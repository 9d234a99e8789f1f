"""Time-window operators: sessionization + tumbling/sliding assignment.

The reference has no aggregation windows (SURVEY.md §2.8 — only
source-side lookbacks); these supply the streaming-analytics surface the
engine needs. Batch forms here; streaming twins in streaming/jobs.py use
window()/session_window() with watermarks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap_seconds: int,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Gaps-and-islands sessionization: adds a per-key `session_id`
    (1-based) that increments whenever the gap to the previous event
    exceeds `gap_seconds`. Equivalent to session_window(ts, gap) for a
    constant gap. Two windows over the same (key, ts) sort — Catalyst
    executes them in a single sort+window stage."""
    order = [F.col(ts_col)] + ([F.col(order_tiebreak)] if order_tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    ms = F.unix_millis(F.col(ts_col).cast("timestamp"))
    prev_ms = F.lag(ms).over(w)
    new_sess = F.when(
        prev_ms.isNull() | (ms - prev_ms > gap_seconds * 1000), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn(
        "session_id",
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
