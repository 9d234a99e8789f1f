"""Skew-mitigation operators: salted two-phase aggregation and salted
broadcast join.

AQE's skew-join handling covers sort-merge joins; hot GROUP BY keys and
skewed broadcast probes still benefit from explicit salting. The salt is
a deterministic function of a row column, so results are reproducible
and the final merge removes the salt entirely — semantically invisible,
physically N-way fan-out of each hot key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame,
    keys: list[str],
    value: Column,
    alias: str,
    salt_src: str,
    n_salts: int = 8,
) -> DataFrame:
    """Two-phase SUM: partial aggregate on (keys + salt), final on keys.
    A key receiving 50% of all rows spreads over n_salts reducers in
    phase 1; phase 2 merges n_salts tiny partials per key. The value is
    decimal-quantized so the two-phase regrouping cannot change the
    result (decimal addition is associative and commutative)."""
    salted = df.withColumn("_salt", F.pmod(F.col(salt_src), F.lit(n_salts)))
    partial = salted.groupBy(*keys, "_salt").agg(
        F.sum(value.cast("decimal(18,6)")).alias("_part"),
        F.count(F.lit(1)).alias("_cnt"),
    )
    return partial.groupBy(*keys).agg(
        F.sum("_part").cast("double").alias(alias),
        F.sum("_cnt").alias(f"{alias}_count"),
    )
