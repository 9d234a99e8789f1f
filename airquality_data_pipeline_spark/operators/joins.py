"""Join operators Spark lacks natively: as-of join and bucketized range
join (SURVEY.md §2.3 "not present" row — required by the engine's
relational surface; the reference's only joins are broadcast lookup J1
and the cursor anti-join J3).

Both are compositions of built-in ops (union+window / explode+equi-join)
so Catalyst keeps whole-stage codegen and the shuffles stay on the join
keys — no custom physical rules, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join: for each left row, attach the right row with
    the greatest right_ts <= left_ts for the same key (inclusive, like
    pd.merge_asof / DuckDB ASOF JOIN). Left rows with no earlier right
    row keep nulls.

    Implementation: tag + union both sides, one window sort per key on
    (ts, side) with right rows ordered before left rows at equal ts,
    then last_value(ignorenulls) carries the most recent right values
    forward. One shuffle on the key — no range explosion, no
    per-group Python. At scale this beats the pd.merge_asof
    applyInPandas form because state never leaves the JVM.
    """
    l_tagged = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*left.columns).alias("_lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_cols],
    )
    r_tagged = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            l_tagged.schema["_lrow"].dataType
        ).alias("_lrow"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    u = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        "_side",
        "_lrow",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_rv_{c}")
            for c in right_cols
        ],
    ).where(F.col("_side") == 1)
    return carried.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"_rv_{c}").alias(f"{c}{suffix}") for c in right_cols],
    )


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    window_seconds: int,
) -> DataFrame:
    """Interval join: pairs (l, r) with the same key and
    right_ts in (left_ts, left_ts + window_seconds].

    Naive form is an equi-join on key with a range predicate — fine when
    keys are selective, quadratic inside a hot key. This form buckets
    time into window-sized cells and turns the range into an equi-join
    on (key, bucket): each left row probes exactly two buckets, so the
    shuffle is uniform and the per-bucket work is bounded regardless of
    key skew. The residual range predicate filters inside the bucket.
    """
    lb = F.floor(F.unix_micros(F.col(left_ts).cast("timestamp")) / (window_seconds * 1_000_000))
    rb = F.floor(F.unix_micros(F.col(right_ts).cast("timestamp")) / (window_seconds * 1_000_000))
    l2 = left.withColumn("_bucket", F.explode(F.array(lb, lb + 1)))
    r2 = right.withColumn("_bucket", rb)
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col("l._bucket") == F.col("r._bucket"))
        & (F.col(f"r.{right_ts}") > F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.make_interval(secs=F.lit(window_seconds))
        )
    )
    return l2.alias("l").join(r2.alias("r"), cond)
