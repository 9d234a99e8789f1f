"""Table-storage MERGE: partition-level upsert over a parquet table.

The reference's K2/K3 sinks upsert into Postgres row-by-row
(app/main.py:633-648, :258-268). At 100 TB the keyed store is a
lakehouse table, and MERGE INTO is physically a *partition/file
rewrite*: identify the partitions the update batch touches, merge only
those, and atomically swap them in — exactly what Delta/Iceberg MERGE
does under the hood with file-level granularity.

The Delta/Iceberg jars are not available in this environment, so this
module implements the same physical pattern with what Spark ships:

  1. prune: the update batch's distinct partition values (bounded by
     partition count, not data size) select the affected partitions;
  2. merge: full-outer join target-affected vs updates on the key,
     with pluggable column semantics (COALESCE / GREATEST / last-wins);
  3. swap: dynamic partition overwrite (partitionOverwriteMode=dynamic)
     rewrites ONLY the partitions present in the merged frame —
     untouched partitions' files are left byte-identical on disk.

A real deployment on Delta/Iceberg replaces step 3 with MERGE INTO and
gains snapshot isolation + file-level (not partition-level) rewrite;
steps 1-2 — the expensive, data-scale part — are identical. Because
plain parquet has no snapshots, the merged frame must be materialized
(localCheckpoint) before overwriting the directory it was read from;
a table format removes that copy.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# A rule receives (src_value, tgt_value, src_present) per value column.
# src_present is TRUE iff the key exists in the update batch — the
# presence marker that lets last-wins semantics distinguish "source set
# the value to NULL" (overwrite) from "key absent from the batch" (keep
# target), which src-NULL alone cannot express.
MergeRule = Callable[[Column, Column, Column], Column]


def coalesce_rule(src: Column, tgt: Column, src_present: Column) -> Column:
    """K2 semantics: never overwrite a non-null value with null."""
    return F.coalesce(src, tgt)


def greatest_rule(src: Column, tgt: Column, src_present: Column) -> Column:
    """K3 semantics: the value only ever advances."""
    return F.greatest(src, tgt)


def source_wins_rule(src: Column, tgt: Column, src_present: Column) -> Column:
    """True last-wins upsert: wherever the key is present in the update
    batch the source value is taken verbatim — INCLUDING explicit NULLs
    (unlike coalesce_rule, which keeps the target value then)."""
    return F.when(src_present, src).otherwise(tgt)


def merge_into_partitioned(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_col: str,
    rule: MergeRule = coalesce_rule,
) -> int:
    """MERGE `updates` into the parquet table at `target_path`
    (partitioned by `partition_col`), rewriting only affected
    partitions. Returns the number of partitions rewritten.

    Scale shape: the scan of the target is partition-pruned by an IN
    filter over the update batch's distinct partition values (collected
    — bounded by the partition count); the merge join shuffles only the
    affected slice; the write replaces only the partitions present in
    the output (dynamic overwrite). Untouched partitions are never
    read, shuffled, or rewritten.

    Invariant (same as a partition-pruned Delta MERGE): a key's
    partition value must be stable — if an update moved a key to a new
    partition, the stale row in its old partition would only be cleaned
    up if that partition is also touched by the batch.

    NULL partition values in the update batch are rejected: the IN
    prune can never select a NULL target partition, so a NULL update
    row would insert via dynamic overwrite while the matching target
    rows are silently left unmerged — an asymmetry better surfaced as
    an error than shipped as data loss.
    """
    parts = [
        r[0] for r in updates.select(partition_col).distinct().collect()
    ]
    if any(p is None for p in parts):
        raise ValueError(
            f"update batch contains NULL {partition_col!r} partition "
            "values; partition-pruned MERGE cannot address the NULL "
            "partition (IN-prune never matches NULL) — clean or "
            "default the partition column upstream"
        )
    if not parts:
        return 0

    target = spark.read.parquet(target_path)
    affected = target.where(F.col(partition_col).isin(parts))

    value_cols = [
        c for c in target.columns if c not in (*key_cols, partition_col)
    ]
    t = affected.select(
        *key_cols,
        F.col(partition_col).alias("_t_part"),
        *[F.col(c).alias(f"_t_{c}") for c in value_cols],
    )
    s = updates.select(
        *key_cols,
        F.col(partition_col).alias("_s_part"),
        F.lit(True).alias("_s_present"),
        *[F.col(c).alias(f"_s_{c}") for c in value_cols],
    )
    present = F.coalesce(F.col("_s_present"), F.lit(False))
    merged = t.join(s, key_cols, "full_outer").select(
        *key_cols,
        *[
            rule(F.col(f"_s_{c}"), F.col(f"_t_{c}"), present).alias(c)
            for c in value_cols
        ],
        F.coalesce(F.col("_s_part"), F.col("_t_part")).alias(partition_col),
    )

    # plain parquet has no snapshot isolation: cut lineage before
    # overwriting the directory the plan reads from (a table format's
    # MERGE INTO makes this copy unnecessary)
    merged = merged.localCheckpoint(eager=True)
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(target_path)
    )
    return len(parts)
