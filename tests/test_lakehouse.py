"""Partition-level MERGE over a parquet table (the lakehouse-MERGE
physical pattern with in-box Spark): correctness of the merge semantics
AND the scale property — untouched partitions' files are byte-identical
after the merge (never read or rewritten)."""

from __future__ import annotations

import os
import tempfile

from airquality_data_pipeline_spark.operators import lakehouse


def _files(path: str, part: str) -> dict[str, tuple[int, float]]:
    d = os.path.join(path, f"country={part}")
    return {
        f: (os.path.getsize(os.path.join(d, f)), os.path.getmtime(os.path.join(d, f)))
        for f in os.listdir(d)
        if f.endswith(".parquet")
    }


def test_merge_into_partitioned(spark):
    path = tempfile.mkdtemp(prefix="aq_lake_")
    schema = (
        "station_id string, city string, last_seen string, country string"
    )
    target = spark.createDataFrame(
        [
            ("s1", "Berlin", "2024-01-01", "DE"),
            ("s2", "Hamburg", "2024-01-02", "DE"),
            ("s3", "Krakow", "2024-01-03", "PL"),
            ("s4", "Utrecht", "2024-01-04", "NL"),
        ],
        schema,
    )
    target.write.mode("overwrite").partitionBy("country").parquet(path)
    nl_before = _files(path, "NL")

    updates = spark.createDataFrame(
        [
            # matched: null city must NOT clobber (coalesce rule)
            ("s1", None, "2024-02-01", "DE"),
            # new key in an existing partition
            ("s9", "Gdansk", "2024-02-02", "PL"),
            # new key in a brand-new partition
            ("s5", "Paris", "2024-02-03", "FR"),
        ],
        schema,
    )
    n = lakehouse.merge_into_partitioned(
        spark, path, updates, key_cols=["station_id"], partition_col="country",
        rule=lakehouse.coalesce_rule,
    )
    assert n == 3  # DE, PL, FR touched

    got = {
        r.station_id: (r.city, r.last_seen, r.country)
        for r in spark.read.parquet(path).collect()
    }
    assert got == {
        "s1": ("Berlin", "2024-02-01", "DE"),  # city kept, last_seen updated
        "s2": ("Hamburg", "2024-01-02", "DE"),  # untouched row in touched part
        "s3": ("Krakow", "2024-01-03", "PL"),
        "s9": ("Gdansk", "2024-02-02", "PL"),  # inserted
        "s4": ("Utrecht", "2024-01-04", "NL"),  # untouched partition
        "s5": ("Paris", "2024-02-03", "FR"),  # new partition created
    }

    # the scale property: the NL partition was never rewritten
    assert _files(path, "NL") == nl_before

    # empty batch is a no-op
    empty = spark.createDataFrame([], schema)
    assert (
        lakehouse.merge_into_partitioned(
            spark, path, empty, ["station_id"], "country"
        )
        == 0
    )


def test_source_wins_rule_null_overwrites(spark):
    # true last-wins: an EXPLICIT NULL in the update batch clobbers the
    # target value (coalesce_rule would keep it), while keys absent
    # from the batch keep their target values untouched
    path = tempfile.mkdtemp(prefix="aq_lake_")
    schema = "station_id string, city string, country string"
    spark.createDataFrame(
        [("s1", "Berlin", "DE"), ("s2", "Hamburg", "DE")], schema
    ).write.mode("overwrite").partitionBy("country").parquet(path)

    updates = spark.createDataFrame([("s1", None, "DE")], schema)
    lakehouse.merge_into_partitioned(
        spark, path, updates, ["station_id"], "country",
        rule=lakehouse.source_wins_rule,
    )
    got = {r.station_id: r.city for r in spark.read.parquet(path).collect()}
    assert got == {"s1": None, "s2": "Hamburg"}


def test_null_partition_values_rejected(spark):
    import pytest

    path = tempfile.mkdtemp(prefix="aq_lake_")
    schema = "station_id string, city string, country string"
    spark.createDataFrame(
        [("s1", "Berlin", "DE")], schema
    ).write.mode("overwrite").partitionBy("country").parquet(path)

    updates = spark.createDataFrame([("s2", "Nowhere", None)], schema)
    with pytest.raises(ValueError, match="NULL 'country' partition"):
        lakehouse.merge_into_partitioned(
            spark, path, updates, ["station_id"], "country"
        )


def test_greatest_rule_cursor_merge(spark):
    path = tempfile.mkdtemp(prefix="aq_lake_")
    schema = "station_id string, last_observed_at string, country string"
    spark.createDataFrame(
        [("s1", "2024-01-05", "DE"), ("s2", "2024-01-09", "DE")], schema
    ).write.mode("overwrite").partitionBy("country").parquet(path)

    # replay with an OLDER timestamp: cursor must not move backwards
    updates = spark.createDataFrame(
        [("s1", "2024-01-02", "DE"), ("s2", "2024-02-01", "DE")], schema
    )
    lakehouse.merge_into_partitioned(
        spark, path, updates, ["station_id"], "country",
        rule=lakehouse.greatest_rule,
    )
    got = {
        r.station_id: r.last_observed_at for r in spark.read.parquet(path).collect()
    }
    assert got == {"s1": "2024-01-05", "s2": "2024-02-01"}
