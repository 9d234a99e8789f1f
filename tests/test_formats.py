"""Source-format coverage beyond parquet: JSON lines, CSV, and ORC
round-trips with explicit schemas (never inferSchema in the engine) must
reproduce the parquet-read frame exactly."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from airquality_data_pipeline_spark.functions.timeparse import (
    iso_format,
    parse_iso_ts,
)
from airquality_data_pipeline_spark.queries.common import table, utc


def _canonical_events(spark, sf_dir):
    # serialize ts as ISO text so every format round-trips losslessly
    return table(spark, sf_dir, "events").select(
        "event_id",
        iso_format(F.col("ts")).alias("ts_iso"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


SCHEMA = (
    "event_id long, ts_iso string, user_id long, event_type string, "
    "value double, props string"
)


def _assert_same(expected_rows, got_df):
    got = sorted(
        (r.event_id, r.ts_iso, r.user_id, r.event_type, r.value)
        for r in got_df.collect()
    )
    assert got == expected_rows


def test_json_csv_orc_roundtrip(spark, sf_dir):
    utc(spark)
    src = _canonical_events(spark, sf_dir)
    expected = sorted(
        (r.event_id, r.ts_iso, r.user_id, r.event_type, r.value)
        for r in src.collect()
    )

    json_dir = tempfile.mkdtemp(prefix="fmt_json_")
    src.write.mode("overwrite").json(json_dir)
    _assert_same(expected, spark.read.schema(SCHEMA).json(json_dir))

    csv_dir = tempfile.mkdtemp(prefix="fmt_csv_")
    # props contains JSON with commas/quotes — exercise quoting
    src.write.mode("overwrite").option("header", True).csv(csv_dir)
    _assert_same(
        expected, spark.read.schema(SCHEMA).option("header", True).csv(csv_dir)
    )

    orc_dir = tempfile.mkdtemp(prefix="fmt_orc_")
    src.write.mode("overwrite").orc(orc_dir)
    _assert_same(expected, spark.read.orc(orc_dir))


def test_parse_iso_ts_variants(spark):
    df = spark.createDataFrame(
        [
            ("2024-01-02T03:04:05Z",),
            ("2024-01-02T03:04:05+00:00",),
            ("2024-01-02 03:04:05",),  # space separator (C4)
            ("2024-01-02T03:04:05.123Z",),
            ("garbage",),
            (None,),
        ],
        "raw string",
    )
    got = df.select(
        "raw", F.unix_millis(parse_iso_ts("raw")).alias("ms")
    ).collect()
    by_raw = {r.raw: r.ms for r in got}
    base = 1704164645000
    assert by_raw["2024-01-02T03:04:05Z"] == base
    assert by_raw["2024-01-02T03:04:05+00:00"] == base
    assert by_raw["2024-01-02 03:04:05"] == base
    assert by_raw["2024-01-02T03:04:05.123Z"] == base + 123
    assert by_raw["garbage"] is None  # null on failure (C1)
    assert by_raw[None] is None
