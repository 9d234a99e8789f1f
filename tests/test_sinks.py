"""External keyed-store upsert sinks (K2/K3) against real SQLite — the
reference's ON CONFLICT SQL semantics executed end-to-end, including the
full cycle: load cursors -> filter -> emit -> commit -> next cycle."""

from __future__ import annotations

import sqlite3
import tempfile

from pyspark.sql import functions as F

from airquality_data_pipeline_spark.plans import pipeline
from airquality_data_pipeline_spark.sources.synthetic import synthetic_measurements
from airquality_data_pipeline_spark.streaming import sinks


def _db() -> str:
    return tempfile.mktemp(suffix=".db", prefix="aq_")


def test_catalog_coalesce_upsert(spark):
    db = _db()
    v1 = spark.createDataFrame(
        [("s1", "de", "DE", "Berlin", "Mitte", 52.5, 13.4)],
        "station_id string, source string, country string, city string, "
        "location_name string, lat double, lon double",
    )
    sinks.upsert_catalog_batch(db, v1)
    # second version nulls city and moves lat: null must NOT clobber
    v2 = spark.createDataFrame(
        [("s1", "de", "DE", None, "Mitte-2", 52.6, 13.4)],
        "station_id string, source string, country string, city string, "
        "location_name string, lat double, lon double",
    )
    sinks.upsert_catalog_batch(db, v2)
    got = sqlite3.connect(db).execute(
        "SELECT city, location_name, lat FROM stations WHERE station_id='s1'"
    ).fetchone()
    assert got == ("Berlin", "Mitte-2", 52.6)


def test_cursor_greatest_commit(spark):
    db = _db()
    u1 = spark.createDataFrame(
        [("s1", "pm25", "2024-01-05T00:00:00Z")],
        "station_id string, pollutant string, last_observed_at string",
    )
    sinks.commit_cursor_batch(db, u1, source="synthetic")
    # replay with an OLDER timestamp: must not move backwards
    u2 = spark.createDataFrame(
        [("s1", "pm25", "2024-01-02T00:00:00Z"), ("s2", "o3", "2024-01-09T00:00:00Z")],
        "station_id string, pollutant string, last_observed_at string",
    )
    sinks.commit_cursor_batch(db, u2, source="synthetic")
    got = dict(
        (f"{r[0]}/{r[1]}", r[2])
        for r in sqlite3.connect(db).execute(
            "SELECT station_id, pollutant, last_observed_at FROM ingestion_cursors"
        )
    )
    assert got["s1/pm25"] == "2024-01-05T00:00:00Z"
    assert got["s2/o3"] == "2024-01-09T00:00:00Z"


def test_two_cycle_roundtrip(spark):
    """Full producer loop across two cycles with the store in between:
    cycle 2 must emit nothing new (same synthetic batch, cursors hold)."""
    db = _db()
    stations = spark.createDataFrame(
        [], "station_id string, source string, country string, city string, "
            "location_name string, lat double, lon double",
    )

    def one_cycle() -> int:
        cursors = sinks.load_cursors(db, "synthetic", spark)
        bronze = synthetic_measurements(spark, n=40)
        result = pipeline.silver_measurements([bronze], stations, cursors)
        emitted = result.payload.count()  # the "emit" action
        sinks.commit_cursor_batch(db, result.pending_cursors, source="synthetic")
        return emitted

    first = one_cycle()
    second = one_cycle()
    assert first > 0
    assert second == 0  # everything already covered by committed cursors


def test_postgres_dialect_sql_text():
    """Pin the EXACT Postgres SQL a deployment would execute (the
    reference's psycopg strings, app/main.py:636-644 / :258-268): psycopg
    %s placeholders, GREATEST (not SQLite MAX), same conflict targets,
    and source deliberately absent from the stations update set."""
    pg_stations = sinks.stations_upsert_sql("postgres")
    assert "VALUES (%s, %s, %s, %s, %s, %s, %s)" in pg_stations
    assert "ON CONFLICT (station_id) DO UPDATE SET" in pg_stations
    for col in ("country", "city", "location_name", "lat", "lon"):
        assert f"{col}" in pg_stations and f"EXCLUDED.{col}" in pg_stations
    assert "EXCLUDED.source" not in pg_stations  # ref leaves source as-is

    pg_cursors = sinks.cursors_upsert_sql("postgres")
    assert "VALUES (%s, %s, %s, %s)" in pg_cursors
    assert "ON CONFLICT (source, station_id, pollutant) DO UPDATE SET" in pg_cursors
    assert "GREATEST(ingestion_cursors.last_observed_at" in pg_cursors
    assert "MAX(" not in pg_cursors

    # the executable SQLite twins differ ONLY by the two mechanical
    # substitutions — proving the tested path runs the reference SQL
    assert sinks.stations_upsert_sql("sqlite") == pg_stations.replace("%s", "?")
    assert sinks.cursors_upsert_sql("sqlite") == pg_cursors.replace(
        "%s", "?"
    ).replace("GREATEST", "MAX")
